"""grid_sample / warp parity vs torch.nn.functional.grid_sample (public API)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ffwm_tpu.ops import build_patch_grid, center_crop_grid, grid_sample, warp


def _torch_grid_sample(img_nhwc, grid, mode="bilinear", align_corners=False):
    """Oracle: torch grid_sample with NCHW<->NHWC shims."""
    t_img = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))
    t_grid = torch.from_numpy(grid)
    out = F.grid_sample(
        t_img, t_grid, mode=mode, padding_mode="zeros", align_corners=align_corners
    )
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, mode, align_corners):
    img = rng.randn(2, 9, 13, 3).astype(np.float32)
    # include far out-of-bounds positions to exercise zeros padding
    grid = (rng.rand(2, 7, 11, 2).astype(np.float32) * 3.0) - 1.5
    ours = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                  mode=mode, align_corners=align_corners))
    ref = _torch_grid_sample(img, grid, mode=mode, align_corners=align_corners)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_warp_identity(rng):
    """An identity grid reproduces the interior of the image."""
    b, h, w, c = 1, 16, 16, 3
    img = rng.rand(b, h, w, c).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # align_corners=False inverse: g = (2 p + 1) / size - 1
    gx = (2 * xs + 1) / w - 1
    gy = (2 * ys + 1) / h - 1
    grid = np.stack([gx, gy], -1)[None].astype(np.float32)
    out = np.asarray(warp(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_grid_sample_gradients_match_torch(rng):
    img = rng.randn(1, 8, 8, 2).astype(np.float32)
    grid = (rng.rand(1, 5, 5, 2).astype(np.float32) * 2.4) - 1.2
    cot = rng.randn(1, 5, 5, 2).astype(np.float32)

    f = lambda i, g: jnp.vdot(grid_sample(i, g), jnp.asarray(cot))
    gi, gg = jax.grad(f, argnums=(0, 1))(jnp.asarray(img), jnp.asarray(grid))

    t_img = torch.from_numpy(np.transpose(img, (0, 3, 1, 2))).requires_grad_(True)
    t_grid = torch.from_numpy(grid).requires_grad_(True)
    out = F.grid_sample(t_img, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    out.backward(torch.from_numpy(np.transpose(cot, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(gi), np.transpose(t_img.grad.numpy(), (0, 2, 3, 1)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(gg), t_grid.grad.numpy(), atol=1e-4)


def test_grid_sample_check_grads(rng):
    from jax.test_util import check_grads

    img = jnp.asarray(rng.randn(1, 6, 6, 2).astype(np.float32))
    # keep fractional positions away from integer lattice (floor kinks)
    grid = jnp.asarray((rng.rand(1, 4, 4, 2) * 1.6 - 0.8 + 0.013).astype(np.float32))
    check_grads(lambda i, g: grid_sample(i, g), (img, grid), order=1,
                modes=["rev"], atol=1e-2, rtol=1e-2)


def test_build_patch_grid_matches_reference_math(rng):
    """The grid for a landmark at exact integer coords crops that patch."""
    b, d = 2, 32
    img = rng.rand(b, 128, 128, 3).astype(np.float32)
    centers = np.array([[[64.0, 64.0]], [[40.0, 80.0]]], np.float32)  # (x, y)
    g = build_patch_grid(jnp.asarray(centers), d)
    assert g.shape == (b, d, d, 2)
    patch = np.asarray(warp(jnp.asarray(img), g))
    # Oracle via torch grid_sample with the same analytic grid
    ref = _torch_grid_sample(img, np.asarray(g))
    np.testing.assert_allclose(patch, ref, atol=1e-5)


def test_center_crop_grid_shape():
    g = center_crop_grid(3, 98)
    assert g.shape == (3, 98, 98, 2)
    # center of the grid should sample near pixel (64, 77) normalized
    c = np.asarray(g)[0, 49, 49]
    np.testing.assert_allclose(c, [(0.0) / 64, 13.0 / 64], atol=0.05)
