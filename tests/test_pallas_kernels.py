"""Pallas kernels vs the verified XLA formulations (interpret mode on CPU;
the driver's bench exercises the compiled TPU path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffwm_tpu.ops.block_extractor import block_extractor
from ffwm_tpu.ops.kernels.block_extractor_pallas import block_extractor_pallas
from ffwm_tpu.ops.kernels.resample2d_pallas import resample2d_pallas
from ffwm_tpu.ops.kernels.warp_pallas import grid_sample_pallas
from ffwm_tpu.ops.resample2d import resample2d
from ffwm_tpu.ops.warp import grid_sample

INTERPRET = True  # compiled Mosaic path needs a real TPU


def test_warp_pallas_forward(rng):
    img = jnp.asarray(rng.rand(2, 16, 20, 8), jnp.float32)
    grid = jnp.asarray(rng.rand(2, 16, 20, 2) * 3 - 1.5, jnp.float32)
    out = grid_sample_pallas(img, grid, False, 8, INTERPRET)
    ref = grid_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_warp_pallas_channel_blocks_and_padding(rng):
    # c=10 with c_block=8 exercises channel padding + multi-block grid
    img = jnp.asarray(rng.rand(1, 8, 8, 10), jnp.float32)
    grid = jnp.asarray(rng.rand(1, 8, 8, 2) * 2 - 1, jnp.float32)
    out = grid_sample_pallas(img, grid, False, 8, INTERPRET)
    ref = grid_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_warp_pallas_fallback_other_geometry(rng):
    # output positions != source pixels -> XLA fallback path
    img = jnp.asarray(rng.rand(1, 8, 8, 4), jnp.float32)
    grid = jnp.asarray(rng.rand(1, 5, 7, 2) * 2 - 1, jnp.float32)
    out = grid_sample_pallas(img, grid, False, 16, INTERPRET)
    ref = grid_sample(img, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_warp_pallas_grads_match(rng):
    img = jnp.asarray(rng.rand(1, 6, 6, 4), jnp.float32)
    grid = jnp.asarray(rng.rand(1, 6, 6, 2) * 2 - 1, jnp.float32)
    cot = jnp.asarray(rng.rand(1, 6, 6, 4), jnp.float32)
    g1 = jax.grad(lambda i, g: jnp.vdot(
        grid_sample_pallas(i, g, False, 16, INTERPRET), cot), (0, 1))(img, grid)
    g2 = jax.grad(lambda i, g: jnp.vdot(grid_sample(i, g), cot), (0, 1))(img, grid)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_warp_vmem_forward_and_padding(rng):
    """The PRODUCTION compiled-Mosaic warp (ships on TPU via
    ops.warp._patch_forward): full-raster geometry, channel padding to the
    128-lane boundary, and the CLIP-shifted zeros-padding weights."""
    from ffwm_tpu.ops.kernels.warp_vmem_pallas import _forward, grid_sample_vmem

    img = jnp.asarray(rng.rand(2, 16, 16, 5), jnp.float32)  # c=5 -> pad 128
    grid = jnp.asarray(rng.rand(2, 16, 16, 2) * 3 - 1.5, jnp.float32)
    out = _forward(img, grid, False, interpret=True)
    ref = grid_sample(img, grid, impl="taps")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # gradients: grid_sample_vmem's custom VJP delegates verbatim to the
    # XLA formulation (jax.vjp of ops.warp.grid_sample), which
    # test_ops_warp.py pins against the torch oracle — nothing kernel-
    # specific to test beyond the forward above.
    del grid_sample_vmem


def test_resample2d_vmem_forward(rng):
    """Compiled-Mosaic resample2d (4x4 window dump + per-axis cell
    weights) vs the XLA oracle, incl. border clamping + odd sizes."""
    from ffwm_tpu.ops.kernels.warp_vmem_pallas import _r2d_forward

    img = jnp.asarray(rng.rand(2, 12, 14, 5), jnp.float32)
    flow = jnp.asarray(rng.randn(2, 12, 14, 2) * 4, jnp.float32)
    out = _r2d_forward(img, flow, 2.0, interpret=True)
    ref = resample2d(img, flow, 2.0, kernel_size=4, dilation=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k", [3, 5])
def test_block_extractor_vmem_forward(rng, k):
    """Compiled-Mosaic block_extractor ((k+2)^2 window dump + per-sample
    cell weights) vs the XLA oracle."""
    from ffwm_tpu.ops.kernels.warp_vmem_pallas import _be_forward

    src = jnp.asarray(rng.rand(2, 10, 12, 3), jnp.float32)
    flow = jnp.asarray(rng.randn(2, 6, 7, 2) * 4, jnp.float32)
    out = _be_forward(src, flow, k, interpret=True)
    ref = block_extractor(src, flow, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_warp_vmem_bf16_upcast_path(rng):
    from ffwm_tpu.ops.kernels.warp_vmem_pallas import _forward

    img = jnp.asarray(rng.rand(1, 8, 8, 4), jnp.bfloat16)
    grid = jnp.asarray(rng.rand(1, 8, 8, 2) * 2 - 1, jnp.bfloat16)
    out = _forward(img, grid, False, interpret=True)
    assert out.dtype == jnp.bfloat16
    # coords/weights computed in fp32 inside the kernel path; compare
    # against the fp32 reference with bf16 tolerance
    ref = grid_sample(img.astype(jnp.float32), grid.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2)


@pytest.mark.parametrize("k,sigma", [(2, 5.0), (4, 2.0)])
def test_resample2d_pallas_forward(rng, k, sigma):
    img = jnp.asarray(rng.rand(2, 9, 11, 4), jnp.float32)
    flow = jnp.asarray(rng.rand(2, 9, 11, 2) * 4 - 2, jnp.float32)
    out = resample2d_pallas(img, flow, sigma, k, 1, 64, INTERPRET)
    ref = resample2d(img, flow, sigma, kernel_size=k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_resample2d_pallas_grads(rng):
    img = jnp.asarray(rng.rand(1, 6, 6, 2), jnp.float32)
    flow = jnp.asarray(rng.rand(1, 6, 6, 2) * 2 - 1, jnp.float32)
    cot = jnp.asarray(rng.rand(1, 6, 6, 2), jnp.float32)
    g1 = jax.grad(lambda i, f: jnp.vdot(
        resample2d_pallas(i, f, 2.0, 4, 1, 36, INTERPRET), cot), (0, 1))(img, flow)
    g2 = jax.grad(lambda i, f: jnp.vdot(
        resample2d(i, f, 2.0, kernel_size=4), cot), (0, 1))(img, flow)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("k", [3, 5])
def test_block_extractor_pallas_forward(rng, k):
    src = jnp.asarray(rng.rand(2, 10, 12, 3), jnp.float32)
    flow = jnp.asarray(rng.rand(2, 6, 7, 2) * 8 - 4, jnp.float32)
    out = block_extractor_pallas(src, flow, k, 32, INTERPRET)
    ref = block_extractor(src, flow, k)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_block_extractor_pallas_grads(rng):
    src = jnp.asarray(rng.rand(1, 7, 7, 2), jnp.float32)
    flow = jnp.asarray(rng.rand(1, 4, 4, 2) * 2 - 1, jnp.float32)
    cot = jnp.asarray(rng.rand(1, 12, 12, 2), jnp.float32)
    g1 = jax.grad(lambda s, f: jnp.vdot(
        block_extractor_pallas(s, f, 3, 16, INTERPRET), cot), (0, 1))(src, flow)
    g2 = jax.grad(lambda s, f: jnp.vdot(
        block_extractor(s, f, 3), cot), (0, 1))(src, flow)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
