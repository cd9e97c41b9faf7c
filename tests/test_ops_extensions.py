"""local_attn_reshape / block_extractor / resample2d vs numpy brute-force oracles.

These mirror the reference's manual CUDA smoke tests
(cuda/block_extractor/test_block_extractor.py, cuda/local_attn_reshape/
test_local_attn_reshape.py): layout/identity checks + gradient checks.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.test_util import check_grads

from ffwm_tpu.ops import (
    block_extractor,
    local_attn_reshape,
    local_attn_reshape_inverse,
    resample2d,
)


# ---------------------------------------------------------------- reshape ---
def test_local_attn_reshape_layout():
    """out[y, x] = in[y//k, x//k, (y%k)*k + x%k] — arange pattern check."""
    k, h, w = 3, 4, 5
    x = np.arange(1 * h * w * k * k, dtype=np.float32).reshape(1, h, w, k * k)
    out = np.asarray(local_attn_reshape(jnp.asarray(x), k))
    assert out.shape == (1, k * h, k * w, 1)
    for y in range(k * h):
        for xx in range(k * w):
            expect = x[0, y // k, xx // k, (y % k) * k + (xx % k)]
            assert out[0, y, xx, 0] == expect
    # first tile of pixel (0,0) must be 0..k^2-1 row-major
    np.testing.assert_array_equal(
        out[0, :k, :k, 0], np.arange(k * k, dtype=np.float32).reshape(k, k)
    )


def test_local_attn_reshape_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 6, 7, 25).astype(np.float32))
    y = local_attn_reshape(x, 5)
    np.testing.assert_array_equal(np.asarray(local_attn_reshape_inverse(y, 5)), np.asarray(x))


def test_local_attn_reshape_grad():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 3, 3, 9).astype(np.float32))
    check_grads(lambda a: local_attn_reshape(a, 3), (x,), order=1, modes=["rev"],
                atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------- block_extractor ---
def _block_extractor_oracle(src, flow, k):
    """Brute-force NHWC port of the CUDA forward semantics."""
    b, hs, ws, c = src.shape
    _, hf, wf, _ = flow.shape
    out = np.zeros((b, k * hf, k * wf, c), np.float32)
    for bi in range(b):
        for y in range(k * hf):
            for x in range(k * wf):
                yf, xf = y // k, x // k
                dy = flow[bi, yf, xf, 1] + (y % k - k // 2) + yf
                dx = flow[bi, yf, xf, 0] + (x % k - k // 2) + xf
                x0, y0 = int(np.floor(dx)), int(np.floor(dy))
                ax, ay = dx - x0, dy - y0
                cl = lambda v, n: min(max(v, 0), n - 1)
                out[bi, y, x] = (
                    (1 - ax) * (1 - ay) * src[bi, cl(y0, hs), cl(x0, ws)]
                    + ax * (1 - ay) * src[bi, cl(y0, hs), cl(x0 + 1, ws)]
                    + (1 - ax) * ay * src[bi, cl(y0 + 1, hs), cl(x0, ws)]
                    + ax * ay * src[bi, cl(y0 + 1, hs), cl(x0 + 1, ws)]
                )
    return out


@pytest.mark.parametrize("k", [3, 5])
def test_block_extractor_matches_bruteforce(rng, k):
    src = rng.rand(2, 10, 12, 3).astype(np.float32)
    flow = (rng.rand(2, 6, 7, 2).astype(np.float32) * 8.0) - 4.0
    ours = np.asarray(block_extractor(jnp.asarray(src), jnp.asarray(flow), k))
    ref = _block_extractor_oracle(src, flow, k)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_block_extractor_zero_flow_center_identity(rng):
    """With zero flow, the center tap of each block is the source pixel."""
    k = 3
    src = rng.rand(1, 8, 8, 1).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    out = np.asarray(block_extractor(jnp.asarray(src), jnp.asarray(flow), k))
    np.testing.assert_allclose(out[0, 1::k, 1::k, 0], src[0, :, :, 0], atol=1e-6)


def test_block_extractor_grads(rng):
    src = jnp.asarray(rng.rand(1, 7, 7, 2).astype(np.float32))
    flow = jnp.asarray((rng.rand(1, 4, 4, 2) * 2 - 1 + 0.017).astype(np.float32))
    check_grads(lambda s, f: block_extractor(s, f, 3), (src, flow), order=1,
                modes=["rev"], atol=1e-2, rtol=1e-2)


# ---------------------------------------------------------------- resample2d ---
def _resample2d_oracle(img, flow, sigma, k, dil):
    b, h, w, c = img.shape
    _, hf, wf, _ = flow.shape
    out = np.zeros((b, hf, wf, c), np.float32)
    for bi in range(b):
        for y in range(hf):
            for x in range(wf):
                dx, dy = flow[bi, y, x]
                xf, yf = x + dx, y + dy
                alpha, beta = xf - np.floor(xf), yf - np.floor(yf)
                val = np.zeros(c, np.float32)
                s = 0.0
                cl = lambda v, n: min(max(int(v), 0), n - 1)
                for fy in range(k // 2):
                    y_t = cl(np.floor(yf) - fy * dil, h)
                    y_b = cl(np.floor(yf) + (fy + 1) * dil, h)
                    for fx in range(k // 2):
                        x_l = cl(np.floor(xf) - fx * dil, w)
                        x_r = cl(np.floor(xf) + (fx + 1) * dil, w)
                        wxl = np.exp(-((fx * dil + alpha) ** 2) / (2 * sigma**2))
                        wxr = np.exp(-(((1 + fx) * dil - alpha) ** 2) / (2 * sigma**2))
                        wyt = np.exp(-((fy * dil + beta) ** 2) / (2 * sigma**2))
                        wyb = np.exp(-(((1 + fy) * dil - beta) ** 2) / (2 * sigma**2))
                        val += (
                            wyt * wxl * img[bi, y_t, x_l]
                            + wyt * wxr * img[bi, y_t, x_r]
                            + wyb * wxl * img[bi, y_b, x_l]
                            + wyb * wxr * img[bi, y_b, x_r]
                        )
                        s += wxl * wyt + wxr * wyt + wxl * wyb + wxr * wyb
                out[bi, y, x] = val / (s if s != 0 else 1e-8)
    return out


@pytest.mark.parametrize("k,dil,sigma", [(2, 1, 5.0), (4, 1, 2.0)])
def test_resample2d_matches_bruteforce(rng, k, dil, sigma):
    img = rng.rand(1, 9, 11, 2).astype(np.float32)
    flow = (rng.rand(1, 9, 11, 2).astype(np.float32) * 4.0) - 2.0
    ours = np.asarray(
        resample2d(jnp.asarray(img), jnp.asarray(flow), sigma, kernel_size=k, dilation=dil)
    )
    ref = _resample2d_oracle(img, flow, sigma, k, dil)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_resample2d_zero_flow_near_identity(rng):
    """Zero flow + kernel 2: output = source (alpha=beta=0 -> weight on tap)."""
    img = rng.rand(1, 8, 8, 3).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    out = np.asarray(resample2d(jnp.asarray(img), jnp.asarray(flow), 2.0, kernel_size=2))
    # taps at distance 0 and 1 with gaussian weights; zero-flow blends with
    # the +1 neighbors — check center-heavy but not exact identity
    assert np.isfinite(out).all()
    w0, w1 = np.exp(0.0), np.exp(-1.0 / 8.0)
    # manual 1-pixel check at an interior position
    i, j = 3, 4
    expect = (
        w0 * w0 * img[0, i, j]
        + w0 * w1 * img[0, i, j + 1]
        + w1 * w0 * img[0, i + 1, j]
        + w1 * w1 * img[0, i + 1, j + 1]
    ) / (w0 * w0 + 2 * w0 * w1 + w1 * w1)
    np.testing.assert_allclose(out[0, i, j], expect, atol=1e-5)


def test_resample2d_grads(rng):
    img = jnp.asarray(rng.rand(1, 6, 6, 1).astype(np.float32))
    flow = jnp.asarray((rng.rand(1, 6, 6, 2) * 2 - 1 + 0.013).astype(np.float32))
    check_grads(
        lambda i, f: resample2d(i, f, 2.0, kernel_size=4), (img, flow),
        order=1, modes=["rev"], atol=1e-2, rtol=1e-2,
    )
