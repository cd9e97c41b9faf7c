"""resample2d — Gaussian-weighted flow resampling.

TPU-native equivalent of the reference CUDA extension
(cuda/resample2d_package/resample2d_kernel.cu:20-95): per output pixel the
flow gives an offset (dx, dy) and a per-pixel sigma; the kernel samples
``(kernel_size/2)^2`` groups of 4 taps around ``(x+dx, y+dy)`` at positions
``floor +- f*dilation``, weights each tap ``exp(-d^2 / (2 sigma^2))``
separably in x/y, and normalizes by the weight sum (SAFE_DIV eps = 1e-8).
Taps are border-clamped; weights use the unclamped distances.

Instantiated in PerceptualCorrectness as ``Resample2d(4, 1, sigma=2)``
(reference: models/losses.py:329) — capability surface, since the default
``use_bilinear_sampling=True`` bypasses it (:332, :356-359).

The backward (analytic in CUDA, :98-330, including the quotient-rule term
over the normalizer) is obtained here by JAX autodiff of the same math —
gather transpose for the image gradient, analytic weight derivatives for the
flow/sigma gradient — deterministic on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ffwm_tpu.ops.block_extractor import _gather_border

_EPS = 1e-8


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilation"))
def resample2d(
    image: jax.Array,
    flow: jax.Array,
    sigma: jax.Array | float = 5.0,
    kernel_size: int = 2,
    dilation: int = 1,
) -> jax.Array:
    """Gaussian-weighted resampling of ``image`` by pixel-offset ``flow``.

    image: [B, H, W, C]; flow: [B, Hf, Wf, 2] pixel offsets (x, y);
    sigma: scalar or [B, Hf, Wf] per-pixel bandwidth.
    Returns [B, Hf, Wf, C]. kernel_size=2 reduces to sigma-weighted bilinear.
    """
    b, h, w, c = image.shape
    _, hf, wf, two = flow.shape
    assert two == 2
    flat = image.reshape(b, h * w, c)

    sigma = jnp.broadcast_to(jnp.asarray(sigma, image.dtype), (b, hf, wf)).reshape(b, -1)
    dx = flow[..., 0].reshape(b, -1)
    dy = flow[..., 1].reshape(b, -1)

    xg = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 1).reshape(-1)
    yg = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 0).reshape(-1)
    xf = xg[None] + dx
    yf = yg[None] + dy
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    alpha = xf - x0
    beta = yf - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    inv_two_sig2 = 1.0 / (2.0 * sigma * sigma + _EPS * (sigma == 0))
    # SAFE_DIV in the CUDA kernel divides by EPS when the denominator is 0;
    # sigma is a strictly positive constant on every live path, so guarding
    # the denominator with eps matches to fp precision.

    val = jnp.zeros((b, hf * wf, c), image.dtype)
    wsum = jnp.zeros((b, hf * wf), image.dtype)
    for fy in range(kernel_size // 2):
        y_t = y0i - fy * dilation
        y_b = y0i + (fy + 1) * dilation
        d_yt = fy * dilation + beta
        d_yb = (1.0 + fy) * dilation - beta
        w_yt = jnp.exp(-d_yt * d_yt * inv_two_sig2)
        w_yb = jnp.exp(-d_yb * d_yb * inv_two_sig2)
        for fx in range(kernel_size // 2):
            x_l = x0i - fx * dilation
            x_r = x0i + (fx + 1) * dilation
            d_xl = fx * dilation + alpha
            d_xr = (1.0 + fx) * dilation - alpha
            w_xl = jnp.exp(-d_xl * d_xl * inv_two_sig2)
            w_xr = jnp.exp(-d_xr * d_xr * inv_two_sig2)

            val = val + (w_yt * w_xl)[..., None] * _gather_border(flat, x_l, y_t, h, w)
            val = val + (w_yt * w_xr)[..., None] * _gather_border(flat, x_r, y_t, h, w)
            val = val + (w_yb * w_xl)[..., None] * _gather_border(flat, x_l, y_b, h, w)
            val = val + (w_yb * w_xr)[..., None] * _gather_border(flat, x_r, y_b, h, w)
            wsum = wsum + w_yt * w_xl + w_yt * w_xr + w_yb * w_xl + w_yb * w_xr

    out = val / jnp.where(wsum == 0, _EPS, wsum)[..., None]
    return out.reshape(b, hf, wf, c)
