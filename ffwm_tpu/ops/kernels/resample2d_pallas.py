"""Fused Pallas resample2d (Gaussian-weighted flow resampling).

Pallas rebuild of the reference CUDA forward
(cuda/resample2d_package/resample2d_kernel.cu:20-95): per output tile, the
offsets/sigma come in as a flow tile, the (k/2)^2 tap groups are unrolled at
trace time (k is static), each group's 4 border-clamped taps are fetched
with vectorized dynamic row gathers from the VMEM-resident source image, and
the Gaussian-weighted normalization happens in registers.

VJP: custom backward reuses the XLA formulation (ffwm_tpu.ops.resample2d),
whose transpose is a deterministic scatter-add — the TPU equivalent of the
CUDA backward's atomicAdd (:98-330).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ffwm_tpu.ops.resample2d import resample2d as _resample2d_xla

_EPS = 1e-8


def _kernel(img_ref, flow_ref, sigma_ref, out_ref, *, h: int, w: int,
            wf: int, kernel_size: int, dilation: int, tile_offset_dim: int):
    """img_ref: [H*W, C]; flow_ref: [TILE, 2]; sigma_ref: [TILE, 1];
    out_ref: [TILE, C]. Output position p = tile_start + arange(TILE)."""
    ti = pl.program_id(1)
    tile = flow_ref.shape[0]
    p0 = ti * tile
    p = p0 + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
    xg = (p % wf).astype(jnp.float32)
    yg = (p // wf).astype(jnp.float32)

    dx = flow_ref[:, 0]
    dy = flow_ref[:, 1]
    sigma = sigma_ref[:, 0]
    xf = xg + dx
    yf = yg + dy
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    alpha = xf - x0
    beta = yf - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    inv2s2 = 1.0 / (2.0 * sigma * sigma + _EPS)

    img = img_ref[:, :]

    def gather(xi, yi):
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        return jnp.take(img, lin, axis=0)

    c = img.shape[-1]
    val = jnp.zeros((flow_ref.shape[0], c), img.dtype)
    wsum = jnp.zeros((flow_ref.shape[0],), img.dtype)
    for fy in range(kernel_size // 2):
        y_t = y0i - fy * dilation
        y_b = y0i + (fy + 1) * dilation
        w_yt = jnp.exp(-jnp.square(fy * dilation + beta) * inv2s2)
        w_yb = jnp.exp(-jnp.square((1.0 + fy) * dilation - beta) * inv2s2)
        for fx in range(kernel_size // 2):
            x_l = x0i - fx * dilation
            x_r = x0i + (fx + 1) * dilation
            w_xl = jnp.exp(-jnp.square(fx * dilation + alpha) * inv2s2)
            w_xr = jnp.exp(-jnp.square((1.0 + fx) * dilation - alpha) * inv2s2)
            val = val + (w_yt * w_xl)[:, None] * gather(x_l, y_t)
            val = val + (w_yt * w_xr)[:, None] * gather(x_r, y_t)
            val = val + (w_yb * w_xl)[:, None] * gather(x_l, y_b)
            val = val + (w_yb * w_xr)[:, None] * gather(x_r, y_b)
            wsum = wsum + w_yt * w_xl + w_yt * w_xr + w_yb * w_xl + w_yb * w_xr

    out_ref[:, :] = val / jnp.where(wsum == 0, _EPS, wsum)[:, None]


def _forward(image, flow, sigma, kernel_size, dilation, tile, interpret):
    b, h, w, c = image.shape
    _, hf, wf, _ = flow.shape
    p = hf * wf
    img_flat = image.reshape(b, h * w, c)
    flow_flat = flow.reshape(b, p, 2)
    sigma_flat = jnp.broadcast_to(
        jnp.asarray(sigma, image.dtype), (b, hf, wf)).reshape(b, p, 1)

    tile = min(tile, p)
    pad = (-p) % tile
    if pad:
        flow_flat = jnp.concatenate(
            [flow_flat, jnp.zeros((b, pad, 2), flow.dtype)], axis=1)
        sigma_flat = jnp.concatenate(
            [sigma_flat, jnp.ones((b, pad, 1), image.dtype)], axis=1)
    n_tiles = flow_flat.shape[1] // tile

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, wf=wf, kernel_size=kernel_size,
                          dilation=dilation, tile_offset_dim=tile),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((None, h * w, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, 2), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, 1), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, flow_flat.shape[1], c), image.dtype),
        interpret=interpret,
    )(img_flat, flow_flat, sigma_flat)
    return out[:, :p].reshape(b, hf, wf, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def resample2d_pallas(image, flow, sigma, kernel_size: int,
                      dilation: int, tile: int, interpret: bool):
    """Gaussian-weighted resampling; Pallas forward / XLA backward."""
    return _forward(image, flow, sigma, kernel_size, dilation, tile, interpret)


def _fwd(image, flow, sigma, kernel_size, dilation, tile, interpret):
    out = _forward(image, flow, sigma, kernel_size, dilation, tile, interpret)
    return out, (image, flow, sigma)


def _bwd(kernel_size, dilation, tile, interpret, res, g):
    image, flow, sigma = res
    _, vjp = jax.vjp(
        lambda i, f, s: _resample2d_xla(i, f, s, kernel_size=kernel_size,
                                        dilation=dilation),
        image, flow, sigma)
    return vjp(g)


resample2d_pallas.defvjp(_fwd, _bwd)
