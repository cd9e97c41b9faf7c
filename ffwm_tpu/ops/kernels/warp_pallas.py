"""Fused Pallas bilinear grid-sample (torch grid_sample parity).

TPU-native replacement for the hot warp (reference WarpNet /
F.grid_sample — the op behind every feature warp, patch crop and
illumination warp). One kernel instance processes one batch item and one
tile of output positions:

  * the full source image (flattened [H*W, C]) sits in VMEM,
  * the grid tile is unnormalized to pixel coords on the VPU,
  * the four taps are fetched with a vectorized dynamic row gather
    (jnp.take along the sublane axis — Mosaic's dynamic-gather path),
  * masking implements zeros padding; weighting and the 4-way reduction
    happen in registers; a single [TILE, C] store writes the result.

VJP: the custom backward reuses the XLA formulation from ffwm_tpu.ops.warp
(gather transpose -> deterministic scatter-add for the image; analytic
bilinear-weight derivative for the grid), already verified against torch
autograd in tests/test_ops_warp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ffwm_tpu.ops.warp import grid_sample as _grid_sample_xla


def _kernel(img_ref, grid_ref, out_ref, *, h: int, w: int, align_corners: bool):
    """img_ref: [H*W, C]; grid_ref: [TILE, 2]; out_ref: [TILE, C]."""
    gx = grid_ref[:, 0]
    gy = grid_ref[:, 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0)[:, None]
    wy = (iy - y0)[:, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img = img_ref[:, :]

    def tap(xi, yi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        rows = jnp.take(img, lin, axis=0)  # vectorized dynamic row gather
        return rows * (wgt * valid[:, None].astype(img.dtype))

    one = jnp.asarray(1.0, img.dtype)
    wx = wx.astype(img.dtype)
    wy = wy.astype(img.dtype)
    out_ref[:, :] = (
        tap(x0i, y0i, (one - wx) * (one - wy))
        + tap(x0i + 1, y0i, wx * (one - wy))
        + tap(x0i, y0i + 1, (one - wx) * wy)
        + tap(x0i + 1, y0i + 1, wx * wy)
    )


def _forward(image: jax.Array, grid: jax.Array, align_corners: bool,
             tile: int, interpret: bool) -> jax.Array:
    b, h, w, c = image.shape
    _, hg, wg, _ = grid.shape
    p = hg * wg
    img_flat = image.reshape(b, h * w, c)
    grid_flat = grid.reshape(b, p, 2)

    tile = min(tile, p)
    pad = (-p) % tile
    if pad:
        grid_flat = jnp.concatenate(
            [grid_flat, jnp.full((b, pad, 2), -2.0, grid.dtype)], axis=1)
    n_tiles = grid_flat.shape[1] // tile

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, align_corners=align_corners),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((None, h * w, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, 2), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tile, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, grid_flat.shape[1], c), image.dtype),
        interpret=interpret,
    )(img_flat, grid_flat)
    return out[:, :p].reshape(b, hg, wg, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grid_sample_pallas(image: jax.Array, grid: jax.Array,
                       align_corners: bool = False, tile: int = 1024,
                       interpret: bool = False) -> jax.Array:
    """Bilinear zeros-padding grid sample, Pallas forward / XLA backward."""
    return _forward(image, grid, align_corners, tile, interpret)


def _fwd(image, grid, align_corners, tile, interpret):
    return _forward(image, grid, align_corners, tile, interpret), (image, grid)


def _bwd(align_corners, tile, interpret, res, g):
    image, grid = res
    _, vjp = jax.vjp(
        lambda i, gr: _grid_sample_xla(i, gr, mode="bilinear",
                                       align_corners=align_corners),
        image, grid)
    return vjp(g)


grid_sample_pallas.defvjp(_fwd, _bwd)
