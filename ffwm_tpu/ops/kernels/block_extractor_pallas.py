"""Fused Pallas block_extractor (flow-addressed k x k neighborhood gather).

Pallas rebuild of the reference CUDA forward
(cuda/block_extractor/block_extractor_kernel.cu:20-85): each program handles
a tile of *flow* positions and emits all k^2 samples of each block in one
shot — the offset lattice is unrolled at trace time (k static), each offset
doing one vectorized 4-tap bilinear gather from the VMEM-resident source.
Output layout matches the reference: block (yf, xf) occupies output rows
[yf*k : yf*k+k] x cols [xf*k : xf*k+k].

VJP: custom backward reuses the XLA formulation
(ffwm_tpu.ops.block_extractor) — deterministic scatter-add transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ffwm_tpu.ops.block_extractor import block_extractor as _block_extractor_xla


def _kernel(img_ref, flow_ref, out_ref, *, h: int, w: int, wf: int, k: int):
    """img_ref: [H*W, C]; flow_ref: [TILE, 2];
    out_ref: [TILE, k*k, C] (offset-major per flow position)."""
    ti = pl.program_id(1)
    tile = flow_ref.shape[0]
    p = ti * tile + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)[:, 0]
    xf = (p % wf).astype(jnp.float32)
    yf = (p // wf).astype(jnp.float32)

    cx = flow_ref[:, 0] + xf
    cy = flow_ref[:, 1] + yf
    img = img_ref[:, :]

    def gather(xi, yi):
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        return jnp.take(img, lin, axis=0)

    for i in range(k):       # y offset
        for j in range(k):   # x offset
            sx = cx + (j - k // 2)
            sy = cy + (i - k // 2)
            x0 = jnp.floor(sx)
            y0 = jnp.floor(sy)
            ax = (sx - x0)[:, None].astype(img.dtype)
            ay = (sy - y0)[:, None].astype(img.dtype)
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)
            sample = (
                gather(x0i, y0i) * (1 - ax) * (1 - ay)
                + gather(x0i + 1, y0i) * ax * (1 - ay)
                + gather(x0i, y0i + 1) * (1 - ax) * ay
                + gather(x0i + 1, y0i + 1) * ax * ay
            )
            out_ref[:, i * k + j, :] = sample


def _forward(source, flow, k, tile, interpret):
    b, h, w, c = source.shape
    _, hf, wf, _ = flow.shape
    p = hf * wf
    img_flat = source.reshape(b, h * w, c)
    flow_flat = flow.reshape(b, p, 2)
    tile = min(tile, p)
    pad = (-p) % tile
    if pad:
        flow_flat = jnp.concatenate(
            [flow_flat, jnp.zeros((b, pad, 2), flow.dtype)], axis=1)
    n_tiles = flow_flat.shape[1] // tile

    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, wf=wf, k=k),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((None, h * w, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tile, 2), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tile, k * k, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, flow_flat.shape[1], k * k, c),
                                       source.dtype),
        interpret=interpret,
    )(img_flat, flow_flat)

    # [B, P, k*k, C] -> [B, k*Hf, k*Wf, C] (reference output layout)
    out = out[:, :p].reshape(b, hf, wf, k, k, c)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, hf * k, wf * k, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def block_extractor_pallas(source, flow, kernel_size: int, tile: int,
                           interpret: bool):
    """Flow-addressed block gather; Pallas forward / XLA backward."""
    return _forward(source, flow, kernel_size, tile, interpret)


def _fwd(source, flow, kernel_size, tile, interpret):
    return _forward(source, flow, kernel_size, tile, interpret), (source, flow)


def _bwd(kernel_size, tile, interpret, res, g):
    source, flow = res
    _, vjp = jax.vjp(
        lambda s, f: _block_extractor_xla(s, f, kernel_size), source, flow)
    return vjp(g)


block_extractor_pallas.defvjp(_fwd, _bwd)
