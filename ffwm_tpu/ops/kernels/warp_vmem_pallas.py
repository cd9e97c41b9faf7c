"""Compiled Mosaic warp: VMEM-resident source + scalar-loop patch loads.

Why this shape: XLA's general ``lax.gather`` on TPU issues one DMA
descriptor per index (~30 ns each measured on v5e — 33M idx/s, 16 GB/s
effective for the 2x2xC patch gather in ffwm_tpu.ops.warp), and Mosaic's
vectorized ``tpu.dynamic_gather`` cannot address across vregs, so a
whole-image vector gather does not lower ("Multiple source vregs along
gather dimension", see tools/pallas_tpu_probe.py). What *does* lower is a
hardware loop of scalar-addressed VMEM vector loads: the source image
[H*W, C] is VMEM-resident (2-4 MB at 128^2 — fits in v5e's 128 MB VMEM),
and each iteration copies the two x-adjacent row pairs of a bilinear 2x2
patch with dynamic sublane offsets.

The kernel is pure data movement (the gather XLA can't do fast); index
computation and the bilinear weighting stay outside in XLA where they
vectorize perfectly. Gradients: custom VJP reusing the XLA formulations
from ffwm_tpu.ops.warp (deterministic matmul image-adjoint), mirroring the
reference CUDA kernels' split fwd/bwd
(cuda/resample2d_package/resample2d_kernel.cu:20-95 fwd vs :98-330 bwd).

Semantics: identical to ffwm_tpu.ops.warp.grid_sample (torch
``grid_sample``, bilinear, zeros padding, align_corners=False) for any
grid geometry; non-square-raster grids fall back to the XLA patch gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ffwm_tpu.ops.warp import (
    _axis_weights,
    _unnormalize,
    grid_sample as _grid_sample_xla,
)


def _kernel(lin_ref, img_ref, out_ref, img_vmem, copy_sem, *, n_blk: int,
            w_row: int):
    """lin_ref: [1, N_blk] int32 (SMEM) clamped patch starts (linear,
    row-major); img_ref: [B, H*W, C] (HBM, unblocked); out_ref: [N_blk*4, C]
    (VMEM) — rows 4p..4p+3 hold the taps (y0,x0), (y0,x1), (y1,x0), (y1,x1)
    of block-local output pixel p; img_vmem: [H*W, C] scratch holding the
    source for the whole batch item (scratch persists across the sequential
    pixel-block grid steps, so the copy runs once per batch item — keeping
    the source OUT of the block pipeline also keeps it single-buffered,
    which is what makes a 4 MB source fit the 16 MB scoped-VMEM budget)."""

    @pl.when(pl.program_id(1) == 0)
    def _():
        dma = pltpu.make_async_copy(img_ref.at[pl.program_id(0)], img_vmem,
                                    copy_sem)
        dma.start()
        dma.wait()

    _copy_loop(lin_ref, img_vmem, out_ref, n_blk=n_blk, w_row=w_row)


def _kernel_blocked(lin_ref, img_ref, out_ref, *, n_blk: int, w_row: int):
    """Interpret-mode variant: the source arrives as a pipelined VMEM block
    instead of scratch+DMA (``pl.program_id`` has no CPU interpret rule in
    this jax, so the DMA-once-per-batch-item guard can't run there). Same
    copy loop; only the TPU variant's VMEM budgeting differs."""
    _copy_loop(lin_ref, img_ref, out_ref, n_blk=n_blk, w_row=w_row)


def _copy_loop(lin_ref, src_ref, out_ref, *, n_blk: int, w_row: int):
    UNROLL = 8

    def body(i, _):
        # manual unroll: Mosaic's fori_loop supports only full or no unroll
        for j in range(UNROLL):
            p = i * UNROLL + j
            lin = lin_ref[0, p]
            base = p * 4
            out_ref[pl.ds(base, 2), :] = src_ref[pl.ds(lin, 2), :]
            out_ref[pl.ds(base + 2, 2), :] = src_ref[pl.ds(lin + w_row, 2), :]
        return 0

    jax.lax.fori_loop(0, n_blk // UNROLL, body, 0)


def _patch_starts(image, grid, align_corners):
    """Clamped 2x2 patch starts + CLIP-shifted zeros-padding tap weights
    (the same scheme as ffwm_tpu.ops.warp._grid_sample_patch)."""
    b, h, w, c = image.shape
    p = grid.shape[1] * grid.shape[2]
    ix = _unnormalize(grid[..., 0].reshape(b, p), w, align_corners)
    iy = _unnormalize(grid[..., 1].reshape(b, p), h, align_corners)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sx = jnp.clip(x0i, 0, w - 2)
    sy = jnp.clip(y0i, 0, h - 2)
    dt = image.dtype
    wy0, wy1 = _axis_weights(y0i, sy, iy - y0, h, dt)
    wx0, wx1 = _axis_weights(x0i, sx, ix - x0, w, dt)
    lin = sy * w + sx
    wts = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    return lin, wts  # [B, P] int32, [B, P, 4]


def _forward(image, grid, align_corners, interpret: bool = False):
    b, h, w, c = image.shape
    _, hg, wg, _ = grid.shape
    n = hg * wg
    lin, wts = _patch_starts(image, grid, align_corners)
    # sub-fp32 dtypes pack >8 sublanes per vreg; the 2-row dynamic slices
    # then straddle packed tiles, which Mosaic can't lower — run the copy
    # loop on an fp32 view (the kernel is index-issue-bound, not
    # bandwidth-bound, so the upcast costs ~nothing) and cast back after.
    kdtype = jnp.float32 if image.dtype.itemsize < 4 else image.dtype
    img_flat = image.reshape(b, h * w, c).astype(kdtype)
    # the per-batch-item HBM slice feeding the DMA must be lane-aligned
    # (tpu.memref_slice: "slice shape along dimension 2 must be aligned to
    # tiling (128)") — pad channels up; the DMA/loop are index-issue-bound,
    # so the extra lanes are ~free
    ck = ((c + 127) // 128) * 128
    if ck != c:
        img_flat = jnp.concatenate(
            [img_flat, jnp.zeros((b, h * w, ck - c), kdtype)], axis=-1)

    # tile the output pixels: the [N_blk*4, Ck] tap buffer must fit the
    # ~16 MB scoped-VMEM budget alongside the single-buffered [H*W, Ck]
    # scratch source
    n_blk = n
    while n_blk * 4 * ck * jnp.dtype(kdtype).itemsize > 1024 * 1024:
        n_blk //= 2
    n_blocks = n // n_blk

    if interpret:
        taps = pl.pallas_call(
            functools.partial(_kernel_blocked, n_blk=n_blk, w_row=w),
            grid=(b, n_blocks),
            in_specs=[
                pl.BlockSpec((None, 1, n_blk), lambda i, j: (i, 0, j),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((None, h * w, ck), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((None, n_blk * 4, ck),
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n * 4, ck), kdtype),
            interpret=True,
        )(lin.reshape(b, 1, n), img_flat)
    else:
        taps = pl.pallas_call(
            functools.partial(_kernel, n_blk=n_blk, w_row=w),
            grid=(b, n_blocks),
            in_specs=[
                pl.BlockSpec((None, 1, n_blk), lambda i, j: (i, 0, j),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),  # [B, H*W, Ck] in HBM
            ],
            out_specs=pl.BlockSpec((None, n_blk * 4, ck),
                                   lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, n * 4, ck), kdtype),
            scratch_shapes=[
                pltpu.VMEM((h * w, ck), kdtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(lin.reshape(b, 1, n), img_flat)

    taps = taps[..., :c].reshape(b, n, 4, c)
    out = jnp.sum(taps * wts[..., None].astype(kdtype), axis=2)
    return out.reshape(b, hg, wg, c).astype(image.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def grid_sample_vmem(image: jax.Array, grid: jax.Array,
                     align_corners: bool = False) -> jax.Array:
    """Compiled-Mosaic bilinear grid sample (zeros padding, torch parity)."""
    return _forward(image, grid, align_corners)


def _fwd(image, grid, align_corners):
    return grid_sample_vmem(image, grid, align_corners), (image, grid)


def _bwd(align_corners, res, g):
    image, grid = res
    _, vjp = jax.vjp(
        lambda i, gr: _grid_sample_xla(i, gr, mode="bilinear",
                                       align_corners=align_corners),
        image, grid)
    return vjp(g)


grid_sample_vmem.defvjp(_fwd, _bwd)
