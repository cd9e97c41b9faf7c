"""block_extractor — bilinear neighborhood gather driven by a flow field.

TPU-native equivalent of the reference CUDA extension
(cuda/block_extractor/block_extractor_kernel.cu:20-85): given a source image
and a flow field of *pixel offsets*, output block (yf, xf) holds the k x k
bilinear samples of the source around ``(xf + flow_x, yf + flow_y)`` at
integer offsets in [-k//2, k//2). Sample taps are **border-clamped** (not
zeroed — this differs from grid_sample's zeros padding).

Used by the affine flow regularizer during flow training
(reference: models/losses.py:211-219) with a *constant* flow of k//2.

The backward pass (atomicAdd scatter in CUDA, :89-170) is expressed here as
the JAX autodiff transpose of the gather — a deterministic segment-sum style
scatter-add on TPU, plus the analytic bilinear-weight derivative for the
flow gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_border(flat: jax.Array, xi: jax.Array, yi: jax.Array, h: int, w: int) -> jax.Array:
    """Gather [B,N,C] pixels at integer coords with border clamping."""
    xc = jnp.clip(xi, 0, w - 1)
    yc = jnp.clip(yi, 0, h - 1)
    return jnp.take_along_axis(flat, (yc * w + xc)[..., None], axis=1)


def bilinear_sample_border(source: jax.Array, sx: jax.Array, sy: jax.Array) -> jax.Array:
    """Bilinear-sample ``source`` [B,H,W,C] at pixel coords sx/sy [B,N].

    Taps are clamped to the border; weights come from the *unclamped*
    fractional position (matching the CUDA kernels). Returns [B,N,C].
    """
    b, h, w, c = source.shape
    flat = source.reshape(b, h * w, c)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    ax = (sx - x0).astype(source.dtype)[..., None]
    ay = (sy - y0).astype(source.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    return (
        _gather_border(flat, x0i, y0i, h, w) * (1 - ax) * (1 - ay)
        + _gather_border(flat, x0i + 1, y0i, h, w) * ax * (1 - ay)
        + _gather_border(flat, x0i, y0i + 1, h, w) * (1 - ax) * ay
        + _gather_border(flat, x0i + 1, y0i + 1, h, w) * ax * ay
    )


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def block_extractor(source: jax.Array, flow: jax.Array, kernel_size: int) -> jax.Array:
    """Extract flow-addressed k x k blocks.

    source: [B, Hs, Ws, C]; flow: [B, Hf, Wf, 2] pixel offsets (x, y).
    Returns [B, k*Hf, k*Wf, C] where the (yf, xf) block holds samples at
    ``(xf + flow_x + j - k//2, yf + flow_y + i - k//2)`` for i, j in [0, k).
    """
    k = kernel_size
    b, hs, ws, c = source.shape
    _, hf, wf, two = flow.shape
    assert two == 2

    # Absolute sample centers per flow pixel.
    xf = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 1)
    yf = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 0)
    cx = flow[..., 0] + xf[None]  # [B, Hf, Wf]
    cy = flow[..., 1] + yf[None]

    # Expand each center into its k x k offset lattice:
    # out pixel (yf*k + i, xf*k + j) samples (cx + j - k//2, cy + i - k//2).
    offs = jnp.arange(k, dtype=jnp.float32) - (k // 2)
    sx = cx[:, :, None, :, None] + offs[None, None, None, None, :]  # [B,Hf,1,Wf,k]
    sx = jnp.broadcast_to(sx, (b, hf, k, wf, k))
    sy = cy[:, :, None, :, None] + offs[None, None, :, None, None]  # [B,Hf,k,Wf,1]
    sy = jnp.broadcast_to(sy, (b, hf, k, wf, k))

    out = bilinear_sample_border(source, sx.reshape(b, -1), sy.reshape(b, -1))
    return out.reshape(b, hf * k, wf * k, c)
