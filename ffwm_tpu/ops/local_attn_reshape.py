"""local_attn_reshape — depth-to-space tiling of per-pixel k^2 vectors.

TPU-native equivalent of the reference CUDA extension
(cuda/local_attn_reshape/local_attn_reshape_kernel.cu:20-61):
``out[y, x] = in[(y % k) * k + (x % k), y // k, x // k]`` — each pixel's
k^2-channel vector is written out as a k x k spatial tile.

On TPU this is pure data movement: a reshape + transpose that XLA lowers to
an efficient relayout, with an exact automatic transpose for the gradient
(the CUDA backward at :65-108 is the same permutation scattered back).
No Pallas kernel is needed — there is no compute to fuse.
"""

from __future__ import annotations

import functools

import jax


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def local_attn_reshape(inputs: jax.Array, kernel_size: int) -> jax.Array:
    """[B, H, W, k*k] -> [B, k*H, k*W, 1] depth-to-space (NHWC).

    Channel c = i*k + j of pixel (h, w) lands at output position
    (h*k + i, w*k + j).
    """
    k = kernel_size
    b, h, w, c = inputs.shape
    assert c == k * k, f"channels ({c}) must equal kernel_size^2 ({k * k})"
    x = inputs.reshape(b, h, w, k, k)          # [b, h, w, i, j]
    x = x.transpose(0, 1, 3, 2, 4)             # [b, h, i, w, j]
    return x.reshape(b, h * k, w * k, 1)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def local_attn_reshape_inverse(inputs: jax.Array, kernel_size: int) -> jax.Array:
    """[B, k*H, k*W, 1] -> [B, H, W, k*k] space-to-depth (exact inverse)."""
    k = kernel_size
    b, hk, wk, _ = inputs.shape
    h, w = hk // k, wk // k
    x = inputs.reshape(b, h, k, w, k)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w, k * k)
