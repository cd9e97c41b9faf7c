"""Torch-parity image resizing for NHWC tensors.

The reference mixes three interpolation flavours (all must match exactly for
the <1e-3 parity gate):

  * ``F.interpolate(mode='bilinear')`` with the default
    ``align_corners=False`` — multi-scale GT images, LightCNN crops, the
    discriminator's pyramid (reference: models/ffwm_model.py:92-93,
    models/base_networks.py:428-432),
  * ``F.interpolate(mode='bilinear', align_corners=True)`` — the
    illumination loss resize (models/losses.py:137-142) and
    FastGuidedFilter upsampling (models/external_function.py:234-235),
  * ``F.interpolate(mode='nearest')`` — mask resizing
    (models/ffwm_model.py:94-95, models/losses.py:153).

Because target sizes are static, the source indices and lerp weights are
precomputed with float64 numpy at trace time (mirroring torch's double
`area_pixel_compute_scale`), and the resize lowers to two cheap gathers +
lerps per axis that XLA fuses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_indices(in_size: int, out_size: int, align_corners: bool):
    """torch upsample_bilinear2d source indices + weights (float64 host math)."""
    i = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = 0.0 if out_size <= 1 else (in_size - 1) / (out_size - 1)
        src = i * scale
    else:
        scale = in_size / out_size
        src = np.maximum(scale * (i + 0.5) - 0.5, 0.0)
    i0 = src.astype(np.int64)
    lam = src - i0
    i1 = np.minimum(i0 + 1, in_size - 1)
    return (
        jnp.asarray(i0, jnp.int32),
        jnp.asarray(i1, jnp.int32),
        jnp.asarray(lam, jnp.float32),
    )


def _nearest_indices(in_size: int, out_size: int):
    """torch upsample_nearest2d source indices (floor(i * scale), fp math)."""
    scale = np.float32(in_size / out_size)
    src = np.floor(np.arange(out_size, dtype=np.float32) * scale)
    return jnp.asarray(np.minimum(src, in_size - 1).astype(np.int64), jnp.int32)


@functools.partial(jax.jit, static_argnames=("size", "align_corners"))
def resize_bilinear(
    x: jax.Array, size: tuple[int, int], align_corners: bool = False
) -> jax.Array:
    """Bilinear resize of [B,H,W,C] (or [H,W,C]) to ``size=(h, w)``.

    Exact match of ``torch.nn.functional.interpolate(mode='bilinear')``.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h_out, w_out = size
    b, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x[0] if squeeze else x

    dt = x.dtype
    if h != h_out:
        i0, i1, lam = _bilinear_indices(h, h_out, align_corners)
        lam = lam.astype(dt)[None, :, None, None]
        x = jnp.take(x, i0, axis=1) * (1 - lam) + jnp.take(x, i1, axis=1) * lam
    if w != w_out:
        i0, i1, lam = _bilinear_indices(w, w_out, align_corners)
        lam = lam.astype(dt)[None, None, :, None]
        x = jnp.take(x, i0, axis=2) * (1 - lam) + jnp.take(x, i1, axis=2) * lam
    return x[0] if squeeze else x


@functools.partial(jax.jit, static_argnames=("size",))
def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest resize of [B,H,W,C] to ``size``; torch 'nearest' semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h_out, w_out = size
    _, h, w, _ = x.shape
    if h != h_out:
        x = jnp.take(x, _nearest_indices(h, h_out), axis=1)
    if w != w_out:
        x = jnp.take(x, _nearest_indices(w, w_out), axis=2)
    return x[0] if squeeze else x


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """``F.interpolate(scale_factor=2, mode='bilinear')`` (align_corners=False).

    Used for the TP-GAN-style coarse-to-fine recursion in the generator
    (reference: models/base_networks.py:337).
    """
    b, h, w, c = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=False)
