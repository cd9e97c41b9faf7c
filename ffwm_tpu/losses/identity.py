"""LightCNN identity loss.

Rebuild of IdentityLoss (models/losses.py:76-112): channel-mean grayscale of
generated and GT images through the frozen LightCNN-29; L1 on the 256-d fc
feature plus L1 on the 8x8x128 pool map, GT branch detached. Optional
center-crop mode warps a fixed 98x98 grid at (64, 77) and resizes back.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ffwm_tpu.models.lightcnn import grayscale
from ffwm_tpu.ops.resize import resize_bilinear
from ffwm_tpu.ops.warp import center_crop_grid, warp

LightCNNFn = Callable[[jax.Array], Tuple[jax.Array, jax.Array, jax.Array]]


def _center_crop(img: jax.Array, d: int = 98) -> jax.Array:
    b, h, w, _ = img.shape
    grid = center_crop_grid(b, d)
    return resize_bilinear(warp(img, grid), (h, w))


def identity_loss(
    lightcnn: LightCNNFn,
    out: jax.Array,
    gt: jax.Array,
    crop: bool = False,
) -> jax.Array:
    """lightcnn: apply fn returning (logits, fc, pool) on [B,H,W,1] gray."""
    if crop:
        out = _center_crop(out)
        gt = _center_crop(gt)
    _, fc_out, pool_out = lightcnn(grayscale(out))
    _, fc_gt, pool_gt = lightcnn(jax.lax.stop_gradient(grayscale(gt)))
    fc_gt = jax.lax.stop_gradient(fc_gt)
    pool_gt = jax.lax.stop_gradient(pool_gt)
    return jnp.mean(jnp.abs(fc_out - fc_gt)) + jnp.mean(jnp.abs(pool_out - pool_gt))
