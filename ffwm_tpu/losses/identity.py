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


def identity_loss_pair(
    lightcnn: LightCNNFn,
    out_a: jax.Array,
    out_b: jax.Array,
    gt: jax.Array,
    crop: bool = False,
    weights: Tuple[float, float] = (0.5, 1.0),
) -> jax.Array:
    """``weights[0]*identity_loss(out_a, gt) + weights[1]*identity_loss(
    out_b, gt)`` with both differentiated branches batched through ONE
    LightCNN application (and the detached GT through one more) — the
    reference's raw x0.5 + GF x1 pair (models/ffwm_model.py:120-122).

    LightCNN is frozen and batch-invariant (convs + mfm max units, no batch
    statistics), so the values are identical to two separate calls; the
    2x-batch application just utilizes the MXU better (the per-family
    train-step profile showed the identity family at 2.8x its FLOP floor
    with narrow per-call batches — BASELINE.md round-3)."""
    if crop:
        out_a = _center_crop(out_a)
        out_b = _center_crop(out_b)
        gt = _center_crop(gt)
    b = out_a.shape[0]
    _, fc, pool = lightcnn(
        jnp.concatenate([grayscale(out_a), grayscale(out_b)], axis=0))
    _, fc_gt, pool_gt = lightcnn(jax.lax.stop_gradient(grayscale(gt)))
    fc_gt = jax.lax.stop_gradient(fc_gt)
    pool_gt = jax.lax.stop_gradient(pool_gt)

    def one(fc_x, pool_x):
        return (jnp.mean(jnp.abs(fc_x - fc_gt))
                + jnp.mean(jnp.abs(pool_x - pool_gt)))

    return (weights[0] * one(fc[:b], pool[:b])
            + weights[1] * one(fc[b:], pool[b:]))
