"""Illumination-preserving multi-scale L1 loss.

Rebuild of MSL1Loss (models/losses.py:130-155): warp each generated frontal
image back into the profile pose with the *reverse* flow and L1 it against
the (resized) profile image under the profile mask — this is what lets FFWM
train with illumination-inconsistent supervision.

Parity quirks preserved: the image resize uses bilinear with
``align_corners=True`` (:140); the mask resize uses nearest (:153);
per-scale weights are [1, 1, 1.5] over [128, 64, 32].
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ffwm_tpu.ops.resize import resize_bilinear, resize_nearest
from ffwm_tpu.ops.warp import warp

MSL1_WEIGHTS = (1.0, 1.0, 1.5)


def illumination_loss(
    flows: Sequence[jax.Array],
    fakes: Sequence[jax.Array],
    img_profile: jax.Array,
    mask: Optional[jax.Array] = None,
    weights: Sequence[float] = MSL1_WEIGHTS,
) -> jax.Array:
    """flows: reverse-flow grids finest-first [B,s,s,2] ([flowB128, flowB64,
    flowB32]); fakes: generated frontals at matching scales ([fake128,
    fake64, fake32]); img_profile/mask: full-res profile image and mask
    (models/ffwm_model.py:117-119)."""
    loss = jnp.asarray(0.0, jnp.float32)
    for i, flow in enumerate(flows):
        h, w = flow.shape[1:3]
        fake_back = warp(fakes[i], flow)
        target = resize_bilinear(img_profile, (h, w), align_corners=True)
        if mask is None:
            loss = loss + weights[i] * jnp.mean(jnp.abs(fake_back - target))
        else:
            m = resize_nearest(mask, (h, w))
            loss = loss + weights[i] * jnp.mean(jnp.abs(fake_back * m - target * m))
    return loss
