"""Landmark flow-supervision losses.

Rebuild of LandmarkLoss / MultiScaleLDLoss (models/losses.py:61-74,114-126):
gather the predicted flow at the frontal-landmark pixel positions and MSE it
against the profile landmarks normalized to [-1, 1], masked by the validity
``gate``. Multi-scale weights [1000, 1000, 1500] over [flow128, flow64,
flow32], with landmark coordinates integer-divided by the scale factor
(torch 1.5 LongTensor.div == floor division — parity quirk).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

MULTISCALE_LD_WEIGHTS = (1000.0, 1000.0, 1500.0)


def landmark_loss(flow: jax.Array, lm_s: jax.Array, lm_f: jax.Array,
                  gate: jax.Array) -> jax.Array:
    """flow: [B,s,s,2] grid; lm_s/lm_f: [B,N,2] int pixel coords (x, y);
    gate: [B,N,2] validity in {0,1}."""
    b, s, _, _ = flow.shape
    flow_view = flow.reshape(b, s * s, 2)
    index = lm_f[:, :, 0:1] + lm_f[:, :, 1:2] * s          # [B, N, 1]
    index = jnp.broadcast_to(index, index.shape[:2] + (2,))
    flow_points = jnp.take_along_axis(flow_view, index.astype(jnp.int32), axis=1)
    gt_points = lm_s.astype(jnp.float32) / (s / 2.0) - 1.0
    g = gate.astype(jnp.float32)
    return jnp.mean(jnp.square(flow_points * g - gt_points * g))


def multiscale_landmark_loss(
    flows: Sequence[jax.Array],
    lm_s: jax.Array,
    lm_f: jax.Array,
    gate: jax.Array,
    weights: Sequence[float] = MULTISCALE_LD_WEIGHTS,
    img_size: int = 128,
) -> jax.Array:
    """flows finest-first: [flow128, flow64, flow32] (flownet_model.py:65)."""
    loss = jnp.asarray(0.0, jnp.float32)
    for i, flow in enumerate(flows):
        scale = img_size // flow.shape[2]
        loss = loss + weights[i] * landmark_loss(
            flow, lm_s // scale, lm_f // scale, gate
        )
    return loss
