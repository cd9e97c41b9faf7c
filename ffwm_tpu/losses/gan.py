"""GAN losses (lsgan live; nsgan/vanilla/hinge/wgangp/dcgan capability).

Rebuild of the reference GANLoss (models/losses.py:7-59). Accepts a single
prediction map or a list (the MSDiscriminator returns one aggregated map;
the list path sums losses). FFWM uses lsgan (models/ffwm_model.py:44).
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp

Pred = Union[jax.Array, Sequence[jax.Array]]


def gan_loss(
    predictions: Pred,
    target_is_real: bool,
    mode: str = "lsgan",
    for_dis: bool = False,
    real_label: float = 1.0,
    fake_label: float = 0.0,
) -> jax.Array:
    if not isinstance(predictions, (list, tuple)):
        predictions = [predictions]
    loss = jnp.asarray(0.0, jnp.float32)
    for pred in predictions:
        if mode == "lsgan":
            target = real_label if target_is_real else fake_label
            loss = loss + jnp.mean(jnp.square(pred - target))
        elif mode == "vanilla":
            target = real_label if target_is_real else fake_label
            t = jnp.full_like(pred, target)
            loss = loss + jnp.mean(
                jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
            )
        elif mode == "nsgan":
            target = real_label if target_is_real else fake_label
            p = jnp.clip(pred, 1e-7, 1 - 1e-7)
            loss = loss - jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
        elif mode == "hinge":
            if for_dis:
                p = -pred if target_is_real else pred
                loss = loss + jnp.mean(jnp.maximum(1.0 + p, 0.0))
            else:
                loss = loss + jnp.mean(-pred)
        elif mode == "wgangp":
            loss = loss + (-jnp.mean(pred) if target_is_real else jnp.mean(pred))
        elif mode == "dcgan":
            p = -pred if target_is_real else pred
            loss = loss + jnp.mean(jax.nn.softplus(p))
        else:
            raise NotImplementedError(f"gan mode {mode!r}")
    return loss
