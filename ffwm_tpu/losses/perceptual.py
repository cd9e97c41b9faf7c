"""VGG19-based perceptual / style losses.

Rebuild of the reference PerceptualLoss / VGGLoss / StyleLoss
(models/losses.py:225-319). Losses are pure functions of a feature-extractor
callable ``feats(img) -> {layer: NHWC map}`` (build one with
``functools.partial(VGG19Features().apply, vgg_vars)``), so they compose
into jitted train steps.

The reference feeds raw [0,1] images into VGG with no ImageNet
normalization — preserved (see models/vgg.py docstring).
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp

FeatFn = Callable[[jax.Array], Dict[str, jax.Array]]

PERCEPTUAL_WEIGHTS = (1.0, 0.5, 0.25, 0.25, 0.125)
PERCEPTUAL_LAYERS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")
STYLE_LAYERS = ("relu2_2", "relu3_4", "relu4_4", "relu5_2")


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def perceptual_loss(
    feats: FeatFn,
    x: jax.Array,
    y: jax.Array,
    layers: Sequence[str] = PERCEPTUAL_LAYERS,
    weights: Sequence[float] = PERCEPTUAL_WEIGHTS,
) -> jax.Array:
    """Weighted L1 over VGG feature maps; the target branch is detached
    (reference: models/losses.py:312-319)."""
    fx = feats(x)
    fy = feats(y)
    loss = jnp.asarray(0.0, jnp.float32)
    for layer, w in zip(layers, weights):
        loss = loss + w * l1(fx[layer], jax.lax.stop_gradient(fy[layer]))
    return loss


def perceptual_loss_grouped(
    feats: FeatFn,
    xs: Sequence[jax.Array],
    ys: Sequence[jax.Array],
    group_weights: Sequence[float],
    layers: Sequence[str] = PERCEPTUAL_LAYERS,
    weights: Sequence[float] = PERCEPTUAL_WEIGHTS,
) -> jax.Array:
    """``sum_i group_weights[i] * perceptual_loss(xs[i], ys[i])`` for
    same-shaped pairs, with all generated crops batched through ONE VGG
    application and all detached targets through one more (the reference's
    facial-part loss runs 8 separate VGG forwards on 32x32 crops,
    models/ffwm_model.py:126-131 — tiny batches that underfill the MXU;
    VGG is frozen and batch-invariant so the values are unchanged)."""
    assert len(xs) == len(ys) == len(group_weights), \
        (len(xs), len(ys), len(group_weights))
    b = xs[0].shape[0]
    fx = feats(jnp.concatenate(list(xs), axis=0))
    fy = feats(jax.lax.stop_gradient(jnp.concatenate(list(ys), axis=0)))
    loss = jnp.asarray(0.0, jnp.float32)
    for layer, w in zip(layers, weights):
        ax = fx[layer]
        ay = jax.lax.stop_gradient(fy[layer])
        for i, gw in enumerate(group_weights):
            loss = loss + (gw * w) * l1(ax[i * b:(i + 1) * b],
                                        ay[i * b:(i + 1) * b])
    return loss


def _gram(x: jax.Array) -> jax.Array:
    """Gram matrix of an NHWC feature map: [B, C, C] / (H*W*C)."""
    b, h, w, c = x.shape
    f = x.reshape(b, h * w, c)
    g = jnp.einsum("bnc,bnd->bcd", f, f, preferred_element_type=jnp.float32)
    return g / (h * w * c)


def style_loss(feats: FeatFn, x: jax.Array, y: jax.Array) -> jax.Array:
    fx = feats(x)
    fy = feats(y)
    loss = jnp.asarray(0.0, jnp.float32)
    for layer in STYLE_LAYERS:
        loss = loss + l1(_gram(fx[layer]), _gram(fy[layer]))
    return loss


def vgg_loss(
    feats: FeatFn,
    x: jax.Array,
    y: jax.Array,
    content_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0, 1.0),
):
    """(content, style) pair — reference VGGLoss (models/losses.py:225-262)."""
    fx = feats(x)
    fy = feats(y)
    content = jnp.asarray(0.0, jnp.float32)
    for layer, w in zip(PERCEPTUAL_LAYERS, content_weights):
        content = content + w * l1(fx[layer], fy[layer])
    style = jnp.asarray(0.0, jnp.float32)
    for layer in STYLE_LAYERS:
        style = style + l1(_gram(fx[layer]), _gram(fy[layer]))
    return content, style
