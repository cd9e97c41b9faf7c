"""LightCNN — the frozen face recognizer for identity supervision and eval.

TPU-native rebuild of lightcnn/light_cnn.py: max-feature-map (mfm) units,
4 residual stages [1, 2, 3, 4], grayscale 1x128x128 input, returning
(logits, fc 256-d identity feature, 8x8x128 pool map). The 256-d fc feature
drives both the identity loss (models/losses.py:76-100) and Multi-PIE rank-1
evaluation (util/util.py:141-181). The 9-layer and 29-v2 variants are kept
for capability parity.

NHWC: input [B, 128, 128, 1]; pool output [B, 8, 8, 128] (the reference's
pool is NCHW [B, 128, 8, 8] — the identity loss is an L1 over all elements,
so layout doesn't matter; the converter's parity test transposes).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ffwm_tpu.nn.blocks import LCNNGroup, LCNNResBlock, MFMConv, MFMLinear
from ffwm_tpu.nn.layers import Linear, avg_pool2d, dropout, max_pool2d


class _ResStage(nn.Module):
    """Sequential of resblocks (children '0', '1', ...)."""

    channels: int
    num_blocks: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = LCNNResBlock(self.channels, name=str(i))(x)
        return x


class LightCNN29(nn.Module):
    """network_29layers(resblock, [1,2,3,4]) (light_cnn.py:82-129)."""

    num_classes: int = 79077
    layers: Sequence[int] = (1, 2, 3, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = MFMConv(48, 5, 1, 2, name="conv1")(x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)

        x = _ResStage(48, self.layers[0], name="block1")(x)
        x = LCNNGroup(96, 3, 1, 1, name="group1")(x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)

        x = _ResStage(96, self.layers[1], name="block2")(x)
        x = LCNNGroup(192, 3, 1, 1, name="group2")(x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)

        x = _ResStage(192, self.layers[2], name="block3")(x)
        x = LCNNGroup(128, 3, 1, 1, name="group3")(x)
        x = _ResStage(128, self.layers[3], name="block4")(x)
        x = LCNNGroup(128, 3, 1, 1, name="group4")(x)
        p = max_pool2d(x, 2, 2, ceil_mode=True)  # [B, 8, 8, 128]

        # torch flattens NCHW (C,H,W) C-order; transpose so converted fc
        # weights see the same element order.
        flat = jnp.transpose(p, (0, 3, 1, 2)).reshape(p.shape[0], -1)
        fc = MFMLinear(256, name="fc")(flat)
        fc_d = dropout(fc, 0.5, deterministic=not train,
                       rng=self.make_rng("dropout") if train else None)
        out = Linear(self.num_classes, name="fc2")(fc_d)
        return out, fc, p


class LightCNN9(nn.Module):
    """network_9layers (light_cnn.py:57-80). Children follow the torch
    Sequential: features.0 mfm, features.2/4/6/7 groups."""

    num_classes: int = 79077

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = _Features9(name="features")
        x = feats(x)
        flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        fc = MFMLinear(256, name="fc1")(flat)
        fc_d = dropout(fc, 0.5, deterministic=not train,
                       rng=self.make_rng("dropout") if train else None)
        out = Linear(self.num_classes, name="fc2")(fc_d)
        return out, fc


class _Features9(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = MFMConv(48, 5, 1, 2, name="0")(x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)
        x = LCNNGroup(96, 3, 1, 1, name="2")(x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)
        x = LCNNGroup(192, 3, 1, 1, name="4")(x)
        x = max_pool2d(x, 2, 2, ceil_mode=True)
        x = LCNNGroup(128, 3, 1, 1, name="6")(x)
        x = LCNNGroup(128, 3, 1, 1, name="7")(x)
        return max_pool2d(x, 2, 2, ceil_mode=True)


class LightCNN29v2(nn.Module):
    """network_29layers_v2 (light_cnn.py:131-174): max+avg pooling, plain
    Linear fc, bias-free classifier."""

    num_classes: int = 80013
    layers: Sequence[int] = (1, 2, 3, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pool = lambda v: max_pool2d(v, 2, 2) + avg_pool2d(v, 2)
        x = MFMConv(48, 5, 1, 2, name="conv1")(x)
        x = pool(x)
        x = _ResStage(48, self.layers[0], name="block1")(x)
        x = LCNNGroup(96, 3, 1, 1, name="group1")(x)
        x = pool(x)
        x = _ResStage(96, self.layers[1], name="block2")(x)
        x = LCNNGroup(192, 3, 1, 1, name="group2")(x)
        x = pool(x)
        x = _ResStage(192, self.layers[2], name="block3")(x)
        x = LCNNGroup(128, 3, 1, 1, name="group3")(x)
        x = _ResStage(128, self.layers[3], name="block4")(x)
        x = LCNNGroup(128, 3, 1, 1, name="group4")(x)
        p = pool(x)
        flat = jnp.transpose(p, (0, 3, 1, 2)).reshape(p.shape[0], -1)
        fc = Linear(256, name="fc")(flat)
        fc_d = dropout(fc, 0.5, deterministic=not train,
                       rng=self.make_rng("dropout") if train else None)
        out = Linear(self.num_classes, use_bias=False, name="fc2")(fc_d)
        return out, fc, p


def grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """Channel-mean grayscale — LightCNN input convention everywhere in the
    reference (models/ffwm_model.py:196, models/losses.py:91-93)."""
    return jnp.mean(img, axis=-1, keepdims=True)


def checkpoint_num_classes(lc_vars, what: str = "lightCNN") -> int:
    """Classifier-head width of a loaded LightCNN checkpoint.

    v2-style heads are bias-free (reference lightcnn/light_cnn.py:131-174 /
    LightCNN29v2 above), so fall back to the kernel's output dim. Raises a
    clear error naming the checkpoint when fc2 is missing entirely —
    otherwise the mismatch would surface only at apply time deep inside the
    jitted train step.
    """
    from collections.abc import Mapping

    import numpy as np

    fc2 = params = None
    if isinstance(lc_vars, Mapping):
        params = lc_vars.get("params")
        if isinstance(params, Mapping):
            fc2 = params.get("fc2")
    if not isinstance(fc2, Mapping):
        detail = (f"params keys: {sorted(params)[:8]}..."
                  if isinstance(params, Mapping)
                  else f"loaded object: {type(lc_vars).__name__}")
        raise ValueError(
            f"{what} checkpoint has no params/fc2 classifier head — is this "
            f"a LightCNN checkpoint? ({detail})")
    arr = fc2.get("bias", fc2.get("kernel"))
    if arr is None:
        raise ValueError(f"{what} checkpoint fc2 has neither bias nor kernel")
    return int(np.asarray(arr).shape[-1])
