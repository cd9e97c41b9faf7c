"""VGG19 feature extractor for perceptual losses.

TPU-native rebuild of the reference VGG19 wrapper (models/losses.py:398-519),
which splits torchvision's pretrained ``vgg19().features`` into relu taps.
Conv children are named by their torchvision ``features`` Sequential index
('0', '2', '5', ...) so a torchvision state_dict converts mechanically.

Note the reference feeds raw [0, 1] images with **no ImageNet
normalization** — a quirk preserved by doing the same (the loss only needs a
fixed feature embedding, not calibrated ImageNet scores).

Weights: torchvision's pretrained tensors must be supplied as a local file
(zero-egress environment); ffwm_tpu.utils.convert.convert_vgg19 accepts any
``vgg19`` state_dict. Random init (fixed seed) is used in tests.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ffwm_tpu.nn.layers import Conv2d, max_pool2d, relu

# torchvision vgg19.features conv indices and channel widths, with the relu
# tap name produced immediately after each conv.
_VGG19_CFG = [
    ("0", 64, "relu1_1"), ("2", 64, "relu1_2"), ("pool", 0, ""),
    ("5", 128, "relu2_1"), ("7", 128, "relu2_2"), ("pool", 0, ""),
    ("10", 256, "relu3_1"), ("12", 256, "relu3_2"), ("14", 256, "relu3_3"),
    ("16", 256, "relu3_4"), ("pool", 0, ""),
    ("19", 512, "relu4_1"), ("21", 512, "relu4_2"), ("23", 512, "relu4_3"),
    ("25", 512, "relu4_4"), ("pool", 0, ""),
    ("28", 512, "relu5_1"), ("30", 512, "relu5_2"), ("32", 512, "relu5_3"),
    ("34", 512, "relu5_4"),
]


class VGG19Features(nn.Module):
    """Returns a dict of relu1_1 ... relu5_4 feature maps (NHWC).

    ``max_layer`` truncates computation (e.g. 'relu4_1' for
    PerceptualCorrectness) to skip unused stages.
    """

    max_layer: str = "relu5_4"

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        out: Dict[str, jnp.ndarray] = {}
        for name, ch, tap in _VGG19_CFG:
            if name == "pool":
                x = max_pool2d(x, 2, 2)
                continue
            x = Conv2d(ch, 3, 1, 1, name=name)(x)
            x = relu(x)
            out[tap] = x
            if tap == self.max_layer:
                break
        return out


PERCEPTUAL_LAYERS: Sequence[str] = (
    "relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1",
)
