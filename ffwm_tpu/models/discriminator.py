"""Multi-scale discriminator (InGAN-style).

TPU-native rebuild of the reference MSDiscriminator
(models/base_networks.py:354-437): for a 128-px real crop,
``min(ceil(log2(128/16)), 9) = 3`` scale networks, each three
spectral-normed stride-2 3x3 convs (ch 64/128/256, BN + LeakyReLU 0.2) and a
1x1 linear head (no sigmoid in the live ``sigmoid=False`` lsgan config,
models/ffwm_model.py:28); scale i sees the input bilinearly downscaled by
2^-i and its map is upsampled back to the scale-0 map size and summed
(weights all 1).
"""

from __future__ import annotations

import math

from flax import linen as nn

from ffwm_tpu.nn.layers import BatchNorm2d, Conv2d, SNConv2d, leaky_relu
from ffwm_tpu.ops.resize import resize_bilinear


class _ScaleNet(nn.Module):
    """One scale: children named by torch Sequential index 0..9."""

    base_channels: int = 64
    sigmoid: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        bc = self.base_channels
        x = SNConv2d(bc, 3, 2, 1, name="0")(x, update_stats=train)
        x = BatchNorm2d(name="1")(x, use_running_average=not train)
        x = leaky_relu(x, 0.2)
        x = SNConv2d(bc * 2, 3, 2, 1, name="3")(x, update_stats=train)
        x = BatchNorm2d(name="4")(x, use_running_average=not train)
        x = leaky_relu(x, 0.2)
        x = SNConv2d(bc * 4, 3, 2, 1, name="6")(x, update_stats=train)
        x = BatchNorm2d(name="7")(x, use_running_average=not train)
        x = leaky_relu(x, 0.2)
        if self.sigmoid:
            x = SNConv2d(1, 1, 1, 0, name="9")(x, update_stats=train)
            return nn.sigmoid(x)
        return Conv2d(1, 1, 1, 0, name="9")(x)


class MSDiscriminator(nn.Module):
    real_crop_size: int = 128
    inc: int = 3
    max_n_scales: int = 9
    scale_factor: int = 2
    base_channels: int = 64
    sigmoid: bool = False
    min_size: int = 16

    @nn.compact
    def __call__(self, x, train: bool = True):
        n_scales = min(
            int(math.ceil(math.log(self.real_crop_size / self.min_size)
                          / math.log(self.scale_factor))),
            self.max_n_scales,
        )
        b, h, w, _ = x.shape
        out = None
        map_hw = None
        for i in range(n_scales):
            if i == 0:
                xi = x
            else:
                f = self.scale_factor ** (-i)
                xi = resize_bilinear(x, (int(h * f), int(w * f)))
            m = _ScaleNet(self.base_channels, self.sigmoid,
                          name=f"nets.{i}")(xi, train)
            if out is None:
                out = m
                map_hw = m.shape[1:3]
            else:
                out = out + resize_bilinear(m, map_hw)
        return out
