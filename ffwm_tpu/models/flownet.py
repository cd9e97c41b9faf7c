"""FlowNet — dense correspondence-field ("flow") predictor.

TPU-native rebuild of the reference FlowNet
(models/base_networks.py:59-165, FlowNet2-style encoder/decoder): 7 conv
stages downsample 128 -> 2 px; the decoder alternates predict_flow (tanh
head), 4x4/s2 deconv of features, 4x4/s2 transposed-conv flow upsampling and
an ``inter_conv`` fusion, emitting absolute sampling grids in [-1, 1]
(channel 0 = x) at 128/64/32 resolution.

Flow layout here is NHWC: [B, H, W, 2].

The reference defines an occlusion branch (``inter_conv_occ*``,
base_networks.py:92-97) that is never called — dead weights that persist in
its checkpoints. We omit the dead parameters; the converter skips the
corresponding state_dict keys (see ffwm_tpu/utils/convert.py).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ffwm_tpu.nn.blocks import (
    ConvNormLRelu,
    DeconvNormLRelu,
    PredictFlow,
    UpsampleFlow,
)


class FlowNet(nn.Module):
    """Returns (flow128, flow64, flow32) sampling grids in [-1, 1]."""

    ngf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.ngf

        # Encoder: B*128*128*3 -> B*2*2*(16g)
        c0 = ConvNormLRelu(g, name="conv0")(x, train)                       # 128
        c1 = ConvNormLRelu(2 * g, name="conv1_1")(
            ConvNormLRelu(g, stride=2, name="conv1")(c0, train), train)     # 64
        c2 = ConvNormLRelu(2 * g, name="conv2_1")(
            ConvNormLRelu(2 * g, stride=2, name="conv2")(c1, train), train)  # 32
        c3 = ConvNormLRelu(4 * g, name="conv3_1")(
            ConvNormLRelu(4 * g, stride=2, name="conv3")(c2, train), train)  # 16
        c4 = ConvNormLRelu(8 * g, name="conv4_1")(
            ConvNormLRelu(8 * g, stride=2, name="conv4")(c3, train), train)  # 8
        c5 = ConvNormLRelu(8 * g, name="conv5_1")(
            ConvNormLRelu(8 * g, stride=2, name="conv5")(c4, train), train)  # 4
        c6 = ConvNormLRelu(16 * g, name="conv6_1")(
            ConvNormLRelu(16 * g, stride=2, name="conv6")(c5, train), train)  # 2

        # Decoder: coarse-to-fine flow refinement.
        flow6 = PredictFlow(name="predict_flow6")(c6)                        # 2

        flow6_up = UpsampleFlow(name="upsampled_flow6_to_5")(flow6)
        d5 = DeconvNormLRelu(8 * g, name="deconv5")(c6, train)
        cat5 = jnp.concatenate([c5, d5, flow6_up], -1)
        i5 = ConvNormLRelu(8 * g, name="inter_conv5")(cat5, train)
        flow5 = PredictFlow(name="predict_flow5")(i5)                        # 4

        flow5_up = UpsampleFlow(name="upsampled_flow5_to_4")(flow5)
        d4 = DeconvNormLRelu(4 * g, name="deconv4")(cat5, train)
        cat4 = jnp.concatenate([c4, d4, flow5_up], -1)
        i4 = ConvNormLRelu(4 * g, name="inter_conv4")(cat4, train)
        flow4 = PredictFlow(name="predict_flow4")(i4)                        # 8

        flow4_up = UpsampleFlow(name="upsampled_flow4_to_3")(flow4)
        d3 = DeconvNormLRelu(2 * g, name="deconv3")(cat4, train)
        cat3 = jnp.concatenate([c3, d3, flow4_up], -1)
        i3 = ConvNormLRelu(2 * g, name="inter_conv3")(cat3, train)
        flow3 = PredictFlow(name="predict_flow3")(i3)                        # 16

        # From here the encoder skips are dropped (reference :147-163).
        flow3_up = UpsampleFlow(name="upsampled_flow3_to_2")(flow3)
        d2 = DeconvNormLRelu(g, name="deconv2")(cat3, train)
        cat2 = jnp.concatenate([d2, flow3_up], -1)
        i2 = ConvNormLRelu(g, name="inter_conv2")(cat2, train)
        flow2 = PredictFlow(name="predict_flow2")(i2)                        # 32

        flow2_up = UpsampleFlow(name="upsampled_flow2_to_1")(flow2)
        d1 = DeconvNormLRelu(g // 2, name="deconv1")(cat2, train)
        cat1 = jnp.concatenate([d1, flow2_up], -1)
        i1 = ConvNormLRelu(g // 2, name="inter_conv1")(cat1, train)
        flow1 = PredictFlow(name="predict_flow1")(i1)                        # 64

        flow1_up = UpsampleFlow(name="upsampled_flow1_to_0")(flow1)
        d0 = DeconvNormLRelu(g // 4, name="deconv0")(cat1, train)
        cat0 = jnp.concatenate([d0, flow1_up], -1)
        i0 = ConvNormLRelu(g // 4, name="inter_conv0")(cat0, train)
        flow0 = PredictFlow(name="predict_flow0")(i0)                        # 128

        return flow0, flow1, flow2
