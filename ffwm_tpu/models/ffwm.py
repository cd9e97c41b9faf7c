"""FFWM generator — encoder/decoder with Warp Attention Modules.

TPU-native rebuild of the reference FFWM (models/base_networks.py:274-347):
encoder e0..e3 (ch 64/64/128/256), PixelShuffle decoder d0..d2, and per-scale
Warp Attention Modules that (1) warp the encoder skip with the predicted
flow, (2) concatenate its horizontal flip (face symmetry prior), (3) gate it
with a learned sigmoid attention map; TP-GAN-style coarse-to-fine heads emit
sigmoid images at 32/64/128. Spectral norm everywhere (the live config is
``FFWM(sn=True)``, models/ffwm_model.py:27).

NHWC layout; flows are [B, H, W, 2] sampling grids in [-1, 1].
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ffwm_tpu.nn.blocks import ConvBlock, PixelShuffleBlock, ResidualBlock
from ffwm_tpu.ops.resize import upsample2x_bilinear
from ffwm_tpu.ops.warp import warp


class _AttSeq(nn.Module):
    """att{i}: ConvBlock + sigmoid ResidualBlock (children '0', '1')."""

    ch: int
    sn: bool

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBlock(self.ch, self.ch, 3, 1, 1, sn=self.sn, name="0")(x, train)
        return ResidualBlock(self.ch, self.ch, activ="sigmoid", sn=self.sn,
                             name="1")(x, train)


class _DResSeq(nn.Module):
    """dres{i}: two chained ResidualBlocks (children '0', '1')."""

    ch: int
    sn: bool

    @nn.compact
    def __call__(self, x, train: bool):
        x = ResidualBlock(self.ch, activ="lrelu", sn=self.sn, name="0")(x, train)
        return ResidualBlock(self.ch, activ="lrelu", sn=self.sn, name="1")(x, train)


class FFWM(nn.Module):
    """Flow-guided frontalizing generator.

    __call__(x, flows, train, return_att) with flows = (flow32, flow64,
    flow128) — note the reference passes [flow_F32, flow_F64, flow_F128]
    (models/ffwm_model.py:79). Returns (fake32, fake64, fake128[, att]).
    """

    num_layers: int = 3
    isflip: bool = True
    sn: bool = True

    @nn.compact
    def __call__(self, x, flows: Sequence, train: bool = False,
                 return_att: bool = False):
        channels = [64, 64, 128, 256]
        dechannels = [256, 128, 64, 64]
        dm = 3 if self.isflip else 2
        am = dm - 1
        sn = self.sn

        e0 = ConvBlock(3, channels[0], 7, 1, 3, res=1, bn=False, sn=sn, name="e0")(x, train)
        e1 = ConvBlock(channels[0], channels[1], 4, 2, 1, res=1, sn=sn, name="e1")(e0, train)
        e2 = ConvBlock(channels[1], channels[2], 4, 2, 1, res=1, sn=sn, name="e2")(e1, train)
        e3 = ConvBlock(channels[2], channels[3], 4, 2, 1, res=1, sn=sn, name="e3")(e2, train)

        decoders = [
            PixelShuffleBlock(dechannels[0], dechannels[1], sn=sn, name="d0"),
            PixelShuffleBlock(dechannels[1] * dm, dechannels[2], sn=sn, name="d1"),
            PixelShuffleBlock(dechannels[2] * dm + 3, dechannels[3], sn=sn, name="d2"),
        ]
        dres = [
            _DResSeq(dechannels[1] * dm, sn, name="dres0"),
            _DResSeq(dechannels[2] * dm + 3, sn, name="dres1"),
            _DResSeq(dechannels[3] * dm + 3, sn, name="dres2"),
        ]
        recs = [
            ConvBlock(dechannels[1] * dm, 3, 3, 1, 1, bn=False, activ="sigmoid",
                      sn=sn, name="rec0"),
            ConvBlock(dechannels[2] * dm + 3, 3, 3, 1, 1, bn=False, activ="sigmoid",
                      sn=sn, name="rec1"),
            ConvBlock(dechannels[3] * dm + 3, 3, 3, 1, 1, bn=False, activ="sigmoid",
                      sn=sn, name="rec2"),
        ]
        atts = [
            _AttSeq(channels[2] * am, sn, name="att0"),
            _AttSeq(channels[1] * am, sn, name="att1"),
            _AttSeq(channels[0] * am, sn, name="att2"),
        ]

        skips = [e3, e2, e1, e0]  # fencs reversed
        fdec = e3
        recons = []
        att = None
        for i in range(self.num_layers):
            dec = decoders[i](fdec, train)
            # Warp Attention Module: warp the encoder skip into frontal pose,
            # exploit facial symmetry via a horizontal flip, then gate.
            w = warp(skips[i + 1], flows[i])
            if self.isflip:
                skip = jnp.concatenate([w, jnp.flip(w, axis=2)], axis=-1)
            else:
                skip = w
            att = atts[i](skip, train)
            skip = skip * att
            if recons:
                res_in = jnp.concatenate(
                    [skip, dec, upsample2x_bilinear(recons[-1])], axis=-1)
            else:
                res_in = jnp.concatenate([skip, dec], axis=-1)
            fdec = dres[i](res_in, train)
            recons.append(recs[i](fdec, train))

        if return_att:
            return recons[-3], recons[-2], recons[-1], att
        return recons[-3], recons[-2], recons[-1]
