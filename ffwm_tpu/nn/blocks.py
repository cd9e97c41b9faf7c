"""Composite blocks for FlowNet / FFWM / LightCNN.

Child-module names mirror the torch module paths of the reference
(models/base_networks.py, lightcnn/light_cnn.py) so the checkpoint converter
(ffwm_tpu.utils.convert) can map state_dict keys to param-tree paths
mechanically: torch key ``e1.0.weight`` <-> params["e1"]["0"]["kernel"].

All composite blocks follow the convention ``__call__(x, train)``:
``train=True`` uses batch statistics and runs spectral-norm power iteration
(the reference keeps G/D/flownets in train mode and warpNet/lightCNN/VGG in
eval — models/ffwm_model.py:24-25, models/base_model.py:116-129).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ffwm_tpu.nn.layers import (
    BatchNorm2d,
    InstanceNorm2d,
    Conv2d,
    ConvTranspose2d,
    Linear,
    SNConv2d,
    get_activ,
    kaiming_normal_msra,
    leaky_relu,
    pixel_shuffle,
)


def _apply(module: Any, x, train: bool):
    """Dispatch train-dependent kwargs to heterogeneous children."""
    if isinstance(module, BatchNorm2d):
        return module(x, use_running_average=not train)
    if isinstance(module, SNConv2d):
        return module(x, update_stats=train)
    if isinstance(module, (ResidualBlock, ConvBlock, PixelShuffleBlock)):
        return module(x, train)
    if isinstance(module, nn.Module):
        return module(x)
    return module(x)  # plain activation callable


def _conv(sn: bool, features, ks, stride, pad, name, **kw):
    cls = SNConv2d if sn else Conv2d
    return cls(features, ks, stride, pad, name=name, **kw)


# --------------------------------------------------------------------------
# FlowNet building blocks (reference: models/base_networks.py:30-57)
# --------------------------------------------------------------------------

class ConvNormLRelu(nn.Module):
    """conv()/i_conv(): Conv -> BatchNorm -> LeakyReLU(0.2). Children '0','1'."""

    features: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv2d(
            self.features, self.kernel_size, self.stride,
            (self.kernel_size - 1) // 2,
            kernel_init=kaiming_normal_msra, bias_init=nn.initializers.zeros,
            name="0",
        )(x)
        x = BatchNorm2d(name="1")(x, use_running_average=not train)
        return leaky_relu(x, 0.2)


class DeconvNormLRelu(nn.Module):
    """deconv(): ConvTranspose(4, s2, p1) -> BatchNorm -> LeakyReLU(0.2)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvTranspose2d(
            self.features, 4, 2, 1,
            kernel_init=kaiming_normal_msra, bias_init=nn.initializers.zeros,
            name="0",
        )(x)
        x = BatchNorm2d(name="1")(x, use_running_average=not train)
        return leaky_relu(x, 0.2)


class PredictFlow(nn.Module):
    """predict_flow(): Conv(2ch, 3x3) -> tanh. Flow is an absolute sampling
    grid in [-1, 1] (parity checklist, SURVEY.md §8). Child '0'."""

    @nn.compact
    def __call__(self, x):
        x = Conv2d(2, 3, 1, 1, kernel_init=kaiming_normal_msra,
                   bias_init=nn.initializers.zeros, name="0")(x)
        return jnp.tanh(x)


class UpsampleFlow(nn.Module):
    """upsampled_flow_*: bare ConvTranspose2d(2, 2, 4, 2, 1)."""

    @nn.compact
    def __call__(self, x):
        return ConvTranspose2d(2, 4, 2, 1, kernel_init=kaiming_normal_msra,
                               bias_init=nn.initializers.zeros, name="conv")(x)


# --------------------------------------------------------------------------
# FFWM generator blocks (reference: models/base_networks.py:208-312)
# --------------------------------------------------------------------------

_NORMS = {"bn": BatchNorm2d, "in": InstanceNorm2d}


def get_norm(name: str):
    """The reference's norm registry (models/base_networks.py:200-206):
    'bn' -> BatchNorm2d, 'in' -> InstanceNorm2d, anything else raises.
    Both classes share the (x, use_running_average=...) call signature."""
    try:
        return _NORMS[name]
    except KeyError:
        raise NotImplementedError(f"Normalization {name} not implemented")


class _InnerSeq(nn.Module):
    """ResidualBlock.blocks: conv/bn/lrelu/conv/bn with torch indices."""

    outc: int
    kernel: int
    norm: str
    sn: bool

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        norm = get_norm(self.norm)
        x = _apply(_conv(self.sn, self.outc, self.kernel, 1, pad, "0"), x, train)
        x = norm(name="1")(x, use_running_average=not train)
        x = leaky_relu(x, 0.2)
        x = _apply(_conv(self.sn, self.outc, self.kernel, 1, pad, "3"), x, train)
        x = norm(name="4")(x, use_running_average=not train)
        return x


class ResidualBlock(nn.Module):
    """activ(blocks(x) + input(x)) — reference ResidualBlock (:208-233).

    Children: 'input' (1x1 conv), 'blocks' (inner sequential).
    Note: the reference's sn=False branch uses padding=kernel (a bug that
    breaks shape compatibility); since every live config uses sn=True or
    kernel//2 padding we implement the working geometry for both.
    """

    inc: int
    outc: Optional[int] = None
    kernel: int = 3
    stride: int = 1
    activ: str = "lrelu"
    norm: str = "bn"
    sn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        outc = self.outc if self.outc is not None else self.inc // self.stride
        inp = _conv(self.sn, outc, 1, 1, 0, "input")
        skip = inp(x, train) if self.sn else inp(x)
        body = _InnerSeq(outc, self.kernel, self.norm, self.sn, name="blocks")(x, train)
        return get_activ(self.activ)(body + skip)


class ConvBlock(nn.Module):
    """conv [+ bn] [+ activ] [+ res x ResidualBlock] — reference ConvBlock
    (:235-246). Children named by torch Sequential index."""

    inc: int
    outc: int
    ks: int = 3
    s: int = 1
    p: int = 0
    activ: Optional[str] = "lrelu"
    norm: str = "bn"
    res: int = 0
    resk: int = 3
    bn: bool = True
    sn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        idx = 0
        conv = _conv(self.sn, self.outc, self.ks, self.s, self.p, str(idx))
        x = conv(x, train) if self.sn else conv(x)
        idx += 1
        if self.bn:
            x = get_norm(self.norm)(name=str(idx))(
                x, use_running_average=not train)
            idx += 1
        if self.activ is not None:
            x = get_activ(self.activ)(x)
            idx += 1
        for _ in range(self.res):
            x = ResidualBlock(self.outc, activ=self.activ, kernel=self.resk,
                              norm=self.norm, sn=self.sn, name=str(idx))(x, train)
            idx += 1
        return x


class DeConvBlock(nn.Module):
    """ConvTranspose [+ bn] [+ activ] [+ res] — reference DeConvBlock
    (:248-259). Capability surface; the live generator upsamples with
    PixelShuffleBlock instead."""

    inc: int
    outc: int
    ks: int = 3
    s: int = 1
    p: int = 0
    op: int = 0
    activ: Optional[str] = "relu"
    norm: str = "bn"
    res: int = 0
    resk: int = 3
    bn: bool = True
    sn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvTranspose2d(self.outc, self.ks, self.s, self.p,
                            output_padding=self.op, name="0")(x)
        idx = 1
        if self.bn:
            x = get_norm(self.norm)(name=str(idx))(
                x, use_running_average=not train)
            idx += 1
        if self.activ is not None:
            x = get_activ(self.activ)(x)
            idx += 1
        for _ in range(self.res):
            x = ResidualBlock(self.outc, activ=self.activ, norm=self.norm,
                              kernel=self.resk, sn=self.sn,
                              name=str(idx))(x, train)
            idx += 1
        return x


class PixelShuffleBlock(nn.Module):
    """Conv(outc*4, 3x3) -> PixelShuffle(2) [+ bn] [+ activ] [+ res] —
    reference PixelSuffleBlock (:261-272). The ks/s/p constructor args of the
    reference are ignored by its own implementation (conv is hard-coded
    3,1,1) — preserved here."""

    inc: int
    outc: int
    activ: Optional[str] = "lrelu"
    norm: str = "bn"
    res: int = 0
    bn: bool = True
    sn: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        conv = _conv(self.sn, self.outc * 4, 3, 1, 1, "0")
        x = conv(x, train) if self.sn else conv(x)
        x = pixel_shuffle(x, 2)
        idx = 2
        if self.bn:
            x = get_norm(self.norm)(name=str(idx))(
                x, use_running_average=not train)
            idx += 1
        if self.activ is not None:
            x = get_activ(self.activ)(x)
            idx += 1
        for _ in range(self.res):
            x = ResidualBlock(self.outc, activ=self.activ, norm=self.norm,
                              sn=self.sn, name=str(idx))(x, train)
            idx += 1
        return x


# --------------------------------------------------------------------------
# LightCNN primitives (reference: lightcnn/light_cnn.py:13-54)
# --------------------------------------------------------------------------

class MFMConv(nn.Module):
    """Max-Feature-Map conv: Conv(2*out) -> max of channel halves."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv2d(2 * self.out_channels, self.kernel_size, self.stride,
                   self.padding, name="filter")(x)
        a, b = jnp.split(x, 2, axis=-1)
        return jnp.maximum(a, b)


class MFMLinear(nn.Module):
    """Max-Feature-Map linear (mfm type=0)."""

    out_features: int

    @nn.compact
    def __call__(self, x):
        x = Linear(2 * self.out_features, name="filter")(x)
        a, b = jnp.split(x, 2, axis=-1)
        return jnp.maximum(a, b)


class LCNNGroup(nn.Module):
    """group(): 1x1 mfm ('conv_a') -> kxk mfm ('conv')."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        mid = x.shape[-1]
        x = MFMConv(mid, 1, 1, 0, name="conv_a")(x)
        return MFMConv(self.out_channels, self.kernel_size, self.stride,
                       self.padding, name="conv")(x)


class LCNNResBlock(nn.Module):
    """resblock(): x + mfm(mfm(x)). Children 'conv1', 'conv2'."""

    channels: int

    @nn.compact
    def __call__(self, x):
        out = MFMConv(self.channels, 3, 1, 1, name="conv1")(x)
        out = MFMConv(self.channels, 3, 1, 1, name="conv2")(out)
        return out + x
