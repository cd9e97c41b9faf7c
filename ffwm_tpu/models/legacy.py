"""Legacy pix2pix/CycleGAN network zoo — capability parity.

The reference inherits ResnetGenerator / UnetGenerator / NLayerDiscriminator
/ PixelDiscriminator and their define_G/define_D factories from the
pytorch-CycleGAN-and-pix2pix template (models/networks.py:36-583 — unused by
the FFWM models, but part of the framework surface). These are standard
public architectures (Johnson et al. resnet generator; pix2pix U-Net;
70x70 PatchGAN), rebuilt here NHWC for completeness.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ffwm_tpu.nn.layers import (
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    InstanceNorm2d,
    leaky_relu,
    relu,
)


def _norm(kind: str, name: str):
    if kind == "batch":
        return BatchNorm2d(name=name)
    if kind == "instance":
        return InstanceNorm2d(name=name)
    return None


def _apply_norm(norm, x, train):
    if norm is None:
        return x
    if isinstance(norm, BatchNorm2d):
        return norm(x, use_running_average=not train)
    return norm(x)


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _reflect_pad(x, 1)
        h = Conv2d(self.dim, 3, 1, 0, name="conv1")(h)
        h = _apply_norm(_norm(self.norm, "norm1"), h, train)
        h = relu(h)
        h = _reflect_pad(h, 1)
        h = Conv2d(self.dim, 3, 1, 0, name="conv2")(h)
        h = _apply_norm(_norm(self.norm, "norm2"), h, train)
        return x + h


class ResnetGenerator(nn.Module):
    output_nc: int = 3
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _reflect_pad(x, 3)
        h = Conv2d(self.ngf, 7, 1, 0, name="head")(h)
        h = _apply_norm(_norm(self.norm, "head_norm"), h, train)
        h = relu(h)
        for i in range(2):  # downsample
            mult = 2 ** i
            h = Conv2d(self.ngf * mult * 2, 3, 2, 1, name=f"down{i}")(h)
            h = _apply_norm(_norm(self.norm, f"down{i}_norm"), h, train)
            h = relu(h)
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * 4, self.norm, name=f"block{i}")(h, train)
        for i in range(2):  # upsample
            mult = 2 ** (2 - i)
            h = ConvTranspose2d(self.ngf * mult // 2, 3, 2, 1,
                                output_padding=1, name=f"up{i}")(h)
            h = _apply_norm(_norm(self.norm, f"up{i}_norm"), h, train)
            h = relu(h)
        h = _reflect_pad(h, 3)
        h = Conv2d(self.output_nc, 7, 1, 0, name="tail")(h)
        return jnp.tanh(h)


class _UnetLevel(nn.Module):
    outer_nc: int
    inner_nc: int
    submodule: Optional[nn.Module]
    outermost: bool = False
    innermost: bool = False
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = Conv2d(self.inner_nc, 4, 2, 1, name="down")(
            x if self.outermost else leaky_relu(x, 0.2))
        if not self.outermost and not self.innermost:
            d = _apply_norm(_norm(self.norm, "down_norm"), d, train)
        mid = d if self.innermost else self.submodule(d, train)
        u = ConvTranspose2d(self.outer_nc, 4, 2, 1, name="up")(relu(mid))
        if not self.outermost:
            u = _apply_norm(_norm(self.norm, "up_norm"), u, train)
            return jnp.concatenate([x, u], axis=-1)
        return jnp.tanh(u)


class UnetGenerator(nn.Module):
    output_nc: int = 3
    num_downs: int = 8
    ngf: int = 64
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = _UnetLevel(self.ngf * 8, self.ngf * 8, None, innermost=True,
                           norm=self.norm, name="inner")
        for i in range(self.num_downs - 5):
            block = _UnetLevel(self.ngf * 8, self.ngf * 8, block,
                               norm=self.norm, name=f"mid{i}")
        block = _UnetLevel(self.ngf * 4, self.ngf * 8, block, norm=self.norm,
                           name="up4")
        block = _UnetLevel(self.ngf * 2, self.ngf * 4, block, norm=self.norm,
                           name="up2")
        block = _UnetLevel(self.ngf, self.ngf * 2, block, norm=self.norm,
                           name="up1")
        block = _UnetLevel(self.output_nc, self.ngf, block, outermost=True,
                           norm=self.norm, name="outer")
        return block(x, train)


class NLayerDiscriminator(nn.Module):
    """70x70 PatchGAN."""

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = leaky_relu(Conv2d(self.ndf, 4, 2, 1, name="head")(x), 0.2)
        mult = 1
        for i in range(1, self.n_layers):
            mult = min(2 ** i, 8)
            h = Conv2d(self.ndf * mult, 4, 2, 1, name=f"layer{i}")(h)
            h = _apply_norm(_norm(self.norm, f"norm{i}"), h, train)
            h = leaky_relu(h, 0.2)
        mult = min(2 ** self.n_layers, 8)
        h = Conv2d(self.ndf * mult, 4, 1, 1, name="pre")(h)
        h = _apply_norm(_norm(self.norm, "pre_norm"), h, train)
        h = leaky_relu(h, 0.2)
        return Conv2d(1, 4, 1, 1, name="tail")(h)


class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN."""

    ndf: int = 64
    norm: str = "batch"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = leaky_relu(Conv2d(self.ndf, 1, 1, 0, name="c0")(x), 0.2)
        h = Conv2d(self.ndf * 2, 1, 1, 0, name="c1")(h)
        h = _apply_norm(_norm(self.norm, "n1"), h, train)
        h = leaky_relu(h, 0.2)
        return Conv2d(1, 1, 1, 0, name="c2")(h)


def define_g(arch: str = "resnet_9blocks", output_nc: int = 3, ngf: int = 64,
             norm: str = "instance") -> nn.Module:
    if arch == "resnet_9blocks":
        return ResnetGenerator(output_nc, ngf, 9, norm)
    if arch == "resnet_6blocks":
        return ResnetGenerator(output_nc, ngf, 6, norm)
    if arch == "unet_256":
        return UnetGenerator(output_nc, 8, ngf, norm)
    if arch == "unet_128":
        return UnetGenerator(output_nc, 7, ngf, norm)
    raise NotImplementedError(arch)


def define_d(arch: str = "basic", ndf: int = 64, n_layers: int = 3,
             norm: str = "batch") -> nn.Module:
    if arch == "basic":
        return NLayerDiscriminator(ndf, 3, norm)
    if arch == "n_layers":
        return NLayerDiscriminator(ndf, n_layers, norm)
    if arch == "pixel":
        return PixelDiscriminator(ndf, norm)
    raise NotImplementedError(arch)
