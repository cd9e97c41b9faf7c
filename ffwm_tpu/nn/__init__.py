"""Torch-semantics NHWC layer library for TPU."""

from ffwm_tpu.nn.blocks import (
    ConvBlock,
    ConvNormLRelu,
    DeconvNormLRelu,
    LCNNGroup,
    LCNNResBlock,
    MFMConv,
    MFMLinear,
    PixelShuffleBlock,
    PredictFlow,
    ResidualBlock,
    UpsampleFlow,
)
from ffwm_tpu.nn.layers import (
    ACTIVATIONS,
    BatchNorm2d,
    Conv2d,
    ConvTranspose2d,
    InstanceNorm2d,
    Linear,
    SNConv2d,
    SpectralNorm,
    avg_pool2d,
    dropout,
    get_activ,
    kaiming_normal_msra,
    kaiming_uniform_torch,
    leaky_relu,
    max_pool2d,
    pixel_shuffle,
    relu,
    sigmoid,
    tanh,
    tanh2,
)

__all__ = [
    "ACTIVATIONS", "BatchNorm2d", "Conv2d", "ConvBlock", "ConvNormLRelu",
    "ConvTranspose2d", "DeconvNormLRelu", "InstanceNorm2d", "LCNNGroup",
    "LCNNResBlock", "Linear", "MFMConv", "MFMLinear", "PixelShuffleBlock",
    "PredictFlow", "ResidualBlock", "SNConv2d", "SpectralNorm", "UpsampleFlow",
    "avg_pool2d", "dropout", "get_activ", "kaiming_normal_msra",
    "kaiming_uniform_torch", "leaky_relu", "max_pool2d", "pixel_shuffle",
    "relu", "sigmoid", "tanh", "tanh2",
]
