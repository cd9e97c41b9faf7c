"""Network zoo: FlowNet, FFWM generator, MSDiscriminator, LightCNN, VGG19."""

from ffwm_tpu.models.discriminator import MSDiscriminator
from ffwm_tpu.models.ffwm import FFWM
from ffwm_tpu.models.flownet import FlowNet
from ffwm_tpu.models.lightcnn import (
    LightCNN9,
    LightCNN29,
    LightCNN29v2,
    grayscale,
)
from ffwm_tpu.models.vgg import PERCEPTUAL_LAYERS, VGG19Features

__all__ = [
    "FFWM",
    "FlowNet",
    "LightCNN9",
    "LightCNN29",
    "LightCNN29v2",
    "MSDiscriminator",
    "PERCEPTUAL_LAYERS",
    "VGG19Features",
    "grayscale",
]
