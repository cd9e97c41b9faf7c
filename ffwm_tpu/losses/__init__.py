"""Loss library — functional, jit-composable rebuilds of models/losses.py."""

from ffwm_tpu.losses.affine import (
    affine_regularization_loss,
    multi_affine_regularization_loss,
)
from ffwm_tpu.losses.correctness import CORRECTNESS_LAYERS, correctness_loss
from ffwm_tpu.losses.gan import gan_loss
from ffwm_tpu.losses.identity import identity_loss, identity_loss_pair
from ffwm_tpu.losses.illumination import MSL1_WEIGHTS, illumination_loss
from ffwm_tpu.losses.landmark import (
    MULTISCALE_LD_WEIGHTS,
    landmark_loss,
    multiscale_landmark_loss,
)
from ffwm_tpu.losses.perceptual import (
    PERCEPTUAL_LAYERS,
    PERCEPTUAL_WEIGHTS,
    l1,
    perceptual_loss,
    perceptual_loss_grouped,
    style_loss,
    vgg_loss,
)

__all__ = [
    "CORRECTNESS_LAYERS",
    "MSL1_WEIGHTS",
    "MULTISCALE_LD_WEIGHTS",
    "PERCEPTUAL_LAYERS",
    "PERCEPTUAL_WEIGHTS",
    "affine_regularization_loss",
    "correctness_loss",
    "gan_loss",
    "identity_loss",
    "identity_loss_pair",
    "illumination_loss",
    "l1",
    "landmark_loss",
    "multi_affine_regularization_loss",
    "multiscale_landmark_loss",
    "perceptual_loss",
    "perceptual_loss_grouped",
    "style_loss",
    "vgg_loss",
]
