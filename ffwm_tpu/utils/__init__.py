"""Utilities: checkpoint conversion, metrics, visualization."""

from ffwm_tpu.utils.convert import (
    convert_state_dict,
    export_state_dict,
    load_pth,
    validate_converted,
)
from ffwm_tpu.utils.metrics import Rank1Meter, cosine_similarity
from ffwm_tpu.utils.visualizer import (
    Visualizer,
    save_image,
    tensor2att,
    tensor2flow,
    tensor2im,
    tensor2mask,
)

__all__ = [
    "Rank1Meter",
    "Visualizer",
    "convert_state_dict",
    "cosine_similarity",
    "export_state_dict",
    "load_pth",
    "save_image",
    "tensor2att",
    "tensor2flow",
    "tensor2im",
    "tensor2mask",
    "validate_converted",
]
