"""Differentiable image ops — the TPU-native core of ffwm_tpu.

Replaces the reference's CUDA extensions (cuda/{resample2d_package,
block_extractor,local_attn_reshape}) and torch functional ops
(grid_sample / interpolate / guided filter) with NHWC JAX implementations.
Pallas-fused variants of the hot paths live in ffwm_tpu.ops.kernels.
"""

from ffwm_tpu.ops.block_extractor import bilinear_sample_border, block_extractor
from ffwm_tpu.ops.filters import box_filter, fast_guided_filter, guided_filter
from ffwm_tpu.ops.local_attn_reshape import (
    local_attn_reshape,
    local_attn_reshape_inverse,
)
from ffwm_tpu.ops.resample2d import resample2d
from ffwm_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
)
from ffwm_tpu.ops.warp import (
    build_patch_grid,
    center_crop_grid,
    grid_sample,
    warp,
)

__all__ = [
    "bilinear_sample_border",
    "block_extractor",
    "box_filter",
    "build_patch_grid",
    "center_crop_grid",
    "fast_guided_filter",
    "grid_sample",
    "guided_filter",
    "local_attn_reshape",
    "local_attn_reshape_inverse",
    "resample2d",
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_bilinear",
    "warp",
]
