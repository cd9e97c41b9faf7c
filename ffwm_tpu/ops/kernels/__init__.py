"""Pallas TPU kernels for the hot warping ops.

Forward passes are fused Pallas kernels (per-batch-item source image
resident in VMEM, vectorized dynamic row gather, bilinear/Gaussian weighting
and reduction in registers — one HBM read of the source, one write of the
output). Backward passes are registered as custom VJPs that reuse the
verified XLA gather formulations (whose transposes are deterministic
segment-sum scatters — the TPU-native equivalent of the reference CUDA
kernels' atomicAdd backward, cuda/*/..._kernel.cu).
"""

from ffwm_tpu.ops.kernels.warp_pallas import grid_sample_pallas

__all__ = ["grid_sample_pallas"]
