"""Pallas TPU kernels for the hot warping ops.

Forward passes are fused Pallas kernels (per-batch-item source image
resident in VMEM, vectorized dynamic row gather, bilinear/Gaussian weighting
and reduction in registers). Backward passes are registered as custom VJPs
that reuse the verified XLA gather formulations (whose transposes are
deterministic segment-sum scatters — the TPU-native equivalent of the
reference CUDA kernels' atomicAdd backward, cuda/*/..._kernel.cu).

Status: numerics (fwd + vjp) are pinned by tests in interpret mode. The
compiled Mosaic path is blocked on a current Mosaic limitation —
``tpu.dynamic_gather`` only addresses within a single vreg (8 sublanes /
128 lanes), so a global image gather ("Multiple source vregs along gather
dimension") does not lower yet. The production warp therefore uses the
single-2x2-patch ``lax.gather`` formulation in ffwm_tpu.ops.warp (measured
1.4x the naive 4-tap gather on v5e); these kernels become the fast path
when Mosaic grows cross-vreg gather support.
"""

from ffwm_tpu.ops.kernels.warp_pallas import grid_sample_pallas

__all__ = ["grid_sample_pallas"]
