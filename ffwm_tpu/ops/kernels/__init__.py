"""Pallas TPU kernels for the hot warping ops.

Production status (measured on v5e, tools/pallas_tpu_probe.py):

* ``warp_vmem_pallas.grid_sample_vmem`` — **compiled Mosaic kernel, shipped**:
  the TPU forward for every full-raster warp via ``ffwm_tpu.ops.warp``
  (WAM feature warps, image warps). HBM -> VMEM DMA of the source once per
  batch item + a hardware loop of scalar-addressed 2-row patch copies.
  2.1x XLA's gather at 128^2 x 64ch (0.277 vs 0.582 ms/img fp32), exact
  fp32 parity (1.2e-7). Backward = custom VJP onto the verified XLA
  formulations (deterministic matmul image-adjoint — the TPU-native
  equivalent of the reference CUDA kernels' atomicAdd scatters,
  cuda/*/..._kernel.cu).

* ``warp_vmem_pallas.resample2d_vmem`` / ``block_extractor_vmem`` —
  compiled Mosaic versions of the two CUDA extensions, on the same
  window-dump machinery (the live configs' taps form one contiguous
  window; border clamping folds into per-axis one-hot cell weights).
  These ops are off FFWM's default training path (resample2d: reference
  losses.py:332 defaults to bilinear sampling; the affine regularizer
  uses a static-slice rewrite instead of block_extractor), so the
  compiled kernels are capability/perf surface, benchmarked by
  tools/pallas_tpu_probe.py.

* ``warp_pallas`` / ``resample2d_pallas`` / ``block_extractor_pallas`` —
  vectorized-gather formulations, **interpret-mode only**: their
  whole-image ``tpu.dynamic_gather`` cannot lower ("Multiple source vregs
  along gather dimension" — Mosaic's gather addresses within a single
  vreg). Kept as numerics oracles (tests pin fwd+vjp in interpret mode)
  and as the fast path if Mosaic grows cross-vreg gather support.
"""

from ffwm_tpu.ops.kernels.warp_pallas import grid_sample_pallas
from ffwm_tpu.ops.kernels.warp_vmem_pallas import (
    block_extractor_vmem,
    grid_sample_vmem,
    resample2d_vmem,
)

__all__ = ["block_extractor_vmem", "grid_sample_pallas", "grid_sample_vmem",
           "resample2d_vmem"]
