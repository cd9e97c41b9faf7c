"""Box filter and guided filter — the illumination-transfer ops.

The FFWM model guided-filters each generated frontal image with the ground
truth to transfer GT illumination before computing reconstruction losses
(radii 32/16/8 at scales 128/64/32 — reference: models/ffwm_model.py:57-59).

The box filter uses the cumulative-sum + index-difference formulation
(reference: models/external_function.py:164-195), which is a perfect fit for
TPU: two cumsums and a few static slices, all fused by XLA — no convolution
needed. NHWC layout: spatial axes are 1 (H) and 2 (W).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, r: int) -> np.ndarray:
    """[n, n] 0/1 matrix with band |i-j| <= r: box-sum as a matmul."""
    idx = np.arange(n)
    return (np.abs(idx[:, None] - idx[None, :]) <= r).astype(np.float32)


def _box_filter_matmul(x: jax.Array, r: int) -> jax.Array:
    """Box sum as two banded matmuls — MXU-native formulation.

    ``out = L_H @ x @ L_W^T`` with L the 0/1 band matrix; identical to the
    cumsum+diff formulation (truncated windows at edges) but runs on the
    systolic array instead of serial scans, and avoids the cumsum's
    large-number cancellation in fp32.
    """
    b, h, w, c = x.shape
    lh = jnp.asarray(_band_matrix(h, r))
    lw = jnp.asarray(_band_matrix(w, r))
    y = jnp.einsum("ip,bpwc->biwc", lh, x, preferred_element_type=jnp.float32)
    return jnp.einsum("bhqc,qj->bhjc", y, lw, preferred_element_type=jnp.float32)


def _diff(cs: jax.Array, r: int, axis: int) -> jax.Array:
    """Windowed sums from an inclusive cumsum along ``axis`` (radius r)."""
    n = cs.shape[axis]
    take = lambda lo, hi: jax.lax.slice_in_dim(cs, lo, hi, axis=axis)
    left = take(r, 2 * r + 1)
    middle = take(2 * r + 1, n) - take(0, n - 2 * r - 1)
    right = take(n - 1, n) - take(n - 2 * r - 1, n - r - 1)
    return jnp.concatenate([left, middle, right], axis=axis)


@functools.partial(jax.jit, static_argnames=("r", "method"))
def box_filter(x: jax.Array, r: int, method: str = "matmul") -> jax.Array:
    """Sliding-window *sum* over a (2r+1)^2 box with edge-truncated windows.

    [B,H,W,C] -> [B,H,W,C]. Same semantics as the reference BoxFilter
    (models/external_function.py:186-195). method='matmul' (default) uses
    the MXU band-matrix formulation; 'cumsum' is the reference's
    cumsum+index-difference (kept as oracle / for very large images).
    """
    assert x.ndim == 4, "box_filter expects NHWC"
    if method == "matmul":
        return _box_filter_matmul(x, r)
    return _diff(_diff(jnp.cumsum(x, axis=1), r, axis=1).cumsum(axis=2), r, axis=2)


@functools.partial(jax.jit, static_argnames=("r", "eps"))
def guided_filter(x: jax.Array, y: jax.Array, r: int, eps: float = 1e-8) -> jax.Array:
    """Edge-preserving transfer of ``y``'s low-frequency content onto ``x``.

    x: guidance/input [B,H,W,C] (the generated image), y: target [B,H,W,C]
    (the ground-truth frontal). Returns A*x + b with A = cov/(var+eps)
    box-smoothed. Matches reference GuidedFilter
    (models/external_function.py:239-277).
    """
    b_, h, w, _ = x.shape
    assert h > 2 * r + 1 and w > 2 * r + 1, f"guided_filter radius {r} too large for {h}x{w}"
    n = box_filter(jnp.ones((1, h, w, 1), x.dtype), r)
    mean_x = box_filter(x, r) / n
    mean_y = box_filter(y, r) / n
    cov_xy = box_filter(x * y, r) / n - mean_x * mean_y
    var_x = box_filter(x * x, r) / n - mean_x * mean_x
    a = cov_xy / (var_x + eps)
    b = mean_y - a * mean_x
    mean_a = box_filter(a, r) / n
    mean_b = box_filter(b, r) / n
    return mean_a * x + mean_b


@functools.partial(jax.jit, static_argnames=("r", "eps"))
def fast_guided_filter(
    lr_x: jax.Array, lr_y: jax.Array, hr_x: jax.Array, r: int, eps: float = 1e-8
) -> jax.Array:
    """Low-res A/b estimation + align_corners=True bilinear upsample.

    Capability parity with the reference FastGuidedFilter
    (models/external_function.py:197-237); unused on the default path.
    """
    from ffwm_tpu.ops.resize import resize_bilinear

    _, h, w, _ = lr_x.shape
    _, hh, hw, _ = hr_x.shape
    n = box_filter(jnp.ones((1, h, w, 1), lr_x.dtype), r)
    mean_x = box_filter(lr_x, r) / n
    mean_y = box_filter(lr_y, r) / n
    cov_xy = box_filter(lr_x * lr_y, r) / n - mean_x * mean_y
    var_x = box_filter(lr_x * lr_x, r) / n - mean_x * mean_x
    a = cov_xy / (var_x + eps)
    b = mean_y - a * mean_x
    mean_a = resize_bilinear(a, (hh, hw), align_corners=True)
    mean_b = resize_bilinear(b, (hh, hw), align_corners=True)
    return mean_a * hr_x + mean_b
