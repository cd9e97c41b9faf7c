"""Affine flow regularization.

Rebuild of (Multi)AffineRegularizationLoss (models/losses.py:163-223): for
every k x k window of the flow field, penalize deviation from a local affine
transform. The annihilator matrix ``K = (A(A^T A)^-1 A^T - I)`` projects a
window onto the non-affine subspace; the loss is the quadratic form
``w^T (K^T K) w`` per window, evaluated with a conv (K^T K as k^2 filters),
``local_attn_reshape``, and ``block_extractor`` at constant flow k//2 —
exactly the reference's kernel pipeline (:211-219).

Parity quirks preserved:
  * ``flow2grid`` maps [-1,1] -> [0,128] with a hard-coded 128 at *every*
    scale (:221-223),
  * per-scale kernel sizes {32: 3, 64: 5, 128: 7} via kz_dic {1:7, 2:5, 3:3}
    (models/flownet_model.py:31).
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.ops.local_attn_reshape import local_attn_reshape
from ffwm_tpu.nn.layers import avg_pool2d


@functools.lru_cache(maxsize=None)
def _affine_kernel(kz: int) -> np.ndarray:
    """K^T K as HWIO conv weights [kz, kz, 1, kz^2] (float64 host math)."""
    temp = np.arange(kz)
    a = np.ones([kz * kz, 3])
    a[:, 0] = temp.repeat(kz)
    a[:, 1] = temp.repeat(kz).reshape((kz, kz)).transpose().reshape(kz**2)
    ah = a.transpose()
    k = np.dot(a, np.dot(np.linalg.inv(np.dot(ah, a)), ah)) - np.identity(kz**2)
    ktk = np.dot(k.transpose(), k)  # [kz^2, kz^2]
    # row o of ktk is the kernel of output-channel o, reshaped (kz, kz):
    # OIHW (kz^2, 1, kz, kz) -> HWIO (kz, kz, 1, kz^2)
    oihw = ktk.reshape(kz * kz, 1, kz, kz)
    return np.transpose(oihw, (2, 3, 1, 0)).astype(np.float32)


def _static_blocks(grid_ch: jax.Array, kz: int, hp: int, wp: int) -> jax.Array:
    """block_extractor at its affine-reg operating point, statically.

    With the constant flow kz//2 the sampled position of output pixel
    (yf*k+i, xf*k+j) reduces to exactly (yf+i, xf+j) — integer, in-bounds
    (hp = H-kz+1) — so the flow-driven gather degenerates to kz^2 shifted
    slices (pure relayout; the dynamic-gather path costs ~19M serialized
    row fetches per flow-train step at 128 px). Equality with
    block_extractor is pinned by tests/test_losses.py.
    """
    b = grid_ch.shape[0]
    rows = []
    for i in range(kz):
        cols = [grid_ch[:, i:i + hp, j:j + wp, :] for j in range(kz)]
        rows.append(jnp.stack(cols, axis=3))                  # [B, hp, wp, kz, 1]
    blocks = jnp.stack(rows, axis=3)                          # [B, hp, wp, kz, kz, 1]
    blocks = blocks.transpose(0, 1, 3, 2, 4, 5)               # [B, hp, kz, wp, kz, 1]
    return blocks.reshape(b, hp * kz, wp * kz, 1)


def _single_scale(grid_ch: jax.Array, kz: int) -> jax.Array:
    """grid_ch: one coordinate channel [B, H, W, 1]."""
    weights = jnp.asarray(_affine_kernel(kz)).astype(grid_ch.dtype)
    results = jax.lax.conv_general_dilated(
        grid_ch, weights, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, h', w', kz^2]
    b, hp, wp, _ = results.shape
    kernels_new = local_attn_reshape(results, kz)            # [B, kz h', kz w', 1]
    grid_h = _static_blocks(grid_ch, kz, hp, wp)             # [B, kz h', kz w', 1]
    pooled = avg_pool2d(grid_h * kernels_new, kz, kz)        # [B, h', w', 1]
    return jnp.mean(pooled) * kz**2


def affine_regularization_loss(flow: jax.Array, kz: int, grid_scale: float = 128.0) -> jax.Array:
    """flow: [B, H, W, 2] sampling grid in [-1, 1]."""
    grid = (flow + 1.0) / 2.0 * grid_scale  # hard-coded 128 at all scales
    gx = grid[..., 0:1]
    gy = grid[..., 1:2]
    return _single_scale(gx, kz) + _single_scale(gy, kz)


def multi_affine_regularization_loss(
    flows: Sequence[jax.Array],
    kz_dic: Dict[int, int] = None,
) -> jax.Array:
    """flows coarsest-first ([fl32, fl64, fl128], models/flownet_model.py:68);
    kz per position from kz_dic keys sorted descending ({1:7,2:5,3:3} ->
    kz 3 for fl32, 5 for fl64, 7 for fl128)."""
    kz_dic = kz_dic or {1: 7, 2: 5, 3: 3}
    order = sorted(kz_dic, reverse=True)
    loss = jnp.asarray(0.0, jnp.float32)
    for i, flow in enumerate(flows):
        loss = loss + affine_regularization_loss(flow, kz_dic[order[i]])
    return loss
