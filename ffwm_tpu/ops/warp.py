"""Differentiable bilinear warping (grid sampling) — NHWC, TPU-native.

This is the hot op of the whole framework: the reference uses
``F.grid_sample(images, grid, mode='bilinear')`` (PyTorch 1.5 defaults:
``padding_mode='zeros'``, ``align_corners=False``) for

  * warping profile pixels/features to the frontal pose with the predicted
    flow (reference: models/base_networks.py:168-173, WarpNet),
  * cropping landmark-centered facial-part patches
    (reference: models/ffwm_model.py:217-246),
  * the center-crop grid of the identity loss
    (reference: models/losses.py:102-112).

Semantics match torch exactly:
  * grids are absolute sampling positions in [-1, 1]; channel 0 is x
    (width), channel 1 is y (height),
  * ``align_corners=False``: ``x_pix = ((x + 1) * W - 1) / 2`` — i.e. -1/+1
    map to the *edges* of the corner pixels,
  * zeros padding: out-of-bounds taps contribute 0 (each of the 4 bilinear
    taps is masked independently),
  * the VJP w.r.t. the image is the transposed (scatter-add) gather; the VJP
    w.r.t. the grid is the analytic derivative of the bilinear weights. Both
    come from JAX autodiff of this formulation and are deterministic on TPU.

Layout note: unlike the torch reference (NCHW images, [B,2,H,W] flows), this
framework is NHWC-native: images are [B,H,W,C], grids/flows are [B,H,W,2].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map [-1, 1] grid coordinates to pixel coordinates (torch convention)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(flat_img: jax.Array, ix: jax.Array, iy: jax.Array, w: int) -> jax.Array:
    """Gather pixels at integer coords from [B, H*W, C] image.

    ix/iy: [B, N] int32 (already clamped in-bounds). Returns [B, N, C].
    """
    lin = iy * w + ix
    return jnp.take_along_axis(flat_img, lin[..., None], axis=1)


def _axis_weights(t0: jax.Array, s: jax.Array, frac: jax.Array, size: int,
                  dtype) -> tuple[jax.Array, jax.Array]:
    """Weights for the two slots of a CLIP-adjusted 2-wide window.

    The desired taps sit at t0, t0+1 with weights (1-frac, frac), each
    zeroed when out of [0, size-1]; the gathered window starts at
    s = clip(t0, 0, size-2). Shifting d = t0 - s redistributes the weights
    onto the window slots (|d| > 1 means both taps are out of bounds).
    """
    d = t0 - s
    v0 = ((t0 >= 0) & (t0 <= size - 1)).astype(dtype)
    v1 = ((t0 + 1 >= 0) & (t0 + 1 <= size - 1)).astype(dtype)
    frac = frac.astype(dtype)
    w_tap0 = (1.0 - frac) * v0
    w_tap1 = frac * v1
    slot0 = jnp.where(d == 0, w_tap0, jnp.where(d == -1, w_tap1, 0.0))
    slot1 = jnp.where(d == 0, w_tap1, jnp.where(d == 1, w_tap0, 0.0))
    return slot0, slot1


def _grid_sample_patch(image: jax.Array, grid: jax.Array,
                       align_corners: bool) -> jax.Array:
    """Bilinear grid sample via ONE 2x2xC-patch gather per output pixel.

    TPU: gathers are serialization-bound per *index*; fetching the 4 taps as
    a single 2x2 patch slice quarters the index count vs 4 row gathers
    (~3x measured on v5e). lax.gather CLIP mode keeps patch starts in
    bounds; the weight shift above preserves exact zeros-padding semantics.
    """
    b, h, w, c = image.shape
    _, hg, wg, two = grid.shape
    ix = _unnormalize(grid[..., 0].reshape(b, -1), w, align_corners)
    iy = _unnormalize(grid[..., 1].reshape(b, -1), h, align_corners)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sx = jnp.clip(x0i, 0, w - 2)
    sy = jnp.clip(y0i, 0, h - 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    starts = jnp.stack([sy, sx], axis=-1)  # [B, P, 2]
    patches = jax.lax.gather(
        image, starts, dnums, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # [B, P, 2, 2, C]

    dt = image.dtype
    wy0, wy1 = _axis_weights(y0i, sy, iy - y0, h, dt)
    wx0, wx1 = _axis_weights(x0i, sx, ix - x0, w, dt)
    out = (
        patches[:, :, 0, 0] * (wy0 * wx0)[..., None]
        + patches[:, :, 0, 1] * (wy0 * wx1)[..., None]
        + patches[:, :, 1, 0] * (wy1 * wx0)[..., None]
        + patches[:, :, 1, 1] * (wy1 * wx1)[..., None]
    )
    return out.reshape(b, hg, wg, c)


def _image_adjoint_matmul(g: jax.Array, grid: jax.Array, h: int, w: int,
                          align_corners: bool, chunk: int = 2048) -> jax.Array:
    """d(warp)/d(image)^T applied to cotangent ``g`` — as MXU matmuls.

    The exact adjoint is dimg[y,x,c] = sum_p Wy[p,y] Wx[p,x] g[p,c] with the
    2-tap one-hot row matrices Wy/Wx (built by iota comparison — out-of-range
    taps simply never match, giving zeros padding for free). Evaluated as a
    lax.scan over pixel chunks: Gx = Wx (x) g, then Wy^T @ Gx. A scatter-add
    would be serialized per index on TPU (~1.3 s/step in the GAN trainer);
    this runs on the systolic array instead.
    """
    b, hg, wg, c = g.shape
    p = hg * wg
    ix = _unnormalize(grid[..., 0].reshape(b, p), w, align_corners)
    iy = _unnormalize(grid[..., 1].reshape(b, p), h, align_corners)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(g.dtype)
    wy = (iy - y0).astype(g.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    gf = g.reshape(b, p, c)

    chunk = min(chunk, p)
    pad = (-p) % chunk
    if pad:
        zpad = lambda a, fill: jnp.concatenate(
            [a, jnp.full((b, pad) + a.shape[2:], fill, a.dtype)], axis=1)
        x0i, y0i = zpad(x0i, -10), zpad(y0i, -10)  # never matches iota
        wx, wy = zpad(wx, 0), zpad(wy, 0)
        gf = zpad(gf, 0)
    n_chunks = (p + pad) // chunk

    resh = lambda a: a.reshape(b, n_chunks, chunk, *a.shape[2:]).swapaxes(0, 1)
    xs = (resh(x0i), resh(y0i), resh(wx), resh(wy), resh(gf))

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (chunk, w), 1)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (chunk, h), 1)

    def body(acc, inp):
        x0c, y0c, wxc, wyc, gc = inp  # [B, chunk(, C)]
        wx_mat = ((iota_w[None] == x0c[:, :, None]).astype(g.dtype)
                  * (1 - wxc)[:, :, None]
                  + (iota_w[None] == (x0c + 1)[:, :, None]).astype(g.dtype)
                  * wxc[:, :, None])                    # [B, chunk, W]
        wy_mat = ((iota_h[None] == y0c[:, :, None]).astype(g.dtype)
                  * (1 - wyc)[:, :, None]
                  + (iota_h[None] == (y0c + 1)[:, :, None]).astype(g.dtype)
                  * wyc[:, :, None])                    # [B, chunk, H]
        gx = jnp.einsum("bpw,bpc->bpwc", wx_mat, gc,
                        preferred_element_type=jnp.float32)
        acc = acc + jnp.einsum("bpy,bpwc->bywc", wy_mat, gx,
                               preferred_element_type=jnp.float32)
        return acc, None

    init = jnp.zeros((b, h, w, c), jnp.float32)
    dimg, _ = jax.lax.scan(body, init, xs)
    return dimg.astype(g.dtype)


@functools.cache
def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Trace-time switch for the compiled Mosaic warp forward. Inference wants
# it (2x the XLA gather); the TRAIN steps do not: the GAN step's no-grad
# D-pass forward and its G-pass gradient recomputation CSE into one XLA
# program only when both use the same gather formulation, and the window
# dumps break producer/consumer fusion inside the big differentiated
# programs (measured: flow step 39 -> 73 ms, GAN step 96 -> 106 ms with
# the kernel inside training). Train-step factories trace under
# disable_mosaic_warp(); the choice is a static part of the jit cache key.
_MOSAIC_WARP = [True]


class disable_mosaic_warp:
    """Context manager: trace enclosed jits with the XLA warp forward."""

    def __enter__(self):
        self._prev = _MOSAIC_WARP[0]
        _MOSAIC_WARP[0] = False

    def __exit__(self, *exc):
        _MOSAIC_WARP[0] = self._prev
        return False


# Trace-time knobs for profiling the warp image adjoint inside the big
# differentiated train programs (tools/profile_train.py). Like
# _MOSAIC_WARP these are read during tracing; every profiled variant
# traces a FRESH step factory, so the ambient value is baked per variant.
_ADJOINT_CHUNK = [2048]  # lax.scan pixel-chunk size of _image_adjoint_matmul
_CHEAP_IMAGE_ADJOINT = [False]


class adjoint_chunk_config:
    """Context manager: trace enclosed jits with the given adjoint chunk."""

    def __init__(self, chunk: int):
        self._chunk = chunk

    def __enter__(self):
        self._prev = _ADJOINT_CHUNK[0]
        _ADJOINT_CHUNK[0] = self._chunk

    def __exit__(self, *exc):
        _ADJOINT_CHUNK[0] = self._prev
        return False


class cheap_image_adjoint:
    """Context manager: replace the warp image adjoint with a near-free
    surrogate (pixel-mean broadcast of the cotangent). WRONG numerics — the
    surrogate keeps the data dependency alive so everything downstream of
    d_image (encoder/generator backward) still executes, isolating just the
    adjoint matmuls' marginal cost in an ablation profile."""

    def __enter__(self):
        self._prev = _CHEAP_IMAGE_ADJOINT[0]
        _CHEAP_IMAGE_ADJOINT[0] = True

    def __exit__(self, *exc):
        _CHEAP_IMAGE_ADJOINT[0] = self._prev
        return False


def _patch_forward(image: jax.Array, grid: jax.Array, align_corners: bool,
                   use_mosaic: bool) -> jax.Array:
    """Forward dispatch: compiled Mosaic kernel on TPU for full-raster
    warps up to 128 channels (the WAM/image warps, where it is ~2x the
    XLA gather — measured 0.28 vs 0.58 ms/img at 128^2 x 64ch on v5e),
    XLA patch gather otherwise (landmark part crops, C>128 VGG-feature
    warps — a [H*W, C>128] row spans multiple lane-tiles and Mosaic
    cannot prove the dynamic 2-row slice 8-aligned — CPU tests, and
    training, see _MOSAIC_WARP)."""
    if (use_mosaic and image.shape[3] <= 128
            and grid.shape[1] * grid.shape[2] == image.shape[1] * image.shape[2]):
        from ffwm_tpu.ops.kernels.warp_vmem_pallas import (
            grid_sample_vmem_sharded,
        )

        # the custom_partitioning wrapper shards the kernel over the batch
        # axis under a multi-device mesh (and is transparent single-device),
        # so sharded eval keeps the kernel instead of falling back to XLA
        return grid_sample_vmem_sharded(image, grid, align_corners)
    return _grid_sample_patch(image, grid, align_corners)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_patch_diff(image: jax.Array, grid: jax.Array,
                            align_corners: bool, use_mosaic: bool) -> jax.Array:
    return _patch_forward(image, grid, align_corners, use_mosaic)


def _gsp_fwd(image, grid, align_corners, use_mosaic):
    return _patch_forward(image, grid, align_corners, use_mosaic), (image, grid)


def _gsp_bwd(align_corners, use_mosaic, res, g):
    image, grid = res
    h, w = image.shape[1:3]
    if _CHEAP_IMAGE_ADJOINT[0]:
        b, _, _, c = image.shape
        d_image = jnp.broadcast_to(
            jnp.mean(g, axis=(1, 2), keepdims=True), (b, h, w, c)
        ).astype(g.dtype)
    else:
        d_image = _image_adjoint_matmul(g, grid, h, w, align_corners,
                                        chunk=_ADJOINT_CHUNK[0])
    # grid gradient: autodiff of the gather forward (gathers, no scatters)
    _, vjp_grid = jax.vjp(
        lambda gr: _grid_sample_patch(jax.lax.stop_gradient(image), gr,
                                      align_corners), grid)
    (d_grid,) = vjp_grid(g)
    return d_image, d_grid


_grid_sample_patch_diff.defvjp(_gsp_fwd, _gsp_bwd)


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    align_corners: bool = False,
    impl: str = "patch",
) -> jax.Array:
    """See _grid_sample_core; resolves the trace-time Mosaic-warp switch
    into a static argument so it participates in the jit cache key."""
    use_mosaic = _MOSAIC_WARP[0] and _on_tpu()
    return _grid_sample_core(image, grid, mode=mode,
                             align_corners=align_corners, impl=impl,
                             use_mosaic=use_mosaic)


@functools.partial(jax.jit, static_argnames=("mode", "align_corners", "impl",
                                             "use_mosaic"))
def _grid_sample_core(
    image: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    align_corners: bool = False,
    impl: str = "patch",
    use_mosaic: bool = False,
) -> jax.Array:
    """Sample ``image`` [B,H,W,C] at ``grid`` [B,Hg,Wg,2] positions in [-1,1].

    Returns [B,Hg,Wg,C]. Zeros padding. Matches
    ``torch.nn.functional.grid_sample`` with NCHW<->NHWC transposed layouts.
    impl: 'patch' (one 2x2-slice gather per pixel, custom matmul image
    adjoint — fastest on TPU for both inference and training) or 'taps'
    (four row gathers, plain autodiff — the straightforward formulation,
    kept as oracle).

    Measured note (v5e, 128^2): a one-hot matmul *forward* (like the
    adjoint) beats the patch gather only for narrow channels (C=3: 0.26 vs
    0.58 ms/img fp32, 0.17 vs 0.49 bf16) and loses at C>=64 (1.7 vs 0.58) —
    and needs precision=HIGHEST for parity (default matmul precision leaves
    ~4e-3 error). Not integrated: the model's hot warps are C>=64.
    """
    if mode == "bilinear" and impl == "patch":
        return _grid_sample_patch_diff(image, grid, align_corners, use_mosaic)
    b, h, w, c = image.shape
    _, hg, wg, two = grid.shape
    assert two == 2, f"grid last dim must be 2 (x, y), got {two}"

    gx = grid[..., 0].reshape(b, -1)
    gy = grid[..., 1].reshape(b, -1)
    ix = _unnormalize(gx, w, align_corners)
    iy = _unnormalize(gy, h, align_corners)

    flat = image.reshape(b, h * w, c)

    if mode == "nearest":
        # torch uses nearbyint (round-half-to-even); jnp.round matches.
        x0 = jnp.round(ix).astype(jnp.int32)
        y0 = jnp.round(iy).astype(jnp.int32)
        valid = (x0 >= 0) & (x0 <= w - 1) & (y0 >= 0) & (y0 <= h - 1)
        x0c = jnp.clip(x0, 0, w - 1)
        y0c = jnp.clip(y0, 0, h - 1)
        out = _gather_2d(flat, x0c, y0c, w) * valid[..., None].astype(image.dtype)
        return out.reshape(b, hg, wg, c)

    if mode != "bilinear":
        raise NotImplementedError(f"grid_sample mode {mode!r}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def tap(xi, yi, weight):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        wgt = weight * valid.astype(image.dtype)
        return _gather_2d(flat, xc, yc, w) * wgt[..., None]

    one = jnp.asarray(1.0, image.dtype)
    wx = wx.astype(image.dtype)
    wy = wy.astype(image.dtype)
    out = (
        tap(x0i, y0i, (one - wx) * (one - wy))
        + tap(x1i, y0i, wx * (one - wy))
        + tap(x0i, y1i, (one - wx) * wy)
        + tap(x1i, y1i, wx * wy)
    )
    return out.reshape(b, hg, wg, c)


def warp(image: jax.Array, flow: jax.Array, mode: str = "bilinear") -> jax.Array:
    """Warp ``image`` [B,H,W,C] with ``flow`` [B,Hf,Wf,2] sampling grid in [-1,1].

    TPU-native equivalent of the reference ``WarpNet``
    (models/base_networks.py:168-173): the flow *is* the sampling grid
    (absolute positions, not motion vectors).
    """
    return grid_sample(image, flow, mode=mode, align_corners=False)


def build_patch_grid(centers: jax.Array, d: int, half_size: float = 64.0) -> jax.Array:
    """Build landmark-centered square sampling grids.

    ``centers``: [B, 1, 2] pixel coords (x, y) in [0, 2*half_size - 1].
    Returns a [B, d, d, 2] grid in [-1, 1] that crops a d x d patch centered
    at each landmark when passed to :func:`grid_sample`.

    Mirrors the reference's grid construction (models/ffwm_model.py:234-246):
    ``base`` spans [-d//2, d//2] in *d* steps and the grid is
    ``(base + center - 64) / 64``.
    """
    b = centers.shape[0]
    r = d // 2
    base_x = jnp.linspace(-r, r, d, dtype=jnp.float32)  # [d]
    base = jnp.stack(
        [
            jnp.broadcast_to(base_x[None, :], (d, d)),  # x varies along width
            jnp.broadcast_to(base_x[:, None], (d, d)),  # y varies along height
        ],
        axis=-1,
    )  # [d, d, 2]
    bias = centers.reshape(b, 1, 1, 2).astype(jnp.float32) - half_size
    return (base[None] + bias) / half_size


def center_crop_grid(batch: int, d: int = 98, cx: float = 64.0, cy: float = 77.0) -> jax.Array:
    """The fixed face-center crop grid used by the identity loss.

    Matches the reference IdentityLoss.build_grid (models/losses.py:102-112):
    a d x d patch centered at pixel (64, 77), normalized by 64.
    """
    centers = jnp.broadcast_to(jnp.asarray([[cx, cy]], jnp.float32), (batch, 2))
    return build_patch_grid(centers.reshape(batch, 1, 2), d)
