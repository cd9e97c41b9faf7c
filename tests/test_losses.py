"""Loss semantics tests (torch public-API / numpy oracles; the reference's
losses.py cannot be imported offline — it needs torchvision — so oracles are
reimplemented here from public building blocks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ffwm_tpu.losses import (
    affine_regularization_loss,
    correctness_loss,
    gan_loss,
    identity_loss,
    illumination_loss,
    landmark_loss,
    multi_affine_regularization_loss,
    multiscale_landmark_loss,
    perceptual_loss,
)
from ffwm_tpu.losses.correctness import _rowmax_exact


# ------------------------------------------------------------------- GAN ---
def test_lsgan_matches_mse(rng):
    pred = rng.randn(2, 16, 16, 1).astype(np.float32)
    ours_real = float(gan_loss(jnp.asarray(pred), True, "lsgan"))
    ours_fake = float(gan_loss(jnp.asarray(pred), False, "lsgan"))
    t = torch.from_numpy(pred)
    np.testing.assert_allclose(ours_real, float(F.mse_loss(t, torch.ones_like(t))), rtol=1e-6)
    np.testing.assert_allclose(ours_fake, float(F.mse_loss(t, torch.zeros_like(t))), rtol=1e-6)


def test_gan_modes_finite(rng):
    pred = jnp.asarray(rng.randn(2, 8, 8, 1).astype(np.float32))
    for mode in ["lsgan", "vanilla", "hinge", "wgangp", "dcgan"]:
        for real in (True, False):
            v = float(gan_loss(pred, real, mode, for_dis=True))
            assert np.isfinite(v), (mode, real)
    # sigmoid-range input for nsgan
    p = jax.nn.sigmoid(pred)
    assert np.isfinite(float(gan_loss(p, True, "nsgan")))


def test_hinge_matches_reference_formula(rng):
    pred = rng.randn(3, 4, 4, 1).astype(np.float32)
    t = torch.from_numpy(pred)
    ours = float(gan_loss(jnp.asarray(pred), True, "hinge", for_dis=True))
    ref = float(torch.relu(1 - t).mean())
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


# -------------------------------------------------------------- landmark ---
def _landmark_oracle(flow_nhwc, lm_s, lm_f, gate):
    """torch gather oracle of the reference LandmarkLoss (losses.py:61-74)."""
    flow = torch.from_numpy(np.ascontiguousarray(flow_nhwc.transpose(0, 3, 1, 2)))
    b, _, s, _ = flow.shape
    flow_view = flow.transpose(1, 2).transpose(2, 3).reshape(b, -1, 2)
    lmf = torch.from_numpy(lm_f.astype(np.int64))
    lms = torch.from_numpy(lm_s.astype(np.int64))
    index = lmf[:, :, 0:1] + lmf[:, :, 1:2] * s
    index = torch.cat((index, index), 2)
    pts = torch.gather(flow_view, 1, index)
    gt = lms.float() / (s / 2.0) - 1
    g = torch.from_numpy(gate)
    return float(F.mse_loss(pts * g, gt * g))


def test_landmark_loss_matches_oracle(rng):
    s, n = 32, 20
    flow = (rng.rand(2, s, s, 2).astype(np.float32) * 2) - 1
    lm_s = rng.randint(0, s, (2, n, 2))
    lm_f = rng.randint(0, s, (2, n, 2))
    gate = (rng.rand(2, n, 2) > 0.3).astype(np.float32)
    ours = float(landmark_loss(jnp.asarray(flow), jnp.asarray(lm_s),
                               jnp.asarray(lm_f), jnp.asarray(gate)))
    ref = _landmark_oracle(flow, lm_s, lm_f, gate)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_multiscale_landmark_img_size_supervises_small_rasters(rng):
    """img_size must be the ACTUAL finest-flow resolution: with 64 px flows
    and geometrically consistent landmarks (lm_s = lm_f shifted in x), the
    ideal shift flow must score far below a random flow. The reference's
    hard-coded 128 halves the landmark indices at 64 px and scrambles the
    supervision (round-5 overfit-proof root cause)."""
    s, n, shift = 64, 200, 8
    lm_f = rng.randint(s // 4, 3 * s // 4, (2, n, 2))
    lm_s = lm_f.copy()
    lm_s[..., 0] += shift
    gate = np.ones((2, n, 2), np.float32)
    ax = np.linspace(-1 + 1 / s, 1 - 1 / s, s, dtype=np.float32)
    gx, gy = np.meshgrid(ax, ax, indexing="xy")
    ideal = np.broadcast_to(
        np.stack([gx + 2.0 * shift / s, gy], -1), (2, s, s, 2))

    def pyramid(f):
        return [jnp.asarray(f),
                jnp.asarray(f[:, ::2, ::2]), jnp.asarray(f[:, ::4, ::4])]

    args = (jnp.asarray(lm_s), jnp.asarray(lm_f), jnp.asarray(gate))
    l_ideal = float(multiscale_landmark_loss(pyramid(ideal), *args,
                                             img_size=s))
    rand = (rng.rand(2, s, s, 2).astype(np.float32) * 2) - 1
    l_rand = float(multiscale_landmark_loss(pyramid(rand), *args, img_size=s))
    assert l_ideal < 15, l_ideal  # scale-quantization floor (~9), not ~0
    assert l_rand > 20 * l_ideal, (l_ideal, l_rand)


def test_synthetic_landmarks_consistent_across_keys():
    """The loader reads lm_S from the PROFILE key and lm_F from the FRONTAL
    key (reference data/face_dataset.py:55-56) — those two entries must be
    the same physical points, differing only by the camera's x shift. The
    round-4 generator drew a fresh set per camera, making the assembled
    (lm_S, lm_F) pair pure noise; flows were unlearnable."""
    import os
    import tempfile

    from ffwm_tpu.data.synthetic import make_synthetic_multipie

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_multipie(root, n_ids=2, cameras=("051", "041", "050"),
                                size=64, n_test_ids=1)
        d = np.load(os.path.join(root, "multipie", "train", "landmarks.npy"),
                    allow_pickle=True).item()
        # shift = (int(cam[:2]) % 5) * 4 - 8 (synthetic.py pose model)
        for cam, shift in (("041", 8), ("050", -8), ("051", 0)):
            lm_s = d["lm_S"][f"001_01_01_{cam}"]
            lm_f = d["lm_F"]["001_01_01_051"]  # what the loader pairs it with
            diff = lm_s - lm_f
            assert (diff[:, 1] == 0).all()
            assert (diff[:, 0] == shift).all(), (cam, np.unique(diff[:, 0]))


def test_multiscale_landmark_weights(rng):
    n = 10
    flows = [jnp.asarray((rng.rand(1, s, s, 2).astype(np.float32) * 2) - 1)
             for s in (128, 64, 32)]
    lm_s = jnp.asarray(rng.randint(0, 128, (1, n, 2)))
    lm_f = jnp.asarray(rng.randint(0, 128, (1, n, 2)))
    gate = jnp.ones((1, n, 2), jnp.float32)
    total = float(multiscale_landmark_loss(flows, lm_s, lm_f, gate))
    parts = [
        1000 * float(landmark_loss(flows[0], lm_s, lm_f, gate)),
        1000 * float(landmark_loss(flows[1], lm_s // 2, lm_f // 2, gate)),
        1500 * float(landmark_loss(flows[2], lm_s // 4, lm_f // 4, gate)),
    ]
    np.testing.assert_allclose(total, sum(parts), rtol=1e-5)


# ---------------------------------------------------------- illumination ---
def test_illumination_matches_torch_oracle(rng):
    """Oracle built from torch grid_sample + align_corners=True interpolate."""
    img_s = rng.rand(2, 128, 128, 3).astype(np.float32)
    mask = (rng.rand(2, 128, 128, 1) > 0.3).astype(np.float32)
    fakes, flows = [], []
    for s in (128, 64, 32):
        fakes.append(rng.rand(2, s, s, 3).astype(np.float32))
        flows.append((rng.rand(2, s, s, 2).astype(np.float32) * 2) - 1)

    ours = float(illumination_loss(
        [jnp.asarray(f) for f in flows], [jnp.asarray(f) for f in fakes],
        jnp.asarray(img_s), jnp.asarray(mask)))

    t = lambda x: torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    ref = 0.0
    for w, fake, flow in zip([1, 1, 1.5], fakes, flows):
        s = flow.shape[1]
        warped = F.grid_sample(t(fake), torch.from_numpy(flow), mode="bilinear",
                               padding_mode="zeros", align_corners=False)
        target = F.interpolate(t(img_s), (s, s), mode="bilinear", align_corners=True)
        m = F.interpolate(t(mask), (s, s), mode="nearest")
        ref += w * float(F.l1_loss(warped * m, target * m))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


# ----------------------------------------------------------- correctness ---
def test_streaming_rowmax_equals_dense(rng):
    b, n, c, m = 2, 700, 16, 300
    s = rng.randn(b, n, c).astype(np.float32)
    t = rng.randn(b, c, m).astype(np.float32)
    dense = np.max(np.einsum("bnc,bcm->bnm", s, t), axis=1)
    ours = np.asarray(_rowmax_exact(jnp.asarray(s), jnp.asarray(t), chunk=128))
    np.testing.assert_allclose(ours, dense, rtol=1e-5, atol=1e-5)


def test_correctness_loss_matches_manual_oracle(rng):
    """Stub 'VGG' = identity on a downscaled image; oracle via torch bmm."""
    h = w = 16
    target = rng.rand(2, h, w, 3).astype(np.float32)
    source = rng.rand(2, h, w, 3).astype(np.float32)
    flow = ((rng.rand(2, h, w, 2).astype(np.float32) * 2) - 1) * 0.8
    mask = (rng.rand(2, h, w, 1) > 0.2).astype(np.float32)

    feats = lambda img: {"relu1_1": img}
    ours = float(correctness_loss(feats, jnp.asarray(target), jnp.asarray(source),
                                  [jnp.asarray(flow)], [0], jnp.asarray(mask),
                                  chunk=64))

    tt = lambda x: torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    tv, sv = tt(target), tt(source)
    b, c = 2, 3
    eps = 1e-8
    t_all = tv.reshape(b, c, -1)
    s_all = sv.reshape(b, c, -1).transpose(1, 2)
    s_n = s_all / (s_all.norm(dim=2, keepdim=True) + eps)
    t_n = t_all / (t_all.norm(dim=1, keepdim=True) + eps)
    corr = torch.bmm(s_n, t_n)
    corr_max = corr.max(dim=1)[0]
    sampled = F.grid_sample(sv, torch.from_numpy(flow), mode="bilinear",
                            padding_mode="zeros", align_corners=False).reshape(b, c, -1)
    corr_sample = F.cosine_similarity(sampled, t_all, dim=1)
    loss_map = torch.exp(-corr_sample / (corr_max + eps))
    m = tt(mask).reshape(-1, h * w)
    ref = float((torch.sum(m * loss_map) - np.exp(-1.0)) / (torch.sum(m) + eps))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_correctness_loss_resample2d_matches_manual_oracle(rng):
    """The use_bilinear_sampling=False path (reference models/losses.py:332,
    356-359): warped source comes from Resample2d(4,1,sigma=2) fed the
    [-1,1] GRID as pixel offsets (reference quirk, preserved). Oracle =
    the same torch bmm pipeline with the numpy brute-force resample2d."""
    from test_ops_extensions import _resample2d_oracle

    h = w = 16
    target = rng.rand(2, h, w, 3).astype(np.float32)
    source = rng.rand(2, h, w, 3).astype(np.float32)
    flow = ((rng.rand(2, h, w, 2).astype(np.float32) * 2) - 1) * 0.8
    mask = (rng.rand(2, h, w, 1) > 0.2).astype(np.float32)

    feats = lambda img: {"relu1_1": img}
    ours = float(correctness_loss(feats, jnp.asarray(target), jnp.asarray(source),
                                  [jnp.asarray(flow)], [0], jnp.asarray(mask),
                                  chunk=64, sampling="resample2d"))

    tt = lambda x: torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
    tv, sv = tt(target), tt(source)
    b, c = 2, 3
    eps = 1e-8
    t_all = tv.reshape(b, c, -1)
    s_all = sv.reshape(b, c, -1).transpose(1, 2)
    s_n = s_all / (s_all.norm(dim=2, keepdim=True) + eps)
    t_n = t_all / (t_all.norm(dim=1, keepdim=True) + eps)
    corr = torch.bmm(s_n, t_n)
    corr_max = corr.max(dim=1)[0]
    sampled = tt(_resample2d_oracle(source, flow, 2.0, 4, 1)).reshape(b, c, -1)
    corr_sample = F.cosine_similarity(sampled, t_all, dim=1)
    loss_map = torch.exp(-corr_sample / (corr_max + eps))
    m = tt(mask).reshape(-1, h * w)
    ref = float((torch.sum(m * loss_map) - np.exp(-1.0)) / (torch.sum(m) + eps))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_correctness_loss_rejects_unknown_sampling(rng):
    feats = lambda img: {"relu1_1": img}
    x = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError, match="sampling"):
        correctness_loss(feats, x, x, [jnp.zeros((1, 8, 8, 2))], [0],
                         sampling="nearest")


# ----------------------------------------------------------------- affine ---
def test_affine_regularization_zero_for_affine_flow():
    """An exactly-affine sampling grid has zero non-affine energy."""
    h = w = 24
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = 0.9 * xs / w + 0.05 * ys / h - 0.5
    gy = -0.2 * xs / w + 1.1 * ys / h - 0.4
    flow = np.stack([gx, gy], -1)[None].astype(np.float32)
    val = float(affine_regularization_loss(jnp.asarray(flow), kz=3))
    # the quadratic form is exactly 0 mathematically; fp32 cancellation at
    # the x128 grid scale leaves ~1e-3 noise (the reference is identical)
    assert abs(val) < 0.01, val


def test_affine_regularization_positive_for_random_flow(rng):
    flow = ((rng.rand(1, 24, 24, 2).astype(np.float32) * 2) - 1)
    val = float(affine_regularization_loss(jnp.asarray(flow), kz=3))
    assert val > 1.0  # far above the fp noise floor of the affine case


def test_multi_affine_runs_all_scales(rng):
    flows = [jnp.asarray((rng.rand(1, s, s, 2).astype(np.float32) * 2) - 1)
             for s in (32, 64, 128)]
    val = float(multi_affine_regularization_loss(flows))
    assert np.isfinite(val) and val > 0


def test_affine_static_blocks_equal_block_extractor(rng):
    """The static patch path == block_extractor at the constant kz//2 flow."""
    from ffwm_tpu.losses.affine import _static_blocks
    from ffwm_tpu.ops import block_extractor

    kz, h, w = 5, 20, 18
    grid = jnp.asarray(rng.rand(2, h, w, 1).astype(np.float32) * 128)
    hp, wp = h - kz + 1, w - kz + 1
    const_flow = jnp.full((2, hp, wp, 2), float(kz // 2), jnp.float32)
    a = _static_blocks(grid, kz, hp, wp)
    b = block_extractor(grid, const_flow, kz)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_affine_grads_flow(rng):
    flow = jnp.asarray((rng.rand(1, 16, 16, 2).astype(np.float32) * 2) - 1)
    g = jax.grad(lambda f: affine_regularization_loss(f, 3))(flow)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


# -------------------------------------------------------------- identity ---
def test_identity_loss_gt_detached(rng):
    from ffwm_tpu.models import LightCNN29

    model = LightCNN29(num_classes=11)
    x = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    lcnn = lambda img: model.apply(variables, img)

    out = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    val = float(identity_loss(lcnn, out, gt))
    assert np.isfinite(val) and val > 0
    g_gt = jax.grad(lambda g: identity_loss(lcnn, out, g))(gt)
    np.testing.assert_allclose(np.asarray(g_gt), 0.0, atol=0)
    g_out = jax.grad(lambda o: identity_loss(lcnn, o, gt))(out)
    assert float(jnp.abs(g_out).max()) > 0


# ------------------------------------------------------------ perceptual ---
def test_perceptual_loss_weights(rng):
    feats = lambda img: {
        "relu1_1": img, "relu2_1": img * 2, "relu3_1": img * 3,
        "relu4_1": img * 4, "relu5_1": img * 5,
    }
    x = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    y = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    base = float(jnp.mean(jnp.abs(x - y)))
    expect = base * (1 * 1 + 0.5 * 2 + 0.25 * 3 + 0.25 * 4 + 0.125 * 5)
    np.testing.assert_allclose(float(perceptual_loss(feats, x, y)), expect, rtol=1e-5)


def test_identity_loss_pair_matches_separate(rng):
    """Batched 2B-application identity pair == weighted sum of two separate
    identity_loss calls (LightCNN is batch-invariant; engine default
    batch_frozen=True relies on this)."""
    from ffwm_tpu.losses.identity import identity_loss_pair
    from ffwm_tpu.models import LightCNN29

    model = LightCNN29(num_classes=11)
    x = jnp.asarray(rng.rand(1, 128, 128, 1).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    lcnn = lambda img: model.apply(variables, img)

    a = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    b = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    gt = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    paired = float(identity_loss_pair(lcnn, a, b, gt, weights=(0.5, 1.0)))
    separate = float(0.5 * identity_loss(lcnn, a, gt)
                     + 1.0 * identity_loss(lcnn, b, gt))
    np.testing.assert_allclose(paired, separate, rtol=1e-5)

    # both generated branches carry gradient; GT stays detached
    g_gt = jax.grad(lambda g: identity_loss_pair(lcnn, a, b, g))(gt)
    np.testing.assert_allclose(np.asarray(g_gt), 0.0, atol=0)
    g_a = jax.grad(lambda t: identity_loss_pair(lcnn, t, b, gt))(a)
    g_b = jax.grad(lambda t: identity_loss_pair(lcnn, a, t, gt))(b)
    assert float(jnp.abs(g_a).max()) > 0 and float(jnp.abs(g_b).max()) > 0


def test_perceptual_loss_grouped_matches_separate(rng):
    """One 4B-batch VGG application per side == 4 separate perceptual_loss
    calls with the facial-part group weights (engine batch_frozen path)."""
    from ffwm_tpu.losses.perceptual import perceptual_loss_grouped

    feats = lambda img: {
        "relu1_1": img, "relu2_1": img * 2, "relu3_1": img ** 2,
        "relu4_1": img * 4, "relu5_1": img * 5,
    }
    xs = [jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
          for _ in range(4)]
    ys = [jnp.asarray(rng.rand(2, 8, 8, 3).astype(np.float32))
          for _ in range(4)]
    gws = (2.0, 2.0, 1.0, 1.0)
    grouped = float(perceptual_loss_grouped(feats, xs, ys, gws))
    separate = float(sum(g * perceptual_loss(feats, x, y)
                         for g, x, y in zip(gws, xs, ys)))
    np.testing.assert_allclose(grouped, separate, rtol=1e-5)

    g_y = jax.grad(
        lambda t: perceptual_loss_grouped(feats, xs, [t] + ys[1:], gws))(ys[0])
    np.testing.assert_allclose(np.asarray(g_y), 0.0, atol=0)
