"""FFWM trainer — the full flow-based feature-warping GAN, one jitted step.

Rebuild of FFWMModel (models/ffwm_model.py). One training step =
  1. G-side forward: forward/reverse flows, warped profile, 3-scale fakes,
     guided-filter illumination transfer, landmark part crops (:72-88),
  2. D update on (detached GF fake, real), lsgan, x0.5 (:143-149),
  3. G+F update: masked multi-scale L1 + perceptual (guided-filtered fakes
     after the 20k-image warm-up, raw before — :97-105), illumination x15,
     identity (raw x0.5 + GF x1), adversarial x0.1 against the *updated* D,
     facial-part perceptual (2*eyes + nose + mouth) (:91-140),
with three Adam optimizers (G 4e-4, D 4e-4, flownets jointly 5e-5, betas
0.5/0.999, :46-54).

Everything is one XLA program per step: D forwards run 3x per step (2 in the
D pass, 1 in the G pass after the D update), updating BatchNorm stats and
spectral-norm power iterations exactly as many times as the reference does;
the G-side forward's primal computation is shared between the no-grad fake
used by D and the G gradient via XLA CSE.

The warm-up gate counts *images seen* (train_ffwm.py:77 increments by
batch_size), tracked in state.titers.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import flax
import jax
import jax.numpy as jnp
import optax

from ffwm_tpu.engine.common import NetState, adam, apply_mutable
from ffwm_tpu.losses import (
    gan_loss,
    identity_loss,
    identity_loss_pair,
    illumination_loss,
    perceptual_loss,
    perceptual_loss_grouped,
)
from ffwm_tpu.models import FFWM, FlowNet, LightCNN29, MSDiscriminator, VGG19Features
from ffwm_tpu.ops.filters import guided_filter
from ffwm_tpu.ops.resize import resize_bilinear, resize_nearest
from ffwm_tpu.ops.warp import build_patch_grid, disable_mosaic_warp, warp

WARMUP_IMAGES = 20000


def gf_radius(size: int) -> int:
    """Guided-filter radius per scale: 32/16/8 at 128/64/32 (reference
    ffwm_model.py:57-59), generalized as size // 4."""
    return size // 4


@flax.struct.dataclass
class FFWMTrainState:
    flow_f: NetState
    flow_b: NetState
    gen: NetState
    disc: NetState
    opt_g: Any
    opt_f: Any
    opt_d: Any
    titers: jax.Array  # images seen (warm-up gate)


class FFWMModels(NamedTuple):
    flownet: FlowNet
    gen: FFWM
    disc: MSDiscriminator
    lightcnn: LightCNN29
    vgg: VGG19Features


def build_models() -> FFWMModels:
    return FFWMModels(
        flownet=FlowNet(),
        gen=FFWM(sn=True),
        disc=MSDiscriminator(128, sigmoid=False),
        lightcnn=LightCNN29(),
        vgg=VGG19Features(max_layer="relu5_1"),
    )


def create_ffwm_train_state(
    rng: jax.Array,
    models: FFWMModels,
    image_size: int = 128,
    lr_g: float = 4e-4,
    lr_f: float = 5e-5,
    lr_d: float = 4e-4,
    flow_f_vars=None,
    flow_b_vars=None,
    sharding=None,
):
    """Init all trainable nets (optionally seeding flownets from pretrained
    converted variables, like opt.flownetf/--flownetb).

    sharding: optional jax.sharding.Sharding (normally replicated over the
    mesh) applied as out_shardings of the init programs — the state is born
    replicated on-device, skipping a host -> n_devices copy of the ~1 GB
    params+Adam tree (which costs minutes on single-core CPU dryrun hosts).
    """
    kf, kb, kg, kd = jax.random.split(rng, 4)
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    flows = tuple(
        jnp.zeros((1, s, s, 2), jnp.float32)
        for s in (image_size // 4, image_size // 2, image_size)
    )

    # jitted inits: one (persistently cacheable) program per net instead of
    # hundreds of eagerly-dispatched op compiles — this is most of the cold
    # start on single-core CPU hosts (the driver's multichip dryrun).
    jit_kw = {} if sharding is None else {"out_shardings": sharding}
    flow_init = jax.jit(lambda k, xx: models.flownet.init(k, xx, train=True),
                        **jit_kw)
    gen_init = jax.jit(lambda k, xx, fl: models.gen.init(k, xx, fl, train=True),
                       **jit_kw)
    disc_init = jax.jit(lambda k, xx: models.disc.init(k, xx, train=True),
                        **jit_kw)

    flow_f = NetState.from_variables(flow_f_vars or flow_init(kf, x))
    flow_b = NetState.from_variables(flow_b_vars or flow_init(kb, x))
    gen = NetState.from_variables(gen_init(kg, x, flows))
    disc = NetState.from_variables(disc_init(kd, x))
    if sharding is not None and (flow_f_vars or flow_b_vars):
        # host-loaded pretrained flownets still need the explicit transfer
        flow_f, flow_b = jax.device_put((flow_f, flow_b), sharding)

    tx_g, tx_f, tx_d = adam(lr_g), adam(lr_f), adam(lr_d)
    opt_init = jax.jit(
        lambda gp, fp, dp: (tx_g.init(gp), tx_f.init(fp), tx_d.init(dp)),
        **jit_kw)
    opt_g, opt_f, opt_d = opt_init(gen.params,
                                   (flow_f.params, flow_b.params), disc.params)
    titers = jnp.zeros((), jnp.int32)
    if sharding is not None:
        titers = jax.device_put(titers, sharding)
    state = FFWMTrainState(
        flow_f=flow_f, flow_b=flow_b, gen=gen, disc=disc,
        opt_g=opt_g, opt_f=opt_f, opt_d=opt_d,
        titers=titers,
    )
    return state, (tx_g, tx_f, tx_d)


def part_grids(lm_f: jax.Array):
    """Facial part (eyes/nose/mouth) 32x32 crop grids from the 580-pt
    landmarks (reference get_part_grid, models/ffwm_model.py:217-232)."""
    el = lm_f[:, 63:64].astype(jnp.float32)
    er = lm_f[:, 515:516].astype(jnp.float32)
    nc = lm_f[:, 429:430].astype(jnp.float32)
    mouth = jnp.concatenate([lm_f[:, 64:128], lm_f[:, 516:580]], axis=1).astype(jnp.float32)
    mc = (jnp.min(mouth, axis=1, keepdims=True) + jnp.max(mouth, axis=1, keepdims=True)) / 2.0
    return (build_patch_grid(el, 32), build_patch_grid(er, 32),
            build_patch_grid(nc, 32), build_patch_grid(mc, 32))


def _g_forward(models: FFWMModels, flow_f: NetState, flow_b: NetState,
               gen: NetState, img_s, img_f, lm_f):
    """The reference forward() (:72-88)."""
    (ff128, ff64, ff32), flow_f2 = apply_mutable(models.flownet, flow_f, img_s, train=True)
    (fb128, fb64, fb32), flow_b2 = apply_mutable(models.flownet, flow_b, img_s, train=True)
    img_s_warp = warp(img_s, ff128)
    img_s_rec = warp(img_f, fb128)
    (fake32, fake64, fake128), gen2 = apply_mutable(
        models.gen, gen, img_s, (ff32, ff64, ff128), train=True)
    gf128 = guided_filter(fake128, img_f, gf_radius(fake128.shape[1]))

    g_el, g_er, g_n, g_m = part_grids(lm_f)
    parts = {
        "eyelg": warp(gf128, g_el), "eyelgt": warp(img_f, g_el),
        "eyerg": warp(gf128, g_er), "eyergt": warp(img_f, g_er),
        "noseg": warp(gf128, g_n), "nosegt": warp(img_f, g_n),
        "mouthg": warp(gf128, g_m), "mouthgt": warp(img_f, g_m),
    }
    out = {
        "flows_f": (ff128, ff64, ff32), "flows_b": (fb128, fb64, fb32),
        "img_s_warp": img_s_warp, "img_s_rec": img_s_rec,
        "fakes": (fake128, fake64, fake32), "gf128": gf128, "parts": parts,
    }
    return out, (flow_f2, flow_b2, gen2)


def make_ffwm_train_step(models: FFWMModels, txs, crop_identity: bool = False,
                         gan_mode: str = "lsgan", remat_frozen: bool = True,
                         compute_dtype=None, loss_families=None,
                         batch_frozen: bool = True, ablate=(),
                         adjoint_chunk=None):
    """Returns jitted step(state, batch, frozen) -> (state, metrics).

    batch: img_S, img_F [B,128,128,3]; lm_F [B,580,2] int; mask_S, mask_F
    [B,128,128,1]. frozen: {'lightcnn': vars, 'vgg': vars}.

    remat_frozen: rematerialize the frozen VGG/LightCNN feature extractors
    in the backward pass — the step runs 14 VGG forwards (3 loss scales + 8
    facial parts) and 4 LightCNN forwards whose activations otherwise
    dominate HBM (~10 GB at batch 8); recompute costs ~10% FLOPs and avoids
    spilling.

    compute_dtype: e.g. jnp.bfloat16 runs the forward/backward compute in
    that dtype with fp32 MASTER state — params, Adam moments, BatchNorm
    running stats and spectral u/v stay fp32 (the casts live inside the
    differentiated function, so grads emerge fp32; mutated collections are
    cast back before re-entering the state). None = fp32 throughout (the
    parity configuration).

    loss_families: optional subset of {"l1","prc","illu","iden","adv","fc"}
    to compute — profiling/ablation knob (tools/profile_train.py measures
    each family's marginal cost by removal). Disabled families report 0 and
    are structurally absent from the program. None = all (production).

    batch_frozen: run the identity loss's two differentiated LightCNN
    branches as ONE 2B-batch application and the 8 facial-part VGG crops as
    two 4B-batch applications (values identical — the frozen nets are
    batch-invariant; the small per-call batches underfill the MXU, see
    BASELINE.md round-3 profile). False = one application per branch like
    the reference's call structure (ablation/debug).

    ablate: PROFILING-ONLY structural ablations of the G-backward block
    (tools/profile_train.py; never production):
      "flow_bwd"      — stop_gradient on both flownets' params: their
                        backward becomes dead code (XLA DCE) while Adam
                        still runs (on zeros), so the marginal vs full is
                        the flownet backward alone;
      "adam"          — grads computed but no optimizer update applied
                        (marginal = the 3 Adam update+apply trees);
      "image_adjoint" — warp image adjoints replaced by a near-free
                        surrogate that keeps downstream backward alive
                        (ops.warp.cheap_image_adjoint).
    adjoint_chunk: override the warp image-adjoint lax.scan chunk size
    (default ops.warp._ADJOINT_CHUNK; sweep knob).
    """
    tx_g, tx_f, tx_d = txs
    fams = (frozenset(("l1", "prc", "illu", "iden", "adv", "fc"))
            if loss_families is None else frozenset(loss_families))

    if compute_dtype is None:
        cast = lambda t: t
    else:
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
    to_f32 = lambda t: jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    vgg_fwd = lambda v, img: models.vgg.apply(v, img)
    lcnn_fwd = lambda v, img: models.lightcnn.apply(v, img)
    if remat_frozen:
        vgg_fwd = jax.checkpoint(vgg_fwd)
        lcnn_fwd = jax.checkpoint(lcnn_fwd)

    def d_loss_fn(d_params, d_extra, gf128, img_f, mask_f):
        # extras (BatchNorm running stats, spectral u/v) are NEVER cast:
        # train-mode BN only writes them (fp32 EMA), and SpectralNorm casts
        # sigma down in-layer — casting here would re-quantize the running
        # state to bf16 every step (round-3 review finding).
        disc = NetState(params=cast(d_params), extra=d_extra)
        gf128, img_f, mask_f = cast((gf128, img_f, mask_f))
        fake = jax.lax.stop_gradient(gf128) * mask_f
        pred_fake, disc = apply_mutable(models.disc, disc, fake, train=True)
        pred_real, disc = apply_mutable(models.disc, disc, img_f * mask_f, train=True)
        loss_fake = gan_loss(pred_fake, False, gan_mode, for_dis=True)
        loss_real = gan_loss(pred_real, True, gan_mode, for_dis=True)
        loss = ((loss_fake + loss_real) * 0.5).astype(jnp.float32)
        return loss, NetState(params=disc.params, extra=to_f32(disc.extra))

    def g_loss_fn(gfb_params, extras, disc: NetState, batch, frozen, titers):
        if "flow_bwd" in ablate:  # profiling only, see docstring
            gfb_params = (jax.lax.stop_gradient(gfb_params[0]),
                          jax.lax.stop_gradient(gfb_params[1]), gfb_params[2])
        gfb_params = cast(gfb_params)  # extras stay fp32 (see d_loss_fn)
        disc = NetState(params=cast(disc.params), extra=disc.extra)
        batch = dict(batch, **cast({k: batch[k] for k in
                                    ("img_S", "img_F", "mask_S", "mask_F")}))
        frozen = cast(frozen)
        flow_f = NetState(params=gfb_params[0], extra=extras[0])
        flow_b = NetState(params=gfb_params[1], extra=extras[1])
        gen = NetState(params=gfb_params[2], extra=extras[2])
        img_s, img_f = batch["img_S"], batch["img_F"]
        mask_f, mask_s = batch["mask_F"], batch["mask_S"]

        fwd, (flow_f2, flow_b2, gen2) = _g_forward(
            models, flow_f, flow_b, gen, img_s, img_f, batch["lm_F"])
        fake128, fake64, fake32 = fwd["fakes"]
        gf128 = fwd["gf128"]

        s_mid, s_low = fake64.shape[1], fake32.shape[1]  # 64/32 at 128px input
        img_f64 = resize_bilinear(img_f, (s_mid, s_mid))
        img_f32 = resize_bilinear(img_f, (s_low, s_low))
        mask_f64 = resize_nearest(mask_f, (s_mid, s_mid))
        mask_f32 = resize_nearest(mask_f, (s_low, s_low))

        gf64 = guided_filter(fake64, img_f64, gf_radius(fake64.shape[1]))
        gf32 = guided_filter(fake32, img_f32, gf_radius(fake32.shape[1]))
        # warm-up: raw fakes for the first 20k images (reference :97-105)
        use_gf = (titers >= WARMUP_IMAGES).astype(fake128.dtype)
        sel = lambda gf, raw: use_gf * gf + (1.0 - use_gf) * raw
        l128, l64, l32 = sel(gf128, fake128), sel(gf64, fake64), sel(gf32, fake32)

        zero = jnp.zeros((), jnp.float32)
        feats = lambda img: vgg_fwd(frozen["vgg"], img)
        loss_prc = (
            perceptual_loss(feats, l128 * mask_f, img_f * mask_f)
            + perceptual_loss(feats, l64 * mask_f64, img_f64 * mask_f64)
            + 1.5 * perceptual_loss(feats, l32 * mask_f32, img_f32 * mask_f32)
        ).astype(jnp.float32) if "prc" in fams else zero
        loss_l1 = (
            jnp.mean(jnp.abs(l128 * mask_f - img_f * mask_f))
            + jnp.mean(jnp.abs(l64 * mask_f64 - img_f64 * mask_f64))
            + 1.5 * jnp.mean(jnp.abs(l32 * mask_f32 - img_f32 * mask_f32))
        ).astype(jnp.float32) if "l1" in fams else zero
        loss_illu = illumination_loss(
            fwd["flows_b"], (fake128, fake64, fake32), img_s, mask_s
        ).astype(jnp.float32) if "illu" in fams else zero

        if "iden" in fams:
            lcnn = lambda img: lcnn_fwd(frozen["lightcnn"], img)
            # the GF identity term uses the warm-up-SELECTED image (l128):
            # the raw fake for the first 20k images, like the reference's
            # local img_GF128 (ffwm_model.py:97-103 select, :122 use) — NOT
            # unconditionally the guided-filtered fake (round-2 parity
            # defect, caught by tests/test_train_step_parity.py at titers=0)
            if batch_frozen:
                loss_iden = identity_loss_pair(
                    lcnn, fake128, l128, img_f, crop=crop_identity,
                    weights=(0.5, 1.0)).astype(jnp.float32)
            else:
                loss_iden = (
                    identity_loss(lcnn, fake128, img_f,
                                  crop=crop_identity) * 0.5
                    + identity_loss(lcnn, l128, img_f,
                                    crop=crop_identity) * 1.0
                ).astype(jnp.float32)
        else:
            loss_iden = zero

        if "adv" in fams:
            pred_fake, disc2 = apply_mutable(models.disc, disc, gf128 * mask_f,
                                             train=True)
            loss_adv = gan_loss(pred_fake, True, gan_mode,
                                for_dis=False).astype(jnp.float32)
        else:
            disc2 = disc
            loss_adv = zero

        p = fwd["parts"]
        if "fc" not in fams:
            loss_fc = zero
        elif batch_frozen:
            loss_fc = perceptual_loss_grouped(
                feats,
                (p["eyelg"], p["eyerg"], p["mouthg"], p["noseg"]),
                (p["eyelgt"], p["eyergt"], p["mouthgt"], p["nosegt"]),
                group_weights=(2.0, 2.0, 1.0, 1.0)).astype(jnp.float32)
        else:
            loss_fc = (
                2.0 * (perceptual_loss(feats, p["eyelg"], p["eyelgt"])
                       + perceptual_loss(feats, p["eyerg"], p["eyergt"]))
                + perceptual_loss(feats, p["mouthg"], p["mouthgt"])
                + perceptual_loss(feats, p["noseg"], p["nosegt"])
            ).astype(jnp.float32)

        loss_l1 = loss_l1 * 5.0
        loss_adv = loss_adv * 0.1
        loss_illu = loss_illu * 15.0
        loss_g = loss_iden + loss_l1 + loss_prc + loss_illu + loss_fc + loss_adv

        metrics = {
            "loss_G": loss_g, "loss_l1": loss_l1, "loss_iden": loss_iden,
            "loss_illu": loss_illu, "loss_adv": loss_adv,
            "loss_prc": loss_prc, "loss_fc": loss_fc,
        }
        net_states = (
            NetState(params=flow_f.params, extra=to_f32(flow_f2.extra)),
            NetState(params=flow_b.params, extra=to_f32(flow_b2.extra)),
            NetState(params=gen.params, extra=to_f32(gen2.extra)),
        )
        disc2 = NetState(params=disc2.params, extra=to_f32(disc2.extra))
        return loss_g, (net_states, disc2, metrics)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: FFWMTrainState, batch, frozen):
        img_s, img_f = batch["img_S"], batch["img_F"]
        mask_f = batch["mask_F"]
        batch_size = img_s.shape[0]

        # ---- G-side forward for the D update's fake (no grad; XLA CSEs the
        # primal against the G-grad recomputation below — in compute_dtype
        # mode both run the cast graph so the CSE still fires).
        cf = lambda ns: NetState(params=cast(ns.params), extra=ns.extra)
        fwd, _ = _g_forward(models, cf(state.flow_f), cf(state.flow_b),
                            cf(state.gen), cast(img_s), cast(img_f),
                            batch["lm_F"])

        # ---- D update (reference backward_D, :143-149)
        (loss_d, disc_after), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(
            state.disc.params, state.disc.extra, fwd["gf128"], img_f, mask_f)
        d_updates, new_opt_d = tx_d.update(d_grads, state.opt_d, state.disc.params)
        d_params_new = optax.apply_updates(state.disc.params, d_updates)
        disc_new = NetState(params=d_params_new, extra=disc_after.extra)

        # ---- G+F update against the updated D (reference order, :151-160)
        gfb_params = (state.flow_f.params, state.flow_b.params, state.gen.params)
        extras = (state.flow_f.extra, state.flow_b.extra, state.gen.extra)
        grads, (net_states, disc_final, metrics) = jax.grad(
            g_loss_fn, has_aux=True)(
            gfb_params, extras, disc_new, batch, frozen, state.titers)

        f_grads = (grads[0], grads[1])
        f_params = (state.flow_f.params, state.flow_b.params)
        if "adam" in ablate:  # profiling only: grads computed, no update
            gen_params_new = state.gen.params
            ff_new, fb_new = f_params
            new_opt_g, new_opt_f = state.opt_g, state.opt_f
        else:
            g_updates, new_opt_g = tx_g.update(grads[2], state.opt_g,
                                               state.gen.params)
            gen_params_new = optax.apply_updates(state.gen.params, g_updates)
            f_updates, new_opt_f = tx_f.update(f_grads, state.opt_f, f_params)
            ff_new, fb_new = optax.apply_updates(f_params, f_updates)

        # per-optimizer global grad norms (diagnose_network equivalent,
        # util/util.py:73-89; compared against torch autograd by the
        # train-step parity test)
        metrics["grad_norm_G"] = optax.global_norm(grads[2])
        metrics["grad_norm_F"] = optax.global_norm((grads[0], grads[1]))
        metrics["grad_norm_D"] = optax.global_norm(d_grads)

        flow_f2, flow_b2, gen2 = net_states
        new_state = FFWMTrainState(
            flow_f=NetState(params=ff_new, extra=flow_f2.extra),
            flow_b=NetState(params=fb_new, extra=flow_b2.extra),
            gen=NetState(params=gen_params_new, extra=gen2.extra),
            disc=NetState(params=d_params_new, extra=disc_final.extra),
            opt_g=new_opt_g, opt_f=new_opt_f, opt_d=new_opt_d,
            titers=state.titers + batch_size,
        )
        metrics["loss_D"] = loss_d
        return new_state, metrics

    def step(state, batch, frozen):
        # XLA warp forward in training: the no-grad D-pass forward and the
        # G-pass gradient recomputation CSE into one program only when both
        # use the same gather formulation, and the Mosaic window dumps
        # break fusion in the differentiated program (96 -> 106 ms/step
        # measured). Trace-time flag, see ops.warp._MOSAIC_WARP.
        from contextlib import ExitStack

        from ffwm_tpu.ops.warp import adjoint_chunk_config, cheap_image_adjoint

        with ExitStack() as ctx:
            ctx.enter_context(disable_mosaic_warp())
            if adjoint_chunk is not None:
                ctx.enter_context(adjoint_chunk_config(adjoint_chunk))
            if "image_adjoint" in ablate:
                ctx.enter_context(cheap_image_adjoint())
            return train_step(state, batch, frozen)

    return step


def make_ffwm_inference(models: FFWMModels, dtype=jnp.float32):
    """The test path (reference test_forward, :183-189): flowF -> netG ->
    guided filter, attention map always included in the outputs (like the
    reference's test_forward, which always passes return_att=True). jitted;
    variables passed per-call so converted checkpoints plug in.

    dtype=jnp.bfloat16 runs the conv stacks in bf16 on the MXU (~1.3x
    faster on v5e); the guided filter and outputs stay fp32. fp32 is the
    parity configuration for the <1e-3 gate.
    """

    def _cast(tree):
        if dtype == jnp.float32:
            return tree
        return jax.tree.map(
            lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, tree)

    @jax.jit
    def infer(flow_f_vars, gen_vars, img_s, img_f):
        fv, gv = _cast(flow_f_vars), _cast(gen_vars)
        x = img_s.astype(dtype)
        f128, f64, f32 = models.flownet.apply(fv, x, train=False)
        img_s_warp = warp(img_s, f128.astype(jnp.float32))
        out = models.gen.apply(gv, x, (f32, f64, f128),
                               train=False, return_att=True)
        _, _, fake128, att = out
        fake128 = fake128.astype(jnp.float32)
        att_map = jnp.mean(att[..., :64].astype(jnp.float32), axis=-1,
                           keepdims=True)
        gf128 = guided_filter(fake128, img_f, gf_radius(fake128.shape[1]))
        return {"fake_F128": fake128, "img_GF128": gf128,
                "img_S_warp": img_s_warp, "flow": f128.astype(jnp.float32),
                "att": att_map}

    return infer


def make_identity_feature_fn(models: FFWMModels, crop: bool = False):
    """Grayscale fake -> LightCNN 256-d fc feature (reference test(), :191-202)."""
    from ffwm_tpu.losses.identity import _center_crop
    from ffwm_tpu.models.lightcnn import grayscale

    @jax.jit
    def feature(lightcnn_vars, img):
        gray = grayscale(img)
        if crop:
            gray = _center_crop(gray)
        _, fc, _ = models.lightcnn.apply(lightcnn_vars, gray)
        return fc

    return feature
