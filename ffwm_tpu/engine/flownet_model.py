"""FlowNet trainer — one jitted step.

Rebuild of FlowNetModel (models/flownet_model.py): Adam(4e-4, betas 0.5/0.999)
on 20 * PerceptualCorrectness + 0.01 * MultiAffineRegularization +
MultiScaleLD landmark loss. Reverse mode trains the frontal->profile flow by
swapping the roles of S/F in the *batch* (done by the data adapter, like
set_train_input :39-54) while the net always consumes the profile image.

TPU design: the whole optimize_parameters() of the reference (forward +
3 losses + backward + Adam) is ONE compiled XLA program; batches arrive
sharded over the data mesh axis and XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ffwm_tpu.engine.common import NetState, adam, apply_mutable
from ffwm_tpu.losses import (
    correctness_loss,
    multi_affine_regularization_loss,
    multiscale_landmark_loss,
)
from ffwm_tpu.models import FlowNet, VGG19Features
from ffwm_tpu.ops.warp import disable_mosaic_warp, warp


@flax.struct.dataclass
class FlowTrainState:
    net: NetState
    opt_state: Any
    step: jax.Array


def create_flow_train_state(rng: jax.Array, lr: float = 4e-4,
                            image_size: int = 128) -> Tuple[FlowNet, FlowTrainState, optax.GradientTransformation]:
    model = FlowNet()
    x = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(rng, x)
    net = NetState.from_variables(variables)
    tx = adam(lr)
    opt_state = tx.init(net.params)
    return model, FlowTrainState(net=net, opt_state=opt_state,
                                 step=jnp.zeros((), jnp.int32)), tx


def make_flow_train_step(
    model: FlowNet,
    tx: optax.GradientTransformation,
    reverse: bool = False,
    loss_weights: Tuple[float, float] = (20.0, 0.01),
    compute_dtype=None,
    correctness_sampling: str = "bilinear",
):
    """Returns jitted step(state, batch, vgg_vars) -> (state, metrics).

    batch keys (already role-swapped for reverse mode by the data adapter):
      img_S, img_F [B,H,W,3]; lm_S, lm_F [B,580,2] int32; gate [B,580,2];
      mask [B,H,W,1].

    compute_dtype: e.g. jnp.bfloat16 runs forward/backward compute in bf16
    with fp32 master weights / Adam moments / BatchNorm stats — the casts
    live inside the differentiated function (same recipe as the FFWM
    trainer's --bf16 path), so gradients and updates stay fp32. None = fp32
    (the parity configuration, tests/test_train_step_parity.py).

    correctness_sampling: "bilinear" (reference default) or "resample2d"
    (the reference's use_bilinear_sampling=False option,
    models/losses.py:332,356-359).
    """
    vgg = VGG19Features(max_layer="relu3_1")
    w_cor, w_reg = loss_weights

    if compute_dtype is None:
        cast = lambda t: t
        to_f32 = lambda t: t
    else:
        cast = lambda t: jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        to_f32 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    def loss_fn(params, extra, batch, vgg_vars):
        # extras (BN running stats) stay fp32: train-mode BN only writes
        # them; casting would re-quantize the EMA to bf16 every step.
        net = NetState(params=cast(params), extra=extra)
        vgg_vars = cast(vgg_vars)
        img_s, img_f, mask = cast((batch["img_S"], batch["img_F"],
                                   batch["mask"]))
        flow_in = img_f if reverse else img_s
        (f128, f64, f32), new_net = apply_mutable(model, net, flow_in, train=True)

        feats = lambda img: vgg.apply(vgg_vars, img)
        loss_cor = correctness_loss(
            feats, img_f, img_s, [f32, f64, f128],
            [2, 1, 0], norm_mask=mask, sampling=correctness_sampling,
        ).astype(jnp.float32) * w_cor
        # Precision split, measured per-variant on v5e (BASELINE.md round-3):
        # the affine regularizer must see fp32 flows — it measures local
        # affine DEVIATIONS ~50x smaller than the grid signal, and bf16's
        # 2^-8 relative input quantization turns into ~30% loss error (the
        # MXU accumulates fp32 either way; it's the input rounding). The
        # landmark MSE on bf16 flows is exact to 4 digits (plain gathered
        # values, no cancellation) and upcasting it was the expensive
        # branch: all-fp32-losses 65.0 ms/step, all-bf16 31.5, this split
        # 29.6 (vs 36.9 fp32) — the fastest AND the accurate one.
        loss_reg = multi_affine_regularization_loss(
            [to_f32(f) for f in (f32, f64, f128)]).astype(jnp.float32) * w_reg
        # img_size = the actual finest-flow resolution: the reference's
        # hard-coded 128 (losses.py:118 scale divisors) is only correct for
        # 128 px data — at other load sizes it halves the landmark indices
        # and scrambles the supervision (round-5 overfit-proof root cause #2)
        loss_lm = multiscale_landmark_loss(
            [f128, f64, f32], batch["lm_S"], batch["lm_F"],
            cast(batch["gate"]), img_size=f128.shape[1]).astype(jnp.float32)
        loss = loss_cor + loss_reg + loss_lm
        new_net = NetState(params=new_net.params, extra=to_f32(new_net.extra))
        metrics = {
            "loss": loss, "loss_cor": loss_cor,
            "loss_reg": loss_reg, "loss_lm": loss_lm,
        }
        return loss, (new_net, metrics)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: FlowTrainState, batch, vgg_vars):
        grads, (new_net, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.net.params, state.net.extra, batch, vgg_vars)
        # global grad norm: the jit-world equivalent of the reference's
        # diagnose_network helper (util/util.py:73-89) and the quantity the
        # train-step parity test compares against torch autograd.
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.net.params)
        new_params = optax.apply_updates(state.net.params, updates)
        new_state = FlowTrainState(
            net=NetState(params=new_params, extra=new_net.extra),
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, metrics

    def step(state, batch, vgg_vars):
        # XLA warp forward in training: the Mosaic kernel's window dumps
        # break fusion inside the differentiated program (39 -> 73 ms/step
        # measured); the flag is trace-time, see ops.warp._MOSAIC_WARP.
        with disable_mosaic_warp():
            return train_step(state, batch, vgg_vars)

    return step


def make_flow_eval_step(model: FlowNet):
    """jitted (variables, img) -> (flow128, warped) for visuals/eval."""

    @jax.jit
    def eval_step(variables, img_s):
        f128, _, _ = model.apply(variables, img_s, train=False)
        return f128, warp(img_s, f128)

    return eval_step
