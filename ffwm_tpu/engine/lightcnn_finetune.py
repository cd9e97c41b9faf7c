"""LightCNN-29 finetuning on Multi-PIE — jitted SGD step.

Rebuild of lightcnn/finetune.py: cross-entropy on the 79077-way logits with
torch-style SGD (momentum 0.9, weight decay 1e-4 on weights only) and
per-parameter-group learning rates — fc2 weights x10, fc2 bias x20 (no wd),
other biases x2 (no wd), other weights x1 (:74-90); step decay x0.457 every
25 epochs (:283-291); labels are int(filename[:3]) - 1 (:150); validation is
Multi-PIE rank-1 vs a one-frontal-per-identity gallery.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ffwm_tpu.engine.common import NetState
from ffwm_tpu.models import LightCNN29


@flax.struct.dataclass
class LightCNNTrainState:
    net: NetState
    opt_state: Any
    step: jax.Array


def _group_label(path: Tuple, _) -> str:
    keys = [getattr(p, "key", str(p)) for p in path]
    in_fc2 = "fc2" in keys
    is_bias = keys[-1] == "bias"
    if in_fc2 and is_bias:
        return "fc2_bias"
    if in_fc2:
        return "fc2_weight"
    if is_bias:
        return "bias"
    return "weight"


def lightcnn_sgd(momentum: float = 0.9, weight_decay: float = 1e-4
                 ) -> optax.GradientTransformation:
    """SGD with the reference's per-group lr multipliers and selective wd.
    Learning rate injected via hyperparams (see set_lr)."""

    def make(learning_rate):
        def group(mult, wd):
            chain = []
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.trace(decay=momentum, nesterov=False))
            chain.append(optax.scale(-mult))
            return optax.chain(*chain)

        transforms = {
            "weight": group(1.0, weight_decay),
            "bias": group(2.0, 0.0),
            "fc2_weight": group(10.0, weight_decay),
            "fc2_bias": group(20.0, 0.0),
        }
        return optax.chain(
            optax.multi_transform(
                transforms,
                lambda params: jax.tree_util.tree_map_with_path(_group_label, params),
            ),
            optax.scale(learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=1e-4)


def create_lightcnn_train_state(rng, num_classes: int = 79077,
                                pretrained_vars=None, lr: float = 1e-4,
                                image_size: int = 128):
    model = LightCNN29(num_classes=num_classes)
    if pretrained_vars is None:
        variables = model.init({"params": rng},
                               jnp.zeros((1, image_size, image_size, 1)))
    else:
        variables = pretrained_vars
    net = NetState.from_variables(dict(variables))
    tx = lightcnn_sgd()
    opt = tx.init(net.params)
    opt.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return model, LightCNNTrainState(net=net, opt_state=opt,
                                     step=jnp.zeros((), jnp.int32)), tx


def finetune_lr(base_lr: float, epoch: int, step: int = 25,
                scale: float = 0.457299) -> float:
    """Step decay x~0.457 every 25 epochs (reference adjust_learning_rate)."""
    return base_lr * (scale ** (epoch // step))


def make_lightcnn_train_step(model: LightCNN29, tx):
    def loss_fn(params, batch, dropout_rng):
        logits, _, _ = model.apply(
            {"params": params}, batch["image"], train=True,
            rngs={"dropout": dropout_rng})
        labels = batch["label"]
        ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss = jnp.mean(ce)
        acc1 = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        top5 = jax.lax.top_k(logits, 5)[1]
        acc5 = jnp.mean(jnp.any(top5 == labels[:, None], axis=1).astype(jnp.float32))
        return loss, {"loss": loss, "top1": acc1, "top5": acc5}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: LightCNNTrainState, batch, dropout_rng):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.net.params, batch, dropout_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.net.params)
        new_params = optax.apply_updates(state.net.params, updates)
        return LightCNNTrainState(
            net=NetState(params=new_params, extra=state.net.extra),
            opt_state=new_opt, step=state.step + 1), metrics

    return train_step


def make_lightcnn_feature_fn(model: LightCNN29):
    @jax.jit
    def features(params, images):
        _, fc, _ = model.apply({"params": params}, images)
        return fc

    return features
