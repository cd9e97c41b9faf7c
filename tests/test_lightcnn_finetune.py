"""LightCNN finetune engine: SGD groups, lr decay, one jitted step."""

import jax
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.engine.lightcnn_finetune import (
    create_lightcnn_train_state,
    finetune_lr,
    make_lightcnn_feature_fn,
    make_lightcnn_train_step,
)


def test_finetune_lr_decay():
    assert finetune_lr(1e-4, 0) == 1e-4
    assert abs(finetune_lr(1e-4, 25) - 1e-4 * 0.457299) < 1e-12
    assert abs(finetune_lr(1e-4, 50) - 1e-4 * 0.457299**2) < 1e-12


def test_group_labels():
    from ffwm_tpu.engine.lightcnn_finetune import _group_label

    class P:  # mimic jax KeyPath entries
        def __init__(self, key):
            self.key = key

    assert _group_label((P("fc2"), P("bias")), None) == "fc2_bias"
    assert _group_label((P("fc2"), P("kernel")), None) == "fc2_weight"
    assert _group_label((P("conv1"), P("filter"), P("bias")), None) == "bias"
    assert _group_label((P("conv1"), P("filter"), P("kernel")), None) == "weight"


def test_finetune_step(rng):
    n_classes = 7
    model, state, tx = create_lightcnn_train_state(
        jax.random.PRNGKey(0), num_classes=n_classes, lr=1e-3)
    step = make_lightcnn_train_step(model, tx)
    batch = {
        "image": jnp.asarray(rng.rand(2, 128, 128, 1), jnp.float32),
        "label": jnp.asarray(rng.randint(0, n_classes, (2,)), jnp.int32),
    }
    p_before = jax.tree.map(jnp.copy, state.net.params)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["top1"]) <= 1.0
    # fc2 lr multiplier: given similar grad scales, fc2 moves much more
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     p_before, state2.net.params)
    assert d["fc2"]["kernel"] > 0 and d["conv1"]["filter"]["kernel"] > 0

    feat = make_lightcnn_feature_fn(model)
    f = feat(state2.net.params, batch["image"])
    assert f.shape == (2, 256)
