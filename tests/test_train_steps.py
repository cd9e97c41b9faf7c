"""Integration tests: one jitted train step per model on synthetic data.

Mirrors SURVEY.md §4's prescription ("one jitted train step of each model on
synthetic data — loss finite, shapes, param update"). Runs at 64px to keep
CPU compile affordable; the 128px path is exercised by the parity tests and
the driver's dryrun/bench entries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffwm_tpu.engine import (
    build_models,
    create_ffwm_train_state,
    create_flow_train_state,
    make_ffwm_inference,
    make_ffwm_train_step,
    make_flow_train_step,
    restore_tree,
    save_tree,
    set_lr,
)
from ffwm_tpu.engine.schedule import PlateauTracker, get_lr
from ffwm_tpu.models import VGG19Features

S = 64


def _flow_batch(rng, b=2, s=S):
    return {
        "img_S": jnp.asarray(rng.rand(b, s, s, 3), jnp.float32),
        "img_F": jnp.asarray(rng.rand(b, s, s, 3), jnp.float32),
        "lm_S": jnp.asarray(rng.randint(0, s, (b, 580, 2)), jnp.int32),
        "lm_F": jnp.asarray(rng.randint(0, s, (b, 580, 2)), jnp.int32),
        "gate": jnp.asarray((rng.rand(b, 580, 2) > 0.2), jnp.float32),
        "mask": jnp.asarray((rng.rand(b, s, s, 1) > 0.2), jnp.float32),
    }


def _max_delta(a, b):
    d = jax.tree.map(lambda x, y: float(jnp.abs(x - y).max()), a, b)
    return max(jax.tree.leaves(d))


@pytest.fixture(scope="module")
def flow_setup():
    model, state, tx = create_flow_train_state(jax.random.PRNGKey(0), image_size=S)
    vgg = VGG19Features(max_layer="relu3_1")
    vgg_vars = jax.jit(vgg.init)(jax.random.PRNGKey(1),
                                 jnp.zeros((1, S, S, 3)))
    return model, state, tx, vgg_vars


@pytest.mark.heavy
def test_flow_train_step(flow_setup, rng):
    model, state, tx, vgg_vars = flow_setup
    step = make_flow_train_step(model, tx)
    batch = _flow_batch(rng)
    params_before = jax.tree.map(jnp.copy, state.net.params)
    stats_before = jax.tree.map(jnp.copy, state.net.extra["batch_stats"])

    # the step donates its input state; copy so the fixture stays usable
    state_in = jax.tree.map(jnp.copy, state)
    state2, metrics = step(state_in, batch, vgg_vars)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.step) == 1
    assert _max_delta(params_before, state2.net.params) > 0
    assert _max_delta(stats_before, state2.net.extra["batch_stats"]) > 0

    # second step with fresh batch keeps training
    state3, metrics2 = step(state2, _flow_batch(np.random.RandomState(7)), vgg_vars)
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state3.step) == 2


@pytest.mark.heavy
def test_flow_train_step_resample2d_sampling(flow_setup, rng):
    """correctness_sampling='resample2d' (the reference's
    use_bilinear_sampling=False option) trains: loss finite, params move,
    and the correctness term differs from the bilinear path's."""
    model, state, tx, vgg_vars = flow_setup
    step = make_flow_train_step(model, tx, correctness_sampling="resample2d")
    batch = _flow_batch(rng)
    state_in = jax.tree.map(jnp.copy, state)
    state2, metrics = step(state_in, batch, vgg_vars)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert _max_delta(state.net.params, state2.net.params) > 0

    _, bilinear_metrics = make_flow_train_step(model, tx)(
        jax.tree.map(jnp.copy, state), batch, vgg_vars)
    assert float(metrics["loss_cor"]) != float(bilinear_metrics["loss_cor"])


@pytest.mark.heavy
def test_flow_train_step_bf16_compute(flow_setup, rng):
    """compute_dtype=bf16 on the flow step (train_flow.py --bf16): losses
    finite and close to the fp32 step's, every state leaf (params, Adam
    moments, BN stats) stays fp32."""
    model, state, tx, vgg_vars = flow_setup
    batch = _flow_batch(rng)
    f32_state, f32_metrics = make_flow_train_step(model, tx)(
        jax.tree.map(jnp.copy, state), batch, vgg_vars)
    step = make_flow_train_step(model, tx, compute_dtype=jnp.bfloat16)
    state2, metrics = step(jax.tree.map(jnp.copy, state), batch, vgg_vars)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
        assert np.asarray(v).dtype == np.float32, k
    for path, leaf in jax.tree_util.tree_flatten_with_path(state2)[0]:
        assert leaf.dtype != jnp.bfloat16, jax.tree_util.keystr(path)
    # bf16 compute tracks the fp32 objective (throughput path, not parity)
    rel = abs(float(metrics["loss"]) - float(f32_metrics["loss"])) / float(
        f32_metrics["loss"])
    assert rel < 0.05, rel


@pytest.mark.heavy
def test_bf16_step_keeps_extras_master_precision(flow_setup, rng):
    """BN running stats must NOT be round-tripped through bf16 by the bf16
    step (round-3 review finding): a sub-bf16-resolution perturbation of the
    running var (init 1.0; bf16(1.0001)==1.0) must survive one step as
    exactly 0.9x the perturbation (torch momentum 0.1 EMA in fp32). If the
    engine casts extras, the perturbation is quantized away and the diff
    collapses to ~0."""
    model, state, tx, vgg_vars = flow_setup
    batch = _flow_batch(rng)
    step = make_flow_train_step(model, tx, compute_dtype=jnp.bfloat16)

    eps = 1e-4
    # copy every leaf: the step donates its input, and returning the
    # fixture's own buffers here would delete them for later tests
    perturbed = jax.tree_util.tree_map_with_path(
        lambda p, x: x + eps if (jax.tree_util.keystr(p).endswith("['var']")
                                 and x.dtype == jnp.float32) else jnp.copy(x),
        state)
    base_out, _ = step(jax.tree.map(jnp.copy, state), batch, vgg_vars)
    pert_out, _ = step(perturbed, batch, vgg_vars)

    checked = 0
    flat_b = jax.tree_util.tree_flatten_with_path(base_out)[0]
    flat_p = jax.tree_util.tree_flatten(pert_out)[0]
    for (path, b_leaf), p_leaf in zip(flat_b, flat_p):
        key = jax.tree_util.keystr(path)
        if key.endswith("['var']") and "batch_stats" in key:
            diff = np.asarray(p_leaf - b_leaf)
            # rtol covers fp32 ulp noise (~ulp(old_var)/9e-5); the failure
            # modes are diff==0 (perturbation quantized away) or ~100% off
            np.testing.assert_allclose(diff, 0.9 * eps, rtol=0.05,
                                       err_msg=key)
            checked += 1
    assert checked >= 5  # flownet has many BN layers


@pytest.mark.heavy
def test_reverse_flow_training_semantics(flow_setup, rng):
    """Pin the --reverse double-handling: adapt_batch swaps S/F roles AND
    the step feeds batch['img_F'] (the original *profile*) to the flownet —
    matching reference flownet_model.py:39-62. A refactor that double-swaps
    would silently train the reverse flow on the frontal image.
    """
    from train_flow import adapt_batch

    from ffwm_tpu.engine import make_flow_train_step
    from ffwm_tpu.engine.common import apply_mutable
    from ffwm_tpu.losses import (
        correctness_loss,
        multi_affine_regularization_loss,
        multiscale_landmark_loss,
    )
    from ffwm_tpu.models import VGG19Features

    model, state, tx, vgg_vars = flow_setup
    b = 1
    raw = {
        "img_S": rng.rand(b, S, S, 3).astype(np.float32),
        "img_F": rng.rand(b, S, S, 3).astype(np.float32),
        "lm_S": rng.randint(0, S, (b, 580, 2)).astype(np.int64),
        "lm_F": rng.randint(0, S, (b, 580, 2)).astype(np.int64),
        "gate": (rng.rand(b, 580, 1) > 0.2).astype(np.float32),
        "mask_S": (rng.rand(b, S, S, 1) > 0.2).astype(np.float32),
        "mask_F": (rng.rand(b, S, S, 1) > 0.2).astype(np.float32),
    }
    adapted = adapt_batch(raw, reverse=True)
    # role swap: adapted img_F must be the original PROFILE image
    np.testing.assert_array_equal(adapted["img_F"], raw["img_S"])
    np.testing.assert_array_equal(adapted["img_S"], raw["img_F"])
    np.testing.assert_array_equal(adapted["mask"], raw["mask_S"])

    step = make_flow_train_step(model, tx, reverse=True)
    state_in = jax.tree.map(jnp.copy, state)
    jb = {k: jnp.asarray(v) for k, v in adapted.items()}
    _, metrics = step(state_in, jb, vgg_vars)

    # hand-computed loss with explicitly raw-indexed tensors (flow from the
    # original profile; correctness target=profile source=frontal; landmarks
    # swapped; mask_S)
    (f128, f64, f32), _ = apply_mutable(
        model, state.net, jnp.asarray(raw["img_S"]), train=True)
    vgg = VGG19Features(max_layer="relu3_1")
    feats = lambda img: vgg.apply(vgg_vars, img)
    gate2 = jnp.asarray(np.concatenate([raw["gate"], raw["gate"]], axis=2))
    loss = (
        correctness_loss(feats, jnp.asarray(raw["img_S"]),
                         jnp.asarray(raw["img_F"]), [f32, f64, f128],
                         [2, 1, 0], norm_mask=jnp.asarray(raw["mask_S"])) * 20.0
        + multi_affine_regularization_loss([f32, f64, f128]) * 0.01
        + multiscale_landmark_loss(
            [f128, f64, f32], jnp.asarray(raw["lm_F"], jnp.int32),
            jnp.asarray(raw["lm_S"], jnp.int32), gate2, img_size=S)
    )
    np.testing.assert_allclose(float(metrics["loss"]), float(loss), rtol=1e-5)


def test_flow_checkpoint_roundtrip(flow_setup, tmp_path):
    model, state, tx, _ = flow_setup
    save_tree(str(tmp_path), "flownetf", "latest_net_flowNet", state.net.variables)
    restored = restore_tree(str(tmp_path), "flownetf", "latest_net_flowNet",
                            target=state.net.variables)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored["params"])[0]),
        np.asarray(jax.tree.leaves(state.net.variables["params"])[0]))


@pytest.mark.heavy
def test_ffwm_train_step(rng):
    models = build_models()
    state, txs = create_ffwm_train_state(jax.random.PRNGKey(0), models, image_size=S)
    # jitted inits: single cacheable programs (same shapes as the multichip
    # dryrun's, so these hit the committed compile cache)
    lc_vars = jax.jit(models.lightcnn.init)(jax.random.PRNGKey(1),
                                            jnp.zeros((1, S, S, 1)))
    vgg_vars = jax.jit(models.vgg.init)(jax.random.PRNGKey(2),
                                        jnp.zeros((1, S, S, 3)))
    frozen = {"lightcnn": lc_vars, "vgg": vgg_vars}
    step = make_ffwm_train_step(models, txs)

    b = 1  # one GAN step at 64px already costs ~30 s/sample on this 1-core box
    batch = {
        "img_S": jnp.asarray(rng.rand(b, S, S, 3), jnp.float32),
        "img_F": jnp.asarray(rng.rand(b, S, S, 3), jnp.float32),
        "lm_F": jnp.asarray(rng.randint(0, S, (b, 580, 2)), jnp.int32),
        "mask_S": jnp.asarray((rng.rand(b, S, S, 1) > 0.2), jnp.float32),
        "mask_F": jnp.asarray((rng.rand(b, S, S, 1) > 0.2), jnp.float32),
    }
    g_before = jax.tree.map(jnp.copy, state.gen.params)
    d_before = jax.tree.map(jnp.copy, state.disc.params)
    f_before = jax.tree.map(jnp.copy, state.flow_f.params)

    state2, metrics = step(state, batch, frozen)
    expected = {"loss_G", "loss_D", "loss_l1", "loss_iden", "loss_illu",
                "loss_adv", "loss_prc", "loss_fc"}
    assert expected <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state2.titers) == b  # warm-up counts images
    assert _max_delta(g_before, state2.gen.params) > 0
    assert _max_delta(d_before, state2.disc.params) > 0
    assert _max_delta(f_before, state2.flow_f.params) > 0

    # inference path on the trained state
    infer = make_ffwm_inference(models)
    out = infer(state2.flow_f.variables, state2.gen.variables,
                batch["img_S"], batch["img_F"])
    assert out["fake_F128"].shape == (b, S, S, 3)
    assert out["att"].shape[-1] == 1
    assert np.isfinite(np.asarray(out["img_GF128"])).all()


def test_set_lr_and_schedules():
    import optax

    from ffwm_tpu.engine.common import adam

    tx = adam(1e-3)
    params = {"w": jnp.ones((3,))}
    st = tx.init(params)
    st = set_lr(st, 5e-4)
    g = {"w": jnp.ones((3,))}
    updates, st2 = tx.update(g, st, params)
    assert np.isfinite(np.asarray(updates["w"])).all()

    assert get_lr("step", 4e-4, 0) == 4e-4
    assert get_lr("step", 4e-4, 3) == 2e-4
    assert get_lr("step", 4e-4, 6) == 1e-4
    assert get_lr("linear", 1.0, 0, niter=10, niter_decay=10) == 1.0
    assert get_lr("linear", 1.0, 19, niter=10, niter_decay=10) < 0.2
    # resumed linear runs CONTINUE the decay: torch's LambdaLR last_epoch
    # restarts at 0 on --continue_train but lambda_rule adds epoch_count
    # (reference models/networks.py:49) — epoch 0 of a run resumed at
    # epoch_count=11 must match epoch 10 of a fresh run's trajectory
    assert get_lr("linear", 1.0, 0, niter=10, niter_decay=10,
                  epoch_count=11) == get_lr("linear", 1.0, 10,
                                            niter=10, niter_decay=10)
    # cosine uses T_max = niter (reference models/networks.py:57), NOT
    # niter + niter_decay: lr hits 0 at epoch niter
    assert abs(get_lr("cosine", 1.0, 10, niter=10, niter_decay=10)) < 1e-9
    assert get_lr("cosine", 1.0, 5, niter=10, niter_decay=10) == \
        pytest.approx(0.5)

    pt = PlateauTracker(1e-3, patience=1)
    assert pt.update(1.0) == 1e-3
    assert pt.update(1.0) == 1e-3     # 1 bad epoch
    assert pt.update(1.0) == 2e-4     # second bad epoch -> decay


@pytest.mark.heavy
def test_ffwm_train_step_bf16_compute(rng):
    """compute_dtype=bf16: bf16 forward/backward with fp32 master state —
    losses finite, every state leaf (params, Adam moments, BN stats,
    spectral u/v) stays fp32."""
    models = build_models()
    state, txs = create_ffwm_train_state(jax.random.PRNGKey(0), models,
                                         image_size=S)
    lc_vars = jax.jit(models.lightcnn.init)(jax.random.PRNGKey(1),
                                            jnp.zeros((1, S, S, 1)))
    vgg_vars = jax.jit(models.vgg.init)(jax.random.PRNGKey(2),
                                        jnp.zeros((1, S, S, 3)))
    frozen = {"lightcnn": lc_vars, "vgg": vgg_vars}
    step = make_ffwm_train_step(models, txs, compute_dtype=jnp.bfloat16)

    b = 1
    batch = {
        "img_S": jnp.asarray(rng.rand(b, S, S, 3), jnp.float32),
        "img_F": jnp.asarray(rng.rand(b, S, S, 3), jnp.float32),
        "lm_F": jnp.asarray(rng.randint(0, S, (b, 580, 2)), jnp.int32),
        "mask_S": jnp.asarray((rng.rand(b, S, S, 1) > 0.2), jnp.float32),
        "mask_F": jnp.asarray((rng.rand(b, S, S, 1) > 0.2), jnp.float32),
    }
    state2, metrics = step(state, batch, frozen)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
        assert np.asarray(v).dtype == np.float32, k
    for path, leaf in jax.tree_util.tree_flatten_with_path(state2)[0]:
        assert leaf.dtype != jnp.bfloat16, jax.tree_util.keystr(path)


@pytest.mark.heavy
def test_ffwm_train_step_loss_ablation(rng):
    """loss_families structurally removes loss terms (the profile tool's
    marginal-cost knob): disabled metrics are exactly 0 and loss_G is the
    sum of the enabled ones."""
    models = build_models()
    state, txs = create_ffwm_train_state(jax.random.PRNGKey(0), models,
                                         image_size=S)
    frozen = {"lightcnn": jax.jit(models.lightcnn.init)(
                  jax.random.PRNGKey(1), jnp.zeros((1, S, S, 1))),
              "vgg": jax.jit(models.vgg.init)(
                  jax.random.PRNGKey(2), jnp.zeros((1, S, S, 3)))}
    step = make_ffwm_train_step(models, txs, loss_families={"l1", "illu"})

    b = 1
    batch = {
        "img_S": jnp.asarray(rng.rand(b, S, S, 3), jnp.float32),
        "img_F": jnp.asarray(rng.rand(b, S, S, 3), jnp.float32),
        "lm_F": jnp.asarray(rng.randint(0, S, (b, 580, 2)), jnp.int32),
        "mask_S": jnp.asarray((rng.rand(b, S, S, 1) > 0.2), jnp.float32),
        "mask_F": jnp.asarray((rng.rand(b, S, S, 1) > 0.2), jnp.float32),
    }
    _, metrics = step(state, batch, frozen)
    assert float(metrics["loss_prc"]) == 0.0
    assert float(metrics["loss_iden"]) == 0.0
    assert float(metrics["loss_adv"]) == 0.0
    assert float(metrics["loss_fc"]) == 0.0
    assert float(metrics["loss_l1"]) > 0.0
    assert float(metrics["loss_illu"]) > 0.0
    np.testing.assert_allclose(
        float(metrics["loss_G"]),
        float(metrics["loss_l1"]) + float(metrics["loss_illu"]), rtol=1e-6)
