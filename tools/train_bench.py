#!/usr/bin/env python
"""Training-step throughput on the real chip (reference config: 128 px,
FFWM batch 8 / flow batch 6 — options/base_options.py:57, README.md:105).

Uses chained steps with donated state (the state update itself is the data
dependency) and scalar-fetch timing like bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 16  # enough to amortize per-dispatch tunnel latency (~1 ms/step at 4)


def _timed_repeats(run_once, batch, label, repeats):
    """Median-of-`repeats` timed runs of STEPS chained steps (VERDICT r4 #2:
    no single-shot measurement may be the record — the tunneled dev backend
    shows >20% run-to-run swings; the spread is printed so variance is
    visible in the driver log)."""
    times = []
    for _ in range(repeats):
        times.append(run_once())
    times.sort()
    dt = times[len(times) // 2]  # median
    print(f"# {label}: {dt * 1e3:.1f} ms/step -> {batch / dt:.1f} img/s "
          f"(median of {repeats}; spread "
          f"{[f'{t * 1e3:.1f}' for t in times]})",
          file=sys.stderr, flush=True)
    return batch / dt


def bench_ffwm(batch=8, s=128, bf16=False, repeats=3):
    from ffwm_tpu.engine import (build_models, create_ffwm_train_state,
                                 make_ffwm_train_step)

    models = build_models()
    state, txs = create_ffwm_train_state(jax.random.PRNGKey(0), models,
                                         image_size=s)
    # jitted inits (one cacheable program each) — eager flax init costs
    # minutes of per-op tunnel compiles on the remote-compile backend
    lc = jax.jit(lambda k: models.lightcnn.init(
        k, jnp.zeros((1, s, s, 1))))(jax.random.PRNGKey(1))
    vgg = jax.jit(lambda k: models.vgg.init(
        k, jnp.zeros((1, s, s, 3))))(jax.random.PRNGKey(2))
    frozen = {"lightcnn": lc, "vgg": vgg}
    step = make_ffwm_train_step(
        models, txs, compute_dtype=jnp.bfloat16 if bf16 else None)
    r = np.random.RandomState(0)
    batch_d = {
        "img_S": jnp.asarray(r.rand(batch, s, s, 3), jnp.float32),
        "img_F": jnp.asarray(r.rand(batch, s, s, 3), jnp.float32),
        "lm_F": jnp.asarray(r.randint(0, s, (batch, 580, 2)), jnp.int32),
        "mask_S": jnp.asarray((r.rand(batch, s, s, 1) > 0.2), jnp.float32),
        "mask_F": jnp.asarray((r.rand(batch, s, s, 1) > 0.2), jnp.float32),
    }
    state, m = step(state, batch_d, frozen)  # compile
    jax.device_get(m["loss_G"])

    def run_once():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, batch_d, frozen)
        jax.device_get(m["loss_G"])
        return (time.perf_counter() - t0) / STEPS

    return _timed_repeats(
        run_once, batch, f"ffwm train step b={batch}{' bf16' if bf16 else ''}",
        repeats)


def bench_flow(batch=6, s=128, bf16=False, repeats=3):
    from ffwm_tpu.engine import create_flow_train_state, make_flow_train_step
    from ffwm_tpu.models import VGG19Features

    model, state, tx = create_flow_train_state(jax.random.PRNGKey(0),
                                               image_size=s)
    vgg = VGG19Features(max_layer="relu3_1")
    vgg_vars = jax.jit(lambda k: vgg.init(
        k, jnp.zeros((1, s, s, 3))))(jax.random.PRNGKey(1))
    step = make_flow_train_step(
        model, tx, compute_dtype=jnp.bfloat16 if bf16 else None)
    r = np.random.RandomState(0)
    batch_d = {
        "img_S": jnp.asarray(r.rand(batch, s, s, 3), jnp.float32),
        "img_F": jnp.asarray(r.rand(batch, s, s, 3), jnp.float32),
        "lm_S": jnp.asarray(r.randint(0, s, (batch, 580, 2)), jnp.int32),
        "lm_F": jnp.asarray(r.randint(0, s, (batch, 580, 2)), jnp.int32),
        "gate": jnp.asarray((r.rand(batch, 580, 2) > 0.2), jnp.float32),
        "mask": jnp.asarray((r.rand(batch, s, s, 1) > 0.2), jnp.float32),
    }
    state, m = step(state, batch_d, vgg_vars)
    jax.device_get(m["loss"])

    def run_once():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = step(state, batch_d, vgg_vars)
        jax.device_get(m["loss"])
        return (time.perf_counter() - t0) / STEPS

    return _timed_repeats(
        run_once, batch, f"flow train step b={batch}{' bf16' if bf16 else ''}",
        repeats)


if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/tmp/ffwm_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)
    args = set(sys.argv[1:]) or {"flow", "ffwm"}
    if "flow" in args:
        bench_flow()
    if "flow_bf16" in args:
        bench_flow(bf16=True)
    if "flow_bf16_b12" in args:
        bench_flow(batch=12, bf16=True)
    if "ffwm" in args:
        bench_ffwm()
    if "ffwm_bf16_b32" in args:
        bench_ffwm(batch=32, bf16=True)
