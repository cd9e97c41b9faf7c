#!/usr/bin/env python
"""Per-component GAN train-step profile on the real chip (VERDICT r2 #2 —
the train-step mirror of tools/profile_infer.py).

Components are measured by STRUCTURAL ablation: each variant recompiles the
production step with one loss family removed (make_ffwm_train_step's
loss_families knob), so a family's marginal cost = T(full) - T(without it),
including its backward and any fusion interactions. Plus: remat on/off,
bf16-compute (fp32 master), batch scaling, D-pass/forward-only brackets.

Each variant is its own (cached) XLA program; first runs pay a multi-minute
remote TPU compile on this box. Select variants on argv to run incrementally:

    python tools/profile_train.py full no_prc no_fc bf16
    python tools/profile_train.py all          # everything

Results append to /tmp/profile_train_results.txt as aligned rows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# repo cache (host-scoped like bench.py) so TPU executables persist rounds
from ffwm_tpu.hostcache import configure_cache

configure_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

STEPS = 6
ALL_FAMS = ("l1", "prc", "illu", "iden", "adv", "fc")


def make_batch(b, s, seed=0):
    r = np.random.RandomState(seed)
    return {
        "img_S": jnp.asarray(r.rand(b, s, s, 3), jnp.float32),
        "img_F": jnp.asarray(r.rand(b, s, s, 3), jnp.float32),
        "lm_F": jnp.asarray(r.randint(0, s, (b, 580, 2)), jnp.int32),
        "mask_S": jnp.asarray((r.rand(b, s, s, 1) > 0.2), jnp.float32),
        "mask_F": jnp.asarray((r.rand(b, s, s, 1) > 0.2), jnp.float32),
    }


def setup(b=8, s=128):
    from ffwm_tpu.engine import build_models, create_ffwm_train_state

    models = build_models()
    state, txs = create_ffwm_train_state(jax.random.PRNGKey(0), models,
                                         image_size=s)
    lc = models.lightcnn.init(jax.random.PRNGKey(1), jnp.zeros((1, s, s, 1)))
    vgg = models.vgg.init(jax.random.PRNGKey(2), jnp.zeros((1, s, s, 3)))
    return models, state, txs, {"lightcnn": lc, "vgg": vgg}, make_batch(b, s)


def time_step(step, state, batch, frozen, key="loss_G"):
    state, m = step(state, batch, frozen)  # compile + warm
    jax.device_get(m[key])
    state, m = step(state, batch, frozen)
    jax.device_get(m[key])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, m = step(state, batch, frozen)
    jax.device_get(m[key])
    return (time.perf_counter() - t0) / STEPS


def report(name, dt, b, base=None):
    extra = ""
    if base is not None:
        extra = f"  marginal={1e3 * (base - dt):+7.1f} ms"
    line = (f"{name:24s} {dt * 1e3:8.1f} ms/step  {b / dt:7.1f} img/s{extra}")
    print(line, flush=True)
    with open("/tmp/profile_train_results.txt", "a") as f:
        f.write(line + "\n")
    return dt


def main():
    want = set(sys.argv[1:]) or {"full"}
    if "all" in want:
        want = ({"full", "remat_off", "bf16", "bf16_remat_off", "b16",
                 "bf16_b16", "d_only", "fwd_only", "unbatched_frozen"}
                | {f"no_{f}" for f in ALL_FAMS})
    if "gbwd" in want:
        # VERDICT r3 #4: open the G-backward block (full - (fwd + D pass)):
        # flownet backward, warp image adjoints, G+F Adam updates, plus the
        # adjoint chunk sweep
        want |= {"full", "no_flow_bwd", "no_adam", "cheap_adjoint",
                 "chunk512", "chunk1024", "chunk4096", "chunk8192"}

    from ffwm_tpu.engine import make_ffwm_train_step
    from ffwm_tpu.engine.ffwm_model import _g_forward

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)
    b, s = 8, 128
    models, state0, txs, frozen, batch = setup(b, s)

    def fresh_state():
        # donated buffers die per variant; rebuild cheaply from host copy
        return jax.tree.map(jnp.asarray, host_state)

    host_state = jax.device_get(state0)

    base = None
    if "full" in want or any(v.startswith("no_") for v in want):
        step = make_ffwm_train_step(models, txs)
        base = report("full", time_step(step, fresh_state(), batch, frozen), b)

    for fam in ALL_FAMS:
        if f"no_{fam}" in want:
            step = make_ffwm_train_step(
                models, txs, loss_families=set(ALL_FAMS) - {fam})
            report(f"no_{fam}", time_step(step, fresh_state(), batch, frozen),
                   b, base)

    # ---- G-backward block breakdown (structural ablations; see
    # make_ffwm_train_step's `ablate` docstring for what each removes)
    if "no_flow_bwd" in want:
        step = make_ffwm_train_step(models, txs, ablate=("flow_bwd",))
        report("no_flow_bwd",
               time_step(step, fresh_state(), batch, frozen), b, base)
    if "no_adam" in want:
        step = make_ffwm_train_step(models, txs, ablate=("adam",))
        report("no_adam_GF",
               time_step(step, fresh_state(), batch, frozen), b, base)
    if "cheap_adjoint" in want:
        step = make_ffwm_train_step(models, txs, ablate=("image_adjoint",))
        report("cheap_image_adjoint",
               time_step(step, fresh_state(), batch, frozen), b, base)
    for ch in (512, 1024, 4096, 8192):
        if f"chunk{ch}" in want:
            step = make_ffwm_train_step(models, txs, adjoint_chunk=ch)
            report(f"adjoint_chunk{ch}",
                   time_step(step, fresh_state(), batch, frozen), b, base)

    if "d_only" in want:
        # all G losses removed: forward + D update + (trivial) G/F update
        step = make_ffwm_train_step(models, txs, loss_families=set())
        report("d_pass+fwd only",
               time_step(step, fresh_state(), batch, frozen, key="loss_D"),
               b, base)

    if "unbatched_frozen" in want:
        # per-branch frozen-net applications like the reference call
        # structure (production default batches them, batch_frozen=True)
        step = make_ffwm_train_step(models, txs, batch_frozen=False)
        report("unbatched_frozen",
               time_step(step, fresh_state(), batch, frozen), b, base)

    if "remat_off" in want:
        step = make_ffwm_train_step(models, txs, remat_frozen=False)
        report("remat_off", time_step(step, fresh_state(), batch, frozen), b,
               base)

    if "bf16" in want:
        step = make_ffwm_train_step(models, txs, compute_dtype=jnp.bfloat16)
        report("bf16_compute", time_step(step, fresh_state(), batch, frozen),
               b, base)

    if "bf16_remat_off" in want:
        step = make_ffwm_train_step(models, txs, compute_dtype=jnp.bfloat16,
                                    remat_frozen=False)
        report("bf16_remat_off",
               time_step(step, fresh_state(), batch, frozen), b)

    if "b16" in want:
        batch16 = make_batch(16, s)
        step = make_ffwm_train_step(models, txs)
        report("full_b16", time_step(step, fresh_state(), batch16, frozen), 16)

    if "bf16_b16" in want:
        batch16 = make_batch(16, s)
        step = make_ffwm_train_step(models, txs, compute_dtype=jnp.bfloat16)
        report("bf16_b16", time_step(step, fresh_state(), batch16, frozen), 16)

    if "fwd_only" in want:
        st = fresh_state()

        @jax.jit
        def fwd(flow_f, flow_b, gen, batch):
            out, _ = _g_forward(models, flow_f, flow_b, gen,
                                batch["img_S"], batch["img_F"], batch["lm_F"])
            return out["gf128"]

        fwd(st.flow_f, st.flow_b, st.gen, batch).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fwd(st.flow_f, st.flow_b, st.gen, batch)
        out.block_until_ready()
        report("g_forward only", (time.perf_counter() - t0) / STEPS, b, base)


if __name__ == "__main__":
    main()
