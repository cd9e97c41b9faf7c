#!/usr/bin/env python
"""Benchmark: 128x128 frontalized faces/sec/chip on the test_ffwm.py hot path
(flowNetF -> WAM generator -> guided filter), per BASELINE.json.

Methodology: ITERS inference steps are chained *inside one jitted program*
with a data dependency (each step's output feeds the next step's guidance
image), so the device must execute every step — robust against async/lazy
dispatch and amortizes host<->device latency (important under the tunneled
dev backend). Timing = wall clock of the blocked program / (ITERS * batch).

Reports fp32 (the parity configuration — matches the PyTorch reference
<1e-3) as the headline and bf16 as the fast path.

Baseline anchor: the reference publishes no numbers (BASELINE.md), and its
GPU is not available here, so the anchor is derived from first principles:
the inference path is exactly 107.9 GFLOP/image (XLA cost analysis); the
reference runs plain fp32 PyTorch 1.5 (no AMP/tensor cores, NCHW), which
sustains ~11 TF/s on a V100's 15.7 TF/s fp32 peak for 3x3 convs ->
~100 img/s batched (the actual test_ffwm.py loop is batch-1 and slower).
vs_baseline = value / 100. BASELINE.json's target is >=5x per chip.
"""

import json
import sys
import time

import os

import jax

# persistent compile cache, in-repo so it survives across driver rounds:
# the chained-scan program costs ~10 min to compile via the tunneled
# remote-compile service; a committed cache makes the driver's cold bench
# run execute-only. Host-fingerprint-scoped (ffwm_tpu.hostcache) — CPU
# entries are host-ISA AOT artifacts that must not load on foreign hosts.
from ffwm_tpu.hostcache import configure_cache

configure_cache(os.path.dirname(os.path.abspath(__file__)))
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_S = 100.0  # FLOP-derived estimate of batched fp32 PyTorch-V100 throughput
ITERS = 16


def build(dtype, batch):
    from ffwm_tpu.engine.ffwm_model import build_models, gf_radius
    from ffwm_tpu.ops.filters import guided_filter

    models = build_models()
    s = 128
    x1 = jnp.zeros((1, s, s, 3), jnp.float32)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (s // 4, s // 2, s))
    # jitted inits: ONE cacheable program per net. Eager flax init dispatches
    # hundreds of per-op compiles, each a ~0.5 s tunnel round trip on the
    # remote-compile backend — measured 400+ misses > 4 min before the first
    # measurement, the direct cause of round 4's driver-bench timeout.
    flow_vars = jax.jit(
        lambda k: models.flownet.init(k, x1, train=False))(jax.random.PRNGKey(0))
    gen_vars = jax.jit(
        lambda k: models.gen.init(k, x1, flows0, train=False))(jax.random.PRNGKey(1))
    if dtype == jnp.bfloat16:
        cast = lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t
        cast_tree = jax.jit(lambda tree: jax.tree.map(cast, tree))
        flow_vars = cast_tree(flow_vars)
        gen_vars = cast_tree(gen_vars)

    def one_step(fv, gv, img_s, img_f):
        f128, f64, f32 = models.flownet.apply(fv, img_s, train=False)
        _, _, fake128 = models.gen.apply(gv, img_s, (f32, f64, f128),
                                         train=False)
        return guided_filter(fake128, img_f, gf_radius(s))

    @jax.jit
    def chained(fv, gv, img_s, img_f):
        # the carry feeds the NETWORK INPUT so nothing is loop-invariant —
        # XLA cannot hoist the flownet/generator out of the scan; the scalar
        # reduction forces full execution while keeping the fetched result
        # tiny (timing by device_get is then immune to async/lazy dispatch).
        def body(carry, _):
            out = one_step(fv, gv, carry, img_f)
            return out.astype(dtype), ()
        final, _ = jax.lax.scan(body, img_s, None, length=ITERS)
        return jnp.mean(final.astype(jnp.float32))

    return chained, flow_vars, gen_vars


def measure(dtype, batch):
    chained, fv, gv = build(dtype, batch)
    r = np.random.RandomState(0)
    img_s = jnp.asarray(r.rand(batch, 128, 128, 3), dtype)
    img_f = jnp.asarray(r.rand(batch, 128, 128, 3), dtype)
    check = float(jax.device_get(chained(fv, gv, img_s, img_f)))  # compile+warm
    assert np.isfinite(check), "benchmark forward produced non-finite output"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chained(fv, gv, img_s, img_f))
        best = min(best, time.perf_counter() - t0)
    return batch * ITERS / best


def main():
    # Wall budget (VERDICT r4 #1: round 4's bench was killed by the driver's
    # timeout mid-train-bench and left NO parsed JSON). Two defenses:
    #   1. the complete inference JSON line is printed IMMEDIATELY after the
    #      two inference measurements — whatever happens later, the driver
    #      has a parsed record (it takes the last parseable line, so the
    #      extended line printed after the train benches supersedes it);
    #   2. each train bench starts only while under ~2/3 of the budget —
    #      skipped ones are marked "skipped", never silently absent.
    t_start = time.perf_counter()
    budget = float(os.environ.get("BENCH_BUDGET_S", "700"))

    # The tunneled TPU plugin can hang indefinitely in backend init when
    # the tunnel is down; fail loudly instead of stalling the driver. A
    # watchdog THREAD (not SIGALRM): the hang is inside the PJRT plugin's
    # C++ init, where a Python signal handler would never get to run.
    import threading

    watchdog = threading.Timer(900.0, lambda: (
        print("bench: jax backend init exceeded 15 min — TPU tunnel down?",
              file=sys.stderr, flush=True),
        os._exit(2)))
    watchdog.daemon = True
    watchdog.start()
    dev = jax.devices()[0]
    watchdog.cancel()
    print(f"# device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    results = {}
    el = lambda: time.perf_counter() - t_start  # phase timestamps: the wall
    # is dominated by tunnel weather (executable-load round trips vary 3x
    # run-to-run even with full cache hits), so record where it went
    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        best, best_b = 0.0, 0
        for batch in (128,):
            try:
                ips = measure(dtype, batch)
            except Exception as e:  # OOM etc.
                print(f"# {name} b={batch}: {type(e).__name__}: {e}",
                      file=sys.stderr)
                break
            print(f"# {name} b={batch}: {ips:.1f} img/s [t={el():.0f}s]",
                  file=sys.stderr)
            if ips > best:
                best, best_b = ips, batch
        results[name] = (best, best_b)

    value = results["fp32"][0]
    base = {
        "metric": "128x128 frontalized faces/sec/chip (flowNetF+netG+GF inference)",
        "value": round(value, 2),
        "unit": "img/s",
        "vs_baseline": round(value / BASELINE_IMG_S, 3),
        "fp32_img_s": round(results["fp32"][0], 2),
        "fp32_batch": results["fp32"][1],
        "bf16_img_s": round(results["bf16"][0], 2),
        "bf16_batch": results["bf16"][1],
        "iters_chained": ITERS,
        "device": f"{dev.platform}:{dev.device_kind}",
    }
    print(json.dumps(base), flush=True)  # the guaranteed driver record

    # Training throughput (VERDICT r3 #5): short chained-step runs of the
    # real jitted GAN and flow train steps, so a train-perf regression is
    # driver-visible, not only in BASELINE.md prose. Reuses the train_bench
    # machinery (median-of-3 x 16 chained steps); programs live in the same
    # committed compile cache, so the warm cost per bench is seconds.
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    train = {}
    train_specs = (
        ("train_img_s", lambda: bench_ffwm(batch=16, bf16=True)),
        ("train_fp32_img_s", lambda: bench_ffwm(batch=8)),
        ("flow_train_img_s", lambda: bench_flow(batch=16, bf16=True)),
        ("flow_train_fp32_img_s", lambda: bench_flow(batch=6)))
    try:  # import inside the guard: an import failure must not sink the JSON
        from train_bench import bench_ffwm, bench_flow
    except Exception as e:
        print(f"# train_bench import: {type(e).__name__}: {e}",
              file=sys.stderr)
        train = {key: None for key, _ in train_specs}
    else:
        for key, fn in train_specs:
            elapsed = el()
            if elapsed > budget * 2 / 3:
                print(f"# {key}: skipped ({elapsed:.0f}s elapsed > 2/3 of "
                      f"{budget:.0f}s budget)", file=sys.stderr)
                train[key] = "skipped"
                continue
            try:
                train[key] = round(fn(), 2)
            except Exception as e:  # must never sink the driver bench
                print(f"# {key}: {type(e).__name__}: {e}", file=sys.stderr)
                train[key] = None
            # re-print the extended JSON after EVERY train bench: the driver
            # takes the LAST parseable line, so even a hard kill mid-train-
            # phase records everything measured so far. Not-yet-attempted
            # keys are marked "pending" (distinct from deliberate budget
            # "skipped"s): if a later bench hard-kills the process, the
            # record shows WHICH bench died rather than implying a skip
            done = {**base, **train,
                    **{k: "pending" for k, _ in train_specs if k not in train}}
            print(json.dumps(done), flush=True)
            print(f"# {key} done [t={el():.0f}s]", file=sys.stderr)

    print(json.dumps({**base, **train}), flush=True)


if __name__ == "__main__":
    main()
