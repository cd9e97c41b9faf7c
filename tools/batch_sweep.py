"""Batch-scaling probe for the inference bench: img/s and XLA peak-HBM per
(dtype, batch, mosaic-warp on/off) — the data behind BASELINE.md's
"b=256 regression diagnosed" table (round-2 weak item #3)."""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

from ffwm_tpu.hostcache import configure_cache

configure_cache(REPO)

import jax.numpy as jnp
import numpy as np

import bench
from ffwm_tpu.ops.warp import disable_mosaic_warp

ITERS = bench.ITERS


def run_one(dtype, batch):
    chained, fv, gv = bench.build(dtype, batch)
    r = np.random.RandomState(0)
    img_s = jnp.asarray(r.rand(batch, 128, 128, 3), dtype)
    img_f = jnp.asarray(r.rand(batch, 128, 128, 3), dtype)
    lowered = chained.lower(fv, gv, img_s, img_f)
    compiled = lowered.compile()
    try:
        ma = compiled.memory_analysis()
        peak = (ma.temp_size_in_bytes + ma.argument_size_in_bytes
                + ma.output_size_in_bytes) / 2**30
    except Exception:
        peak = float("nan")
    out = compiled(fv, gv, img_s, img_f)
    jax.device_get(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(compiled(fv, gv, img_s, img_f))
        best = min(best, time.perf_counter() - t0)
    return batch * ITERS / best, peak


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", flush=True)
    for mosaic in (True, False):
        ctx = disable_mosaic_warp() if not mosaic else None
        if ctx is not None:
            ctx.__enter__()
        try:
            for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
                for b in (64, 128, 192, 256):
                    try:
                        ips, peak = run_one(dtype, b)
                        print(f"mosaic={int(mosaic)} {name} b={b}: "
                              f"{ips:7.1f} img/s  peak~{peak:.2f} GiB",
                              flush=True)
                    except Exception as e:
                        print(f"mosaic={int(mosaic)} {name} b={b}: "
                              f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        finally:
            if ctx is not None:
                ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main()
