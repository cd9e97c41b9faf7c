#!/usr/bin/env python
"""Per-component inference profile, fp32 vs bf16, on the real chip.

Refines tools/ablate_bench.py for the round-2 perf push: times every stage
of the inference path (reference test_forward: flowNetF -> netG -> gf128,
models/ffwm_model.py:183-189) in both dtypes, plus the individual WAM warp
geometries (the generator's three grid-sample calls) and the XLA
formulations of the CUDA-extension ops (resample2d / block_extractor) for
the BASELINE.md pallas-vs-XLA record.

Chained-scan + scalar-fetch timing (see bench.py docstring).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ffwm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.engine.ffwm_model import build_models, gf_radius
from ffwm_tpu.ops.block_extractor import block_extractor
from ffwm_tpu.ops.filters import guided_filter
from ffwm_tpu.ops.resample2d import resample2d
from ffwm_tpu.ops.warp import grid_sample

ITERS = 8
BATCH = 64
RESULTS = {}


def timeit(name, chained, *args):
    check = jax.device_get(chained(*args))
    assert np.isfinite(np.asarray(check)).all(), name
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chained(*args))
        best = min(best, time.perf_counter() - t0)
    per_img_ms = best / (ITERS * BATCH) * 1e3
    print(f"{name:>28}: {per_img_ms:6.3f} ms/img  {1e3 / per_img_ms:9.1f} img/s",
          flush=True)
    RESULTS[name] = round(per_img_ms, 4)
    return per_img_ms


def chain(one, carry_of_out):
    @jax.jit
    def run(c0, *rest):
        def body(c, _):
            return carry_of_out(one(c, *rest), c).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, c0, None, length=ITERS)
        return jnp.mean(out.astype(jnp.float32))
    return run


def cast_vars(tree, dtype):
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, tree)


def main():
    models = build_models()
    s = 128
    r = np.random.RandomState(0)
    x1 = jnp.zeros((1, s, s, 3), jnp.float32)
    fv32 = models.flownet.init(jax.random.PRNGKey(0), x1, train=False)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (32, 64, 128))
    gv32 = models.gen.init(jax.random.PRNGKey(1), x1, flows0, train=False)

    for name, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        fv, gv = cast_vars(fv32, dtype), cast_vars(gv32, dtype)
        img = jnp.asarray(r.rand(BATCH, s, s, 3), dtype)
        img2 = jnp.asarray(r.rand(BATCH, s, s, 3), dtype)
        flows = tuple(jnp.asarray(r.rand(BATCH, t, t, 2) * 2 - 1, dtype)
                      for t in (32, 64, 128))

        timeit(f"flownet[{name}]",
               chain(lambda c, fv: models.flownet.apply(fv, c, train=False)[0],
                     lambda o, c: c * 0.5 + jnp.concatenate([o, o[..., :1]], -1) * 0.5),
               img, fv)
        timeit(f"generator[{name}]",
               chain(lambda c, gv, fl: models.gen.apply(gv, c, fl, train=False)[2],
                     lambda o, c: o),
               img, gv, flows)
        timeit(f"guided_filter_r32[{name}]",
               chain(lambda c, y: guided_filter(c, y, gf_radius(s)),
                     lambda o, c: o), img, img2)

        # the generator's three WAM warp geometries (enc skips e2/e1/e0)
        for (sz, c) in ((32, 128), (64, 64), (128, 64)):
            feat = jnp.asarray(r.rand(BATCH, sz, sz, c), dtype)
            grid = jnp.asarray(r.rand(BATCH, sz, sz, 2) * 2 - 1, dtype)
            timeit(f"warp_{sz}x{sz}x{c}[{name}]",
                   chain(lambda cc, g: grid_sample(cc, g), lambda o, cc: o),
                   feat, grid)

        # matched conv: one 3x3 64->64 at 128^2 (what the MXU gives us here)
        k = jnp.asarray(r.rand(3, 3, 64, 64) * 0.01, dtype)
        feat = jnp.asarray(r.rand(BATCH, s, s, 64), dtype)
        timeit(f"conv3x3_64ch_128[{name}]",
               chain(lambda c, kk: jnp.tanh(jax.lax.conv_general_dilated(
                   c, kk, (1, 1), "SAME",
                   dimension_numbers=("NHWC", "HWIO", "NHWC"))),
                   lambda o, c: o), feat, k)

    # XLA formulations of the CUDA-extension ops (pallas ship-or-kill record)
    src = jnp.asarray(r.rand(BATCH, 64, 64, 64), jnp.float32)
    flw = jnp.asarray(r.randn(BATCH, 64, 64, 2) * 3, jnp.float32)
    timeit("resample2d_xla_64x64x64",
           chain(lambda c, f: resample2d(c, f, 2.0, kernel_size=4, dilation=1),
                 lambda o, c: o), src, flw)
    src8 = jnp.asarray(r.rand(BATCH, 64, 64, 8), jnp.float32)
    timeit("block_extractor_xla_k3",
           chain(lambda c, f: block_extractor(c, f, kernel_size=3)[:, :64, :64, :],
                 lambda o, c: o), src8, flw)

    dev = jax.devices()[0]
    print(json.dumps({"device": f"{dev.platform}:{dev.device_kind}",
                      "iters": ITERS, "batch": BATCH, "ms_per_img": RESULTS}))


if __name__ == "__main__":
    main()
