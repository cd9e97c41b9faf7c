#!/usr/bin/env python
"""Component ablation of the inference path on the real chip.

Times each stage with the chained-scan + scalar-fetch methodology (see
bench.py) to locate the bottleneck: flownet convs, generator (convs + 3
warps + flips), guided filter, and an isolated grid-sample warp.
"""

import sys
import time

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ffwm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.engine.ffwm_model import build_models, gf_radius
from ffwm_tpu.ops.filters import guided_filter
from ffwm_tpu.ops.warp import grid_sample

ITERS = 8
BATCH = 64


def timeit(name, chained, *args):
    check = jax.device_get(chained(*args))
    assert np.isfinite(np.asarray(check)).all(), name
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(chained(*args))
        best = min(best, time.perf_counter() - t0)
    per_img_ms = best / (ITERS * BATCH) * 1e3
    print(f"{name:>24}: {best:7.3f}s for {ITERS}x{BATCH} -> "
          f"{per_img_ms:6.3f} ms/img, {1e3 / per_img_ms:8.1f} img/s",
          flush=True)
    return per_img_ms


def main():
    models = build_models()
    s = 128
    r = np.random.RandomState(0)
    x1 = jnp.zeros((1, s, s, 3), jnp.float32)
    fv = models.flownet.init(jax.random.PRNGKey(0), x1, train=False)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (32, 64, 128))
    gv = models.gen.init(jax.random.PRNGKey(1), x1, flows0, train=False)

    img = jnp.asarray(r.rand(BATCH, s, s, 3), jnp.float32)
    img2 = jnp.asarray(r.rand(BATCH, s, s, 3), jnp.float32)
    flows = tuple(jnp.asarray(r.rand(BATCH, t, t, 2) * 2 - 1, jnp.float32)
                  for t in (32, 64, 128))

    @jax.jit
    def flow_chained(fv, x):
        def body(c, _):
            f128, f64, f32 = models.flownet.apply(fv, c, train=False)
            nxt = c * 0.5 + jnp.concatenate(
                [f128, f128[..., :1]], -1) * 0.5  # keep carry 3ch, data-dep
            return nxt, ()
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.mean(out)

    @jax.jit
    def gen_chained(gv, x, flows):
        def body(c, _):
            _, _, fake = models.gen.apply(gv, c, flows, train=False)
            return fake, ()
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.mean(out)

    @jax.jit
    def gf_chained(x, y):
        def body(c, _):
            return guided_filter(c, y, gf_radius(s)), ()
        out, _ = jax.lax.scan(body, x, None, length=ITERS)
        return jnp.mean(out)

    big_feat = jnp.asarray(r.rand(BATCH, s, s, 64), jnp.float32)

    @jax.jit
    def warp_chained(feat, grid):
        def body(c, _):
            w = grid_sample(c, grid)
            return w, ()
        out, _ = jax.lax.scan(body, feat, None, length=ITERS)
        return jnp.mean(out)

    @jax.jit
    def conv_chained(feat):
        """Matched-bandwidth conv baseline: one 3x3 64->64 conv at 128^2."""
        k = jnp.asarray(r.rand(3, 3, 64, 64) * 0.01, jnp.float32)

        def body(c, _):
            y = jax.lax.conv_general_dilated(
                c, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.tanh(y), ()
        out, _ = jax.lax.scan(body, feat, None, length=ITERS)
        return jnp.mean(out)

    t_flow = timeit("flownet fwd", flow_chained, fv, img)
    t_gen = timeit("generator fwd", gen_chained, gv, img, flows)
    t_gf = timeit("guided filter r32", gf_chained, img, img2)
    t_warp = timeit("warp 128x128x64", warp_chained, big_feat, flows[2])
    t_conv = timeit("conv3x3 64ch baseline", conv_chained, big_feat)
    print(f"# sum flow+gen+gf = {t_flow + t_gen + t_gf:.3f} ms/img")


if __name__ == "__main__":
    main()
