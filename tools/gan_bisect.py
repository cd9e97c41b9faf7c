#!/usr/bin/env python
"""Bisect the FFWM GAN train step: time the G-grad with each loss component
in isolation to find what dominates the 2 s/step (b=8, 128 px)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ffwm_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.engine.common import NetState
from ffwm_tpu.engine.ffwm_model import _g_forward, build_models, gf_radius
from ffwm_tpu.losses import gan_loss, identity_loss, illumination_loss, perceptual_loss
from ffwm_tpu.ops.filters import guided_filter
from ffwm_tpu.ops.resize import resize_bilinear, resize_nearest

B, S = 8, 128


def main():
    models = build_models()
    r = np.random.RandomState(0)
    x1 = jnp.zeros((1, S, S, 3), jnp.float32)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (32, 64, 128))
    ff = NetState.from_variables(models.flownet.init(jax.random.PRNGKey(0), x1, train=True))
    fb = NetState.from_variables(models.flownet.init(jax.random.PRNGKey(1), x1, train=True))
    gen = NetState.from_variables(models.gen.init(jax.random.PRNGKey(2), x1, flows0, train=True))
    disc_vars = models.disc.init(jax.random.PRNGKey(3), x1, train=True)
    lc = models.lightcnn.init(jax.random.PRNGKey(4), jnp.zeros((1, S, S, 1)))
    vgg = models.vgg.init(jax.random.PRNGKey(5), x1)

    img_s = jnp.asarray(r.rand(B, S, S, 3), jnp.float32)
    img_f = jnp.asarray(r.rand(B, S, S, 3), jnp.float32)
    lm_f = jnp.asarray(r.randint(0, S, (B, 580, 2)), jnp.int32)
    mask_f = jnp.asarray((r.rand(B, S, S, 1) > 0.2), jnp.float32)
    mask_s = jnp.asarray((r.rand(B, S, S, 1) > 0.2), jnp.float32)

    feats = lambda img: models.vgg.apply(vgg, img)
    lcnn = lambda img: models.lightcnn.apply(lc, img)

    def make_loss(which):
        def loss_fn(params):
            f2 = NetState(params[0], ff.extra)
            b2 = NetState(params[1], fb.extra)
            g2 = NetState(params[2], gen.extra)
            fwd, _ = _g_forward(models, f2, b2, g2, img_s, img_f, lm_f)
            fake128, fake64, fake32 = fwd["fakes"]
            gf128 = fwd["gf128"]
            if which == "forward_only":
                return jnp.mean(gf128) + jnp.mean(fake64) + jnp.mean(fake32)
            if which == "l1":
                img_f64 = resize_bilinear(img_f, (64, 64))
                img_f32 = resize_bilinear(img_f, (32, 32))
                m64 = resize_nearest(mask_f, (64, 64))
                m32 = resize_nearest(mask_f, (32, 32))
                gf64 = guided_filter(fake64, img_f64, 16)
                gf32 = guided_filter(fake32, img_f32, 8)
                return (jnp.mean(jnp.abs(gf128 * mask_f - img_f * mask_f))
                        + jnp.mean(jnp.abs(gf64 * m64 - img_f64 * m64))
                        + 1.5 * jnp.mean(jnp.abs(gf32 * m32 - img_f32 * m32)))
            if which == "prc":
                return perceptual_loss(feats, gf128 * mask_f, img_f * mask_f)
            if which == "illu":
                return illumination_loss(fwd["flows_b"],
                                         (fake128, fake64, fake32), img_s, mask_s)
            if which == "iden":
                return identity_loss(lcnn, fake128, img_f)
            if which == "adv":
                pred = models.disc.apply(disc_vars, gf128 * mask_f, train=False)
                return gan_loss(pred, True, "lsgan")
            if which == "fc":
                p = fwd["parts"]
                return (perceptual_loss(feats, p["eyelg"], p["eyelgt"])
                        + perceptual_loss(feats, p["mouthg"], p["mouthgt"]))
            raise ValueError(which)
        return loss_fn

    params = (ff.params, fb.params, gen.params)
    for which in ("forward_only", "l1", "prc", "illu", "iden", "adv", "fc"):
        g = jax.jit(jax.grad(make_loss(which)))
        out = g(params)
        jax.device_get(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(3):
            out = g(params)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / 3
        print(f"grad[{which:>12}]: {dt * 1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
