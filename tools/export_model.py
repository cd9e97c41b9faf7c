#!/usr/bin/env python
"""Export the FFWM inference path as a serialized StableHLO artifact.

The serving story the reference lacks: `jax.export` captures the whole
jitted test path (flowNetF -> WAM generator -> guided filter) — weights
baked in — as a self-contained, ahead-of-time-lowered StableHLO module
that any PJRT runtime (TPU serving binaries, `jax.export.deserialize`,
IFRT servers) can load WITHOUT the Python model code, this repo, or
checkpoint files.

Notes:
- Batch size is baked (static shapes keep the Mosaic warp kernel and XLA's
  tiling optimal; export one artifact per serving batch).
- When exported ON a TPU host the compiled Mosaic warp kernel (and its
  GSPMD batch-partitioning spec) is serialized into the module; exported
  from a CPU host the trace takes the pure-XLA warp (numerically
  identical, see ops/warp.py) — pass --platforms tpu,cpu for a
  multi-platform artifact.
- Round-trip is verified after writing: the artifact is deserialized and
  run against the live jitted function on the export host.

Usage:
  python tools/export_model.py --checkpoints_dir ck --name ffwm \
      --out ffwm_infer_b128.shlo --batch 128
  python tools/export_model.py --random --batch 2 --size 64 --out t.shlo
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.hostcache import configure_cache

configure_cache(REPO)  # persistent compile cache: repeat exports trace-only


def build_baked_infer(opt):
    from ffwm_tpu.engine import build_models, make_ffwm_inference

    models = build_models()
    s = opt.size
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    flow_vars = models.flownet.init(jax.random.PRNGKey(0), x, train=False)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (s // 4, s // 2, s))
    gen_vars = models.gen.init(jax.random.PRNGKey(1), x, flows0, train=False)

    if not opt.random:
        from test_ffwm import load_variables  # repo root on sys.path (top)

        class O:  # the loader helper only reads these three fields
            checkpoints_dir, name, epoch = opt.checkpoints_dir, opt.name, opt.epoch

        flow_vars = load_variables(O, "flowNetF", "flownet", flow_vars)
        gen_vars = load_variables(O, "netG", "ffwm", gen_vars)

    infer = make_ffwm_inference(
        models, dtype=jnp.bfloat16 if opt.bf16 else jnp.float32)

    @jax.jit
    def serve(img_s, img_f):
        out = infer(flow_vars, gen_vars, img_s, img_f)
        return {"fake_F128": out["fake_F128"], "img_GF128": out["img_GF128"]}

    return serve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints_dir", default="checkpoints")
    ap.add_argument("--name", default="ffwm")
    ap.add_argument("--epoch", default="latest")
    ap.add_argument("--random", action="store_true",
                    help="export with random-init weights (pipeline tests)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. 'tpu,cpu'; default = export host")
    ap.add_argument("--device", default="auto", choices=("auto", "cpu"),
                    help="backend to trace/verify on (cpu = hermetic, no TPU "
                    "tunnel; the ambient JAX_PLATFORMS env is overridden by "
                    "the axon plugin, so this uses jax.config)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    serve = build_baked_infer(args)
    spec = jax.ShapeDtypeStruct((args.batch, args.size, args.size, 3),
                                jnp.float32)
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 or None)
    exported = jax.export.export(serve, platforms=platforms)(spec, spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, "
          f"platforms={exported.platforms}, "
          f"in={[str(a.shape) for a in exported.in_avals]}")

    # round-trip verification on the export host
    r = np.random.RandomState(0)
    img_s = jnp.asarray(r.rand(args.batch, args.size, args.size, 3), jnp.float32)
    img_f = jnp.asarray(r.rand(args.batch, args.size, args.size, 3), jnp.float32)
    reloaded = jax.export.deserialize(open(args.out, "rb").read())
    got = jax.jit(reloaded.call)(img_s, img_f)
    want = serve(img_s, img_f)
    err = max(float(jnp.abs(got[k] - want[k]).max()) for k in want)
    print(f"round-trip max abs err vs live jit: {err:.2e}")
    assert err < 1e-5, err


if __name__ == "__main__":
    main()
