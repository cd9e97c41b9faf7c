#!/usr/bin/env python
"""One-command real-data acceptance runbook (VERDICT r4 #6).

The day the released reference checkpoints and Multi-PIE arrive, this single
command runs the full acceptance chain and emits ONE JSON line:

    python tools/acceptance.py \
        --netg ck/latest_net_netG.pth --flownetf ck/latest_net_flowNetF.pth \
        --lightcnn ck/lightCNN_10_checkpoint.pth \
        --dataroot dataset --workdir /tmp/acceptance --rank1_floor 0.98

Stages (each maps to a reference protocol):
  1. convert  — torch .pth -> flax variables via the shape-validated
     converter (ffwm_tpu.utils.convert; reference checkpoint layout:
     /root/reference/README.md:62-67)
  2. parity   — fake_F128 divergence vs the LIVE reference torch model on
     the first --num_parity test images; gate < 1e-3 mean abs
     (BASELINE.json; skipped with --no_torch_check when the reference repo
     is not importable)
  3. rank-1   — the full test_ffwm.py Multi-PIE protocol (gallery LightCNN
     features, per-pose rank-1; reference test_ffwm.py:60-72,
     util/util.py:141-181)

Output JSON keys: parity_mean, parity_max, parity_ok, rank1, rank1_n,
rank1_per_camera, ok. Exit 0 iff every enabled gate passed
(parity < 1e-3; rank1 >= --rank1_floor when given).

Dry run against synthetic data (validates the mechanics end-to-end today —
random-init weights, so pass --rank1_floor 0 or omit it):

    python tools/acceptance.py --synthetic --workdir /tmp/acceptance_dry
"""

import argparse
import contextlib
import io
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from ffwm_tpu.hostcache import configure_cache

configure_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--netg", help="released latest_net_netG.pth")
    p.add_argument("--flownetf", help="released latest_net_flowNetF.pth")
    p.add_argument("--lightcnn",
                   help="LightCNN checkpoint (.pth or orbax .ckpt dir)")
    p.add_argument("--dataroot",
                   help="dataset root containing multipie/test/{images,masks}")
    p.add_argument("--workdir", default="/tmp/ffwm_acceptance")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--load_size", type=int, default=128)
    p.add_argument("--num_parity", type=int, default=16)
    p.add_argument("--rank1_floor", type=float, default=None,
                   help="overall rank-1 gate; omit to report without gating")
    p.add_argument("--no_torch_check", action="store_true",
                   help="skip the live-reference parity check (reference "
                        "repo unavailable)")
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--synthetic", action="store_true",
                   help="dry run: synthetic Multi-PIE + random-init exported "
                        ".pth pair, exercising every stage's mechanics")
    return p.parse_args()


def make_synthetic_inputs(args):
    """Build the dry-run inputs: synthetic 128px Multi-PIE, a random-init
    netG/flowNetF exported to reference-format .pth (so the CONVERT stage is
    genuinely exercised), and an orbax LightCNN checkpoint."""
    import jax.numpy as jnp
    import numpy as np

    from ffwm_tpu.data.synthetic import make_synthetic_multipie
    from ffwm_tpu.engine import build_models
    from ffwm_tpu.engine.checkpoint import save_pth, save_tree

    dataroot = os.path.join(args.workdir, "dataset")
    if not os.path.isdir(os.path.join(dataroot, "multipie")):
        make_synthetic_multipie(dataroot, n_ids=3, size=args.load_size,
                                n_test_ids=3)
    ck = os.path.join(args.workdir, "inputs")
    models = build_models()
    s = args.load_size
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (s // 4, s // 2, s))
    flow_vars = jax.jit(
        lambda k: models.flownet.init(k, x, train=False))(jax.random.PRNGKey(0))
    gen_vars = jax.jit(
        lambda k: models.gen.init(k, x, flows0, train=False))(jax.random.PRNGKey(1))
    lc_vars = jax.jit(lambda k: models.lightcnn.init(
        k, jnp.zeros((1, s, s, 1))))(jax.random.PRNGKey(2))
    lc_vars = jax.tree.map(np.asarray, lc_vars)
    args.flownetf = os.path.join(ck, "latest_net_flowNetF.pth")
    args.netg = os.path.join(ck, "latest_net_netG.pth")
    save_pth(flow_vars, "flownet", args.flownetf)
    save_pth(gen_vars, "ffwm", args.netg)
    save_tree(ck, "", "lightCNN_acceptance", lc_vars)
    args.lightcnn = os.path.join(ck, "lightCNN_acceptance")
    args.dataroot = dataroot
    print(f"# synthetic inputs under {ck}", file=sys.stderr)


def main():
    args = parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    if args.synthetic:
        make_synthetic_inputs(args)
    missing = [k for k in ("netg", "flownetf", "lightcnn", "dataroot")
               if not getattr(args, k)]
    if missing:
        print(f"error: missing required inputs: {missing} "
              "(or pass --synthetic for a dry run)", file=sys.stderr)
        sys.exit(2)

    result = {}

    # ---- stages 1+2: convert (shape-validated) + parity vs live torch ref
    import parity_dump

    torch_check = (not args.no_torch_check and
                   os.path.isdir(os.path.join(args.reference, "models")))
    # keep stdout pure (the documented contract is ONE JSON line on stdout):
    # parity_dump narrates its progress via print — route it to stderr
    with contextlib.redirect_stdout(sys.stderr):
        div = parity_dump.run(
            args.flownetf, args.netg,
            os.path.join(args.dataroot, "multipie", "test", "images"),
            num=args.num_parity,
            out=os.path.join(args.workdir, "golden_fake_F128.npz"),
            torch_check=torch_check, reference=args.reference)
    if div is None:
        result.update(parity_mean=None, parity_max=None, parity_ok=None)
    else:
        result.update(parity_mean=div["mean"], parity_max=div["max"],
                      parity_ok=div["mean"] < 1e-3)

    # ---- stage 3: the real eval CLI (checkpoints staged under the layout
    # test_ffwm.py expects: {checkpoints_dir}/{name}/latest_net_*.pth)
    ckdir = os.path.join(args.workdir, "checkpoints", "ffwm")
    os.makedirs(ckdir, exist_ok=True)
    for src, tag in ((args.netg, "netG"), (args.flownetf, "flowNetF")):
        dst = os.path.join(ckdir, f"latest_net_{tag}.pth")
        if os.path.abspath(src) != os.path.abspath(dst):
            shutil.copyfile(src, dst)

    import test_ffwm

    argv_save = sys.argv
    sys.argv = ["test_ffwm.py",
                "--dataroot", args.dataroot,
                "--name", "ffwm",
                "--checkpoints_dir", os.path.join(args.workdir, "checkpoints"),
                "--batch_size", str(args.batch_size),
                "--load_size", str(args.load_size),
                "--lightcnn", args.lightcnn]
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            test_ffwm.main()
    finally:
        sys.argv = argv_save
    eval_out = buf.getvalue()
    print(eval_out, file=sys.stderr)

    per_cam = {}
    correct = total = 0
    for cam, c, a in re.findall(r"^(\d{3}): \[(\d+)/(\d+),", eval_out, re.M):
        per_cam[cam] = int(c) / max(int(a), 1)
        correct += int(c)
        total += int(a)
    result["rank1"] = round(correct / max(total, 1), 4)
    result["rank1_n"] = total
    result["rank1_per_camera"] = {k: round(v, 4)
                                  for k, v in sorted(per_cam.items())}

    gates = []
    if result["parity_ok"] is not None:
        gates.append(result["parity_ok"])
    if args.rank1_floor is not None:
        gates.append(result["rank1"] >= args.rank1_floor)
        result["rank1_floor"] = args.rank1_floor
    result["ok"] = all(gates) if gates else True
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)


if __name__ == "__main__":
    main()
