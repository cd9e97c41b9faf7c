#!/usr/bin/env python
"""Overfit-to-quality proof: the full system LEARNS, end-to-end (VERDICT r3 #1).

Convergence smokes show losses decrease; this tool shows the GAN + flow +
identity stack actually *solves* a frontalization task. It runs the
reference's five-stage recipe (README.md:95-124) with the REAL CLI mains on
a deterministic tiny Multi-PIE-format dataset (8 synthetic identities, all
12 profile cameras, 64 px), trains until the system overfits, then evaluates
with the real test_ffwm.py protocol on held-in probes (same identities /
poses, fresh noise instance):

    1. finetune_lightcnn.py  — identity features that separate the 8 ids
    2. train_flow.py         — forward flow
    3. train_flow.py --reverse — reverse flow
    4. train_ffwm.py         — consumes all three stage outputs
    5. test_ffwm.py          — rank-1 on held-in probes (target >= 90%)
       + masked L1(fake_F128, img_F) over the training pairs (target <= floor)

Pass criteria (defaults; see --help): overall rank-1 >= 0.90 and masked L1
<= 0.035 (the train-probe masked L1 of random-init netG is ~0.25 on this
data, so the floor is ~7x below start). Prints one JSON line; exit 0 iff ok.

Reference semantics targeted: /root/reference/test_ffwm.py:60-72 (protocol),
util/util.py:141-181 (meter). Recorded real-chip run (BASELINE.md round-5):
rank-1 1.0 (104/104), masked L1 0.0079, ok=true — after fixing the two
synthetic-supervision bugs the round-5 run exposed (landmark keying across
views; img_size scale divisors, see losses/landmark.py).

Run (TPU ~50 min warm cache, dominated by the 160-epoch GAN stage):
    python tools/overfit_proof.py --workdir /tmp/overfit
"""

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ffwm_tpu.hostcache import configure_cache

configure_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

ALL_CAMERAS = ("051", "050", "140", "041", "130", "080", "190", "090",
               "200", "010", "120", "110", "240")


def parse_args():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--workdir", default="/tmp/overfit_proof")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--ids", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lightcnn_epochs", type=int, default=3)
    # defaults = the recorded passing configuration (BASELINE.md round-5):
    # 40/160 epochs reach rank-1 1.0 / masked L1 0.0079; at 15/40 the GAN
    # stage is still mid-descent (rank-1 0.20, L1 0.098)
    p.add_argument("--flow_epochs", type=int, default=40)
    p.add_argument("--ffwm_epochs", type=int, default=160)
    p.add_argument("--rank1_floor", type=float, default=0.90)
    p.add_argument("--l1_ceiling", type=float, default=0.035)
    p.add_argument("--skip_to", default="",
                   help="resume at a stage (lightcnn|flowf|flowb|ffwm|eval) "
                        "reusing the workdir's earlier-stage checkpoints")
    return p.parse_args()


def run_cli(module_name, argv):
    mod = __import__(module_name)
    old = sys.argv
    sys.argv = [module_name + ".py"] + argv
    t0 = time.time()
    try:
        mod.main()
    finally:
        sys.argv = old
    print(f"# stage {module_name} {argv[:2]} done in {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)


def masked_l1(ck, name, dataroot, size, batch):
    """Mean masked per-pixel L1 between generated frontal and GT frontal
    over the TRAINING pairs (the overfit target — reference backward_G's
    primary reconstruction term, models/ffwm_model.py:107-115)."""
    from ffwm_tpu.data import create_dataset
    from ffwm_tpu.engine import build_models, make_ffwm_inference
    from ffwm_tpu.engine.checkpoint import restore_tree

    models = build_models()
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in
                   (size // 4, size // 2, size))
    flow_init = jax.jit(
        lambda k: models.flownet.init(k, x, train=False))(jax.random.PRNGKey(0))
    gen_init = jax.jit(
        lambda k: models.gen.init(k, x, flows0, train=False))(jax.random.PRNGKey(1))
    flow_vars = restore_tree(ck, name, "latest_net_flowNetF",
                             target=jax.tree.map(np.asarray, flow_init))
    gen_vars = restore_tree(ck, name, "latest_net_netG",
                            target=jax.tree.map(np.asarray, gen_init))
    infer = make_ffwm_inference(models)

    loader = create_dataset(dataroot, phase="train", batch_size=batch,
                            load_size=size, aug=False, shuffle=False, seed=0)
    tot, n = 0.0, 0
    for b in loader:
        if b["img_S"].shape[0] != batch:
            continue
        out = infer(flow_vars, gen_vars, jnp.asarray(b["img_S"]),
                    jnp.asarray(b["img_F"]))
        fake = np.asarray(out["fake_F128"])
        diff = np.abs(fake * b["mask_F"] - b["img_F"] * b["mask_F"])
        tot += float(diff.mean()) * b["img_S"].shape[0]
        n += b["img_S"].shape[0]
    return tot / max(n, 1)


def main():
    args = parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    dataroot = os.path.join(args.workdir, "dataset")
    ck = os.path.join(args.workdir, "checkpoints")
    stages = ["lightcnn", "flowf", "flowb", "ffwm", "eval"]
    start = stages.index(args.skip_to) if args.skip_to else 0

    if not os.path.isdir(os.path.join(dataroot, "multipie")):
        from ffwm_tpu.data.synthetic import make_synthetic_multipie

        # held-in probes: the test split regenerates the SAME identity seeds
        # (1000+i) and poses with a fresh noise instance
        make_synthetic_multipie(dataroot, n_ids=args.ids, cameras=ALL_CAMERAS,
                                size=args.size, n_test_ids=args.ids)
        print(f"# dataset: {args.ids} ids x {len(ALL_CAMERAS)} cameras "
              f"@ {args.size}px", file=sys.stderr)

    # the finetune CLI writes .pth snapshots every 5 epochs but the orbax
    # 'latest' every epoch — use the latter so the FULL finetune is what
    # feeds the identity loss and the eval (the .pth-every-5 naming silently
    # handed a 1-epoch LightCNN to both in the first round-4 run)
    lightcnn_ck = os.path.join(ck, "lightCNN_latest_checkpoint.ckpt")
    if start <= stages.index("lightcnn"):
        run_cli("finetune_lightcnn", [
            "--dataroot", dataroot, "--save_path", ck,
            "--batch-size", str(args.batch), "--epochs",
            str(args.lightcnn_epochs), "--num_classes", str(args.ids),
            "--load_size", str(args.size), "--print-freq", "10000"])

    for tag, stage, extra in (("flownetf", "flowf", []),
                              ("flownetb", "flowb", ["--reverse"])):
        if start <= stages.index(stage):
            run_cli("train_flow", [
                "--dataroot", dataroot, "--name", tag,
                "--checkpoints_dir", ck, "--batch_size", str(args.batch),
                "--load_size", str(args.size), "--niter",
                str(args.flow_epochs), "--niter_decay", "0",
                "--save_epoch_freq", str(args.flow_epochs),
                # per-epoch 'latest' saves device_get the full state; on a
                # tunneled dev chip that costs minutes/epoch — final-only
                "--save_latest_freq", "100000",
                "--print_freq", "960", "--seed", "0", "--preload"] + extra)

    if start <= stages.index("ffwm"):
        run_cli("train_ffwm", [
            "--dataroot", dataroot, "--name", "ffwm",
            "--checkpoints_dir", ck, "--batch_size", str(args.batch),
            # constant lr (linear policy, no decay epochs): the default
            # step x0.5/3-epochs schedule collapses the lr to ~1e-5 by
            # epoch 15 and freezes the overfit mid-descent (measured:
            # loss_l1 plateaus at ~1.3 from epoch 5)
            "--lr_policy", "linear",
            "--save_latest_freq", "100000",  # final-only (see flow stages)
            "--load_size", str(args.size), "--niter", str(args.ffwm_epochs),
            "--niter_decay", "0", "--save_epoch_freq", str(args.ffwm_epochs),
            "--print_freq", "960", "--display_freq", "100000", "--seed", "0",
            "--preload",
            "--flownetf", os.path.join(ck, "flownetf",
                                       f"{args.flow_epochs}_net_flowNet"),
            "--flownetb", os.path.join(ck, "flownetb",
                                       f"{args.flow_epochs}_net_flowNet"),
            "--lightcnn", lightcnn_ck])

    # ---- stage 5: the real eval protocol on the held-in test split
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        run_cli("test_ffwm", [
            "--dataroot", dataroot, "--name", "ffwm",
            "--checkpoints_dir", ck, "--batch_size", str(args.batch),
            "--load_size", str(args.size), "--lightcnn", lightcnn_ck])
    eval_out = buf.getvalue()
    print(eval_out, file=sys.stderr)
    # aggregate the per-camera meter lines "cam: [correct/all, acc]"
    correct = total = 0
    for c, a in re.findall(r"^\d{3}: \[(\d+)/(\d+),", eval_out, re.M):
        correct += int(c)
        total += int(a)
    rank1 = correct / max(total, 1)

    l1 = masked_l1(ck, "ffwm", dataroot, args.size, args.batch)
    ok = rank1 >= args.rank1_floor and l1 <= args.l1_ceiling
    print(json.dumps({
        "rank1": round(rank1, 4), "rank1_n": total,
        "masked_l1": round(l1, 5),
        "rank1_floor": args.rank1_floor, "l1_ceiling": args.l1_ceiling,
        "train_steps_ffwm": args.ffwm_epochs * (args.ids * (len(ALL_CAMERAS) - 1) * 2 // args.batch),
        "ok": ok,
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
