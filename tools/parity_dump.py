#!/usr/bin/env python
"""Golden parity dump — BASELINE.md measurement task #2.

Given the released PyTorch checkpoints (latest_net_flowNetF.pth +
latest_net_netG.pth), runs the ffwm_tpu inference path on a batch of images
and writes fake_F128 tensors to .npz; with --torch-check (and the reference
repo importable) it also runs the reference model on CPU and reports the
mean-abs divergence against the <1e-3 gate.

    python tools/parity_dump.py --flownetf ckpt/latest_net_flowNetF.pth \
        --netg ckpt/latest_net_netG.pth --images dataset/multipie/test/images \
        --out golden.npz --torch-check
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def load_images(path, n, size=128):
    import cv2

    files = sorted(os.listdir(path))[:n]
    imgs = []
    for f in files:
        img = cv2.imread(os.path.join(path, f))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        if img.shape[:2] != (size, size):
            img = cv2.resize(img, (size, size))
        imgs.append(img.astype(np.float32) / 255.0)
    return np.stack(imgs), files


def run(flownetf, netg, images, num=16, out="golden_fake_F128.npz",
        torch_check=False, reference="/root/reference"):
    """Dump golden fake_F128 tensors; with torch_check, also return the
    divergence vs the live reference model as {'mean': ..., 'max': ...}."""
    from ffwm_tpu.engine import build_models, make_ffwm_inference
    from ffwm_tpu.utils.convert import load_pth

    models = build_models()
    flow_vars = load_pth(flownetf, "flownet")
    gen_vars = load_pth(netg, "ffwm")
    infer = make_ffwm_inference(models)

    imgs, files = load_images(images, num)
    res = infer(flow_vars, gen_vars, jnp.asarray(imgs), jnp.asarray(imgs))
    fake = np.asarray(res["fake_F128"])
    np.savez(out, fake_F128=fake, files=np.array(files))
    print(f"wrote {fake.shape} golden tensors to {out}")
    if not torch_check:
        return None

    import importlib.util

    import torch

    if not hasattr(np, "int"):
        np.int = int  # numpy 2.x shim for the 2020-era reference
    spec = importlib.util.spec_from_file_location(
        "ref_nets", os.path.join(reference, "models/base_networks.py"))
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    t_flow = ref.FlowNet(64).eval()
    t_flow.load_state_dict(torch.load(flownetf, map_location="cpu"))
    t_gen = ref.FFWM(sn=True).eval()
    t_gen.load_state_dict(torch.load(netg, map_location="cpu"))
    t_in = torch.from_numpy(np.ascontiguousarray(
        imgs.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        f128, f64, f32 = t_flow(t_in)
        _, _, ref_fake = t_gen(t_in, flow=[f32, f64, f128])
    div = np.abs(fake - ref_fake.numpy().transpose(0, 2, 3, 1))
    print(f"mean abs divergence: {div.mean():.2e} (gate: < 1e-3)  "
          f"max: {div.max():.2e}")
    return {"mean": float(div.mean()), "max": float(div.max())}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--flownetf", required=True)
    p.add_argument("--netg", required=True)
    p.add_argument("--images", required=True)
    p.add_argument("--num", type=int, default=16)
    p.add_argument("--out", default="golden_fake_F128.npz")
    p.add_argument("--torch-check", action="store_true",
                   help="also run the reference torch model and report the "
                        "mean abs divergence (<1e-3 gate)")
    p.add_argument("--reference", default="/root/reference")
    args = p.parse_args()
    div = run(args.flownetf, args.netg, args.images, args.num, args.out,
              args.torch_check, args.reference)
    if div is not None and div["mean"] >= 1e-3:
        sys.exit(1)


if __name__ == "__main__":
    main()
