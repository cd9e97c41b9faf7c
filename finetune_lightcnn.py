#!/usr/bin/env python
"""Finetune LightCNN-29 on Multi-PIE — TPU-native.

CLI-compatible rebuild of lightcnn/finetune.py: cross-entropy SGD with the
per-parameter-group learning rates of the reference (fc2 x10/x20, biases x2,
weight decay on weights only), step decay x0.457 every 25 epochs, rank-1
validation against a one-frontal-per-identity gallery, checkpoints named
``lightCNN_{epoch}_checkpoint``.

Example:
    python finetune_lightcnn.py --dataroot ./dataset --model_path \
        ./checkpoints/LightCNN_29Layers_checkpoint.pth --save_path ./checkpoints
"""

import argparse
import os
import time
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.data import DataLoader, LightCNNDataset
from ffwm_tpu.engine.checkpoint import save_pth, save_tree
from ffwm_tpu.engine.common import set_lr
from ffwm_tpu.engine.lightcnn_finetune import (
    create_lightcnn_train_state,
    finetune_lr,
    make_lightcnn_feature_fn,
    make_lightcnn_train_step,
)
from ffwm_tpu.parallel import (
    check_batch_divisible,
    make_mesh,
    replicate,
    shard_batch,
)
from ffwm_tpu.utils import Rank1Meter
from ffwm_tpu.utils.convert import load_pth


def parse_args():
    p = argparse.ArgumentParser(description="TPU LightCNN finetune")
    p.add_argument("--epochs", default=80, type=int)
    p.add_argument("--start-epoch", default=0, type=int)
    p.add_argument("-b", "--batch-size", default=10, type=int)
    p.add_argument("--lr", default=0.0001, type=float)
    p.add_argument("--momentum", default=0.9, type=float)
    p.add_argument("--weight-decay", default=1e-4, type=float)
    p.add_argument("--print-freq", default=5000, type=int)
    p.add_argument("--num_classes", default=79077, type=int)
    p.add_argument("--model_path", default="", type=str,
                   help="pretrained LightCNN .pth")
    p.add_argument("--save_path", default="./checkpoints", type=str)
    p.add_argument("--dataroot", default="./dataset", type=str)
    p.add_argument("--load_size", default=128, type=int,
                   help="gray image size (128 matches the reference and the "
                        "released checkpoints; smaller only for smoke tests)")
    p.add_argument("--crop", action="store_true")
    p.add_argument("--preload", action="store_true")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--multihost", action="store_true",
                   help="multi-process (TPU pod) run: call "
                        "jax.distributed.initialize() and shard the train "
                        "epoch across processes")
    return p.parse_args()


def validate(feature_fn, params, val_loader, gallery_dict, chief=True):
    """Rank-1 validation vs the one-frontal-per-identity gallery.

    Multi-host: ``params`` is host-local here (the caller device_gets the
    replicated state), so every process validates the full val set as a
    purely local computation — no collective, no cross-process symmetry
    requirement — and only the chief prints. Redundant per-host compute,
    but validation is tiny next to a finetune epoch.
    """
    keys = list(gallery_dict.keys())
    gallery = jnp.asarray(np.stack([gallery_dict[k] for k in keys]))
    gallery_feas = np.asarray(feature_fn(params, gallery))
    meter = Rank1Meter()
    for batch in val_loader:
        feas = np.asarray(feature_fn(params, jnp.asarray(batch["image"])))
        meter.update(feas, batch["input_path"], gallery_feas, keys)
    if chief:
        print(meter)
    return meter.overall()


def host_local_params(state, nproc: int):
    """Params usable in per-host (non-global) programs: replicated global
    arrays are fully addressable, so device_get is a local copy."""
    return jax.device_get(state.net.params) if nproc > 1 else state.net.params


def main():
    args = parse_args()
    if args.multihost:
        jax.distributed.initialize()  # TPU pods auto-detect coordinates
    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    rank, nproc = jax.process_index(), jax.process_count()
    is_chief = rank == 0
    check_batch_divisible(args.batch_size, n_dev, flag="--batch-size")
    # multi-host: --batch-size stays the GLOBAL batch, like the trainers —
    # each process loads a disjoint 1/nproc slice of the identically-seeded
    # shuffled epoch and shard_batch assembles the global arrays.
    local_bs = args.batch_size // nproc
    if nproc > 1 and is_chief:
        print(f"multi-host: {nproc} processes, {local_bs} images/host")

    pretrained = None
    if args.model_path and os.path.exists(args.model_path):
        if is_chief:
            print(f"loading pretrained LightCNN from {args.model_path}")
        pretrained = load_pth(args.model_path, "lightcnn")
    model, state, tx = create_lightcnn_train_state(
        jax.random.PRNGKey(args.seed), num_classes=args.num_classes,
        pretrained_vars=pretrained, lr=args.lr, image_size=args.load_size)

    train_ds = LightCNNDataset(args.dataroot, "train", crop=args.crop,
                               load_size=args.load_size, seed=args.seed)
    val_ds = LightCNNDataset(args.dataroot, "test", crop=args.crop,
                             load_size=args.load_size, aug=False,
                             seed=args.seed)
    train_loader = DataLoader(train_ds, batch_size=local_bs,
                              shuffle=True, drop_last=True, seed=args.seed,
                              process_shard=(rank, nproc) if nproc > 1 else None)
    # val loader is NOT process-sharded: validate() runs host-locally on the
    # full set (see its docstring), so every host needs every val image
    val_loader = DataLoader(val_ds, batch_size=local_bs, shuffle=False)

    step_fn = make_lightcnn_train_step(model, tx)
    feature_fn = make_lightcnn_feature_fn(model)
    state = replicate(state, mesh)

    validate(feature_fn, host_local_params(state, nproc), val_loader,
             val_ds.gallery_dict, chief=is_chief)

    rng = jax.random.PRNGKey(args.seed + 1)
    it = 0
    for epoch in range(args.start_epoch, args.epochs):
        lr = finetune_lr(args.lr, epoch)
        state = state.replace(opt_state=set_lr(state.opt_state, lr))
        t0 = time.time()
        for batch in train_loader:
            # batches are always full and mesh-divisible here: the loader
            # runs drop_last=True and check_batch_divisible gates startup
            fb = {"image": batch["image"], "label": batch["label"]}
            fb = shard_batch(fb, mesh)
            rng, drng = jax.random.split(rng)
            state, metrics = step_fn(state, fb, drng)
            it += 1
            if is_chief and it % max(args.print_freq // args.batch_size, 1) == 0:
                m = jax.device_get(metrics)
                print(f"epoch {epoch} it {it}: loss {float(m['loss']):.4f} "
                      f"top1 {float(m['top1']):.3f} top5 {float(m['top5']):.3f}")
        if is_chief:
            print(f"epoch {epoch} done in {time.time() - t0:.0f}s (lr {lr:.2e})")
        validate(feature_fn, host_local_params(state, nproc), val_loader,
                 val_ds.gallery_dict, chief=is_chief)

        # orbax save_tree is a COLLECTIVE in multi-process runs (every host
        # calls it; see train_ffwm.py); only the .pth export is chief-only
        host = jax.device_get(state)
        # epoch % 5 == 0 with the {epoch+1} name (-> 1, 6, 11, ...) is the
        # reference's own cadence, preserved verbatim
        # (lightcnn/finetune.py:126-128); the canonical
        # lightCNN_10_checkpoint.pth came from elsewhere. 'latest' is
        # written every epoch like the reference's line 129.
        if epoch % 5 == 0:
            save_tree(args.save_path, "", f"lightCNN_{epoch + 1}_checkpoint",
                      host.net.variables)
            if is_chief:
                save_pth(host.net.variables, "lightcnn",
                         join(args.save_path, f"lightCNN_{epoch + 1}_checkpoint.pth"))
        save_tree(args.save_path, "", "lightCNN_latest_checkpoint",
                  host.net.variables)


if __name__ == "__main__":
    main()
