#!/usr/bin/env python
"""Train a FlowNet (forward or --reverse) on Multi-PIE — TPU-native.

CLI-compatible rebuild of the reference train_flow.py: same flags
(--dataroot/--name/--batch_size/--niter/--reverse/--aug/...), same loss mix
(20*correctness + 0.01*affine-reg + landmark), same Adam(4e-4, 0.5/0.999)
and StepLR(0.5/3 epochs) defaults — but the whole optimize_parameters() is
one XLA program running data-parallel over a jax.sharding.Mesh.

Example:
    python train_flow.py --dataroot ./dataset --name flownetf --batch_size 6 --aug
    python train_flow.py --dataroot ./dataset --name flownetb --reverse --aug
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.data import create_dataset
from ffwm_tpu.engine import (
    create_flow_train_state,
    exists,
    make_flow_train_step,
    restore_tree,
    save_pth,
    save_tree,
    set_lr,
)
from ffwm_tpu.engine.schedule import PlateauTracker, get_lr
from ffwm_tpu.models import VGG19Features
from ffwm_tpu.options import print_and_save, train_parser
from ffwm_tpu.parallel import (
    check_batch_divisible,
    drop_remainder,
    make_mesh,
    replicate,
    shard_batch,
)
from ffwm_tpu.utils import Visualizer


def load_vgg(path: str, image_size: int):
    vgg = VGG19Features(max_layer="relu3_1")
    init_vars = vgg.init(jax.random.PRNGKey(42),
                         jnp.zeros((1, image_size, image_size, 3)))
    if path and os.path.exists(path):
        from ffwm_tpu.utils.convert import load_pth

        print(f"loading VGG19 weights from {path}")
        conv = load_pth(path, "vgg19")
        # keep only the truncated stack's convs (up to relu3_1)
        return {"params": {k: conv["params"][k] for k in init_vars["params"]}}
    print("WARNING: no --vgg weights; perceptual-correctness uses a random "
          "(fixed-seed) VGG — fine for smoke tests, not for real training.")
    return init_vars


def adapt_batch(batch, reverse: bool):
    """set_train_input equivalent (models/flownet_model.py:39-54)."""
    gate = np.concatenate([batch["gate"], batch["gate"]], axis=2)
    if reverse:
        return {
            "img_S": batch["img_F"], "img_F": batch["img_S"],
            "lm_S": batch["lm_F"], "lm_F": batch["lm_S"],
            "mask": batch["mask_S"], "gate": gate.astype(np.float32),
        }
    return {
        "img_S": batch["img_S"], "img_F": batch["img_F"],
        "lm_S": batch["lm_S"], "lm_F": batch["lm_F"],
        "mask": batch["mask_F"], "gate": gate.astype(np.float32),
    }


def main():
    parser = train_parser("flownet")
    parser.add_argument("--vgg", type=str, default="",
                        help="VGG19 .pth state_dict for the correctness loss")
    parser.set_defaults(model="flownet", batch_size=6, name="flownet")
    opt = parser.parse_args()
    if opt.multihost:
        jax.distributed.initialize()  # TPU pods auto-detect coordinates
    print_and_save(opt, "train", chief=jax.process_index() == 0)

    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    rank, nproc = jax.process_index(), jax.process_count()
    is_chief = rank == 0
    print(f"mesh: {n_dev} device(s): {mesh}")
    check_batch_divisible(opt.batch_size, n_dev)
    # multi-host: --batch_size stays the GLOBAL batch; each process loads a
    # disjoint 1/nproc slice of the (identically seeded) shuffled epoch and
    # shard_batch assembles the global arrays from the per-host parts.
    local_bs = opt.batch_size // nproc
    drop_mult = n_dev // nproc  # per-host divisibility for drop_remainder
    if nproc > 1:
        print(f"multi-host: {nproc} processes, rank {rank}, "
              f"{local_bs} images/host")

    loader = create_dataset(opt.dataroot, datamode=opt.datamode, phase="train",
                            batch_size=local_bs, load_size=opt.load_size,
                            aug=opt.aug, preload=opt.preload,
                            num_threads=opt.num_threads,
                            max_dataset_size=opt.max_dataset_size,
                            shuffle=not opt.serial_batches, seed=opt.seed,
                            process_shard=(rank, nproc) if nproc > 1 else None)
    print(f"The number of training images = {len(loader.dataset)}")

    model, state, tx = create_flow_train_state(
        jax.random.PRNGKey(opt.seed), lr=opt.lr, image_size=opt.load_size)
    if opt.continue_train and exists(opt.checkpoints_dir, opt.name,
                                     f"{opt.epoch}_state"):
        state = restore_tree(opt.checkpoints_dir, opt.name,
                             f"{opt.epoch}_state", target=state)
        print(f"resumed from {opt.epoch}_state")

    from ffwm_tpu.utils.profiling import print_networks
    print_networks({"flowNet": state.net.params})
    vgg_vars = load_vgg(opt.vgg, opt.load_size)
    state = replicate(state, mesh)
    vgg_vars = replicate(vgg_vars, mesh)
    # --bf16: bf16 compute with fp32 master weights/stats, like the FFWM
    # trainer's bf16 path (the fp32 default is the parity configuration)
    import jax.numpy as jnp
    step_fn = make_flow_train_step(
        model, tx, reverse=getattr(opt, "reverse", False),
        compute_dtype=jnp.bfloat16 if opt.bf16 else None)

    # chief-only: the constructor itself writes (dirs + loss-log header);
    # every later vis call in the loop is already is_chief-gated
    vis = Visualizer(opt.name, opt.checkpoints_dir, phase="train",
                     tensorboard=opt.display_id > 0) if is_chief else None
    # 'plateau' needs a per-epoch metric (reference feeds self.metric,
    # base_model.py:148-149); we feed the epoch-mean training loss.
    plateau = (PlateauTracker(opt.lr, factor=0.2, patience=5, threshold=1e-2)
               if opt.lr_policy == "plateau" else None)
    # resume the loss-log iteration counter from the checkpointed step
    # count, like train_ffwm.py does with titers (the reference restarts
    # at 0; continuing the counter keeps the log monotonic)
    total_iters = int(jax.device_get(state.step)) * opt.batch_size
    for epoch in range(opt.epoch_count, opt.niter + opt.niter_decay + 1):
        epoch_start = time.time()
        if plateau is not None:
            lr = plateau.lr
        else:
            lr = get_lr(opt.lr_policy, opt.lr, epoch - opt.epoch_count,
                        decay_epochs=opt.lr_decay_iters,
                        niter=opt.niter, niter_decay=opt.niter_decay,
                        epoch_count=opt.epoch_count)
        state = state.replace(opt_state=set_lr(state.opt_state, lr))
        t_data_mark = time.time()
        epoch_losses = []  # device scalars; fetched once at epoch end
        for batch in loader:
            t_data = time.time() - t_data_mark
            ab = adapt_batch(batch, getattr(opt, "reverse", False))
            ab = drop_remainder(ab, drop_mult)
            if ab is None:
                t_data_mark = time.time()
                continue
            ab = shard_batch(ab, mesh)
            t0 = time.time()
            state, metrics = step_fn(state, ab, vgg_vars)
            epoch_losses.append(metrics["loss"])
            total_iters += opt.batch_size
            if is_chief and total_iters % opt.print_freq < opt.batch_size:
                metrics = jax.device_get(metrics)
                vis.print_current_losses(epoch, total_iters, metrics,
                                         time.time() - t0, t_data)
            t_data_mark = time.time()
        if plateau is not None and epoch_losses:
            plateau.update(float(np.mean(jax.device_get(epoch_losses))))

        if is_chief:
            print(f"End of epoch {epoch} / {opt.niter + opt.niter_decay}\t"
                  f"Time: {time.time() - epoch_start:.0f}s\tlr: {lr:.2e}")
        # orbax checkpointing is a COLLECTIVE in multi-process runs (it
        # syncs processes internally; the primary host writes the data), so
        # EVERY host calls save_tree — only logs and the .pth export are
        # chief-only. Chief-gating the saves deadlocks the other hosts'
        # next collective (measured: gloo /0,2048/1 rendezvous timeout).
        save_latest = (epoch % opt.save_latest_freq == 0
                       or epoch == opt.niter + opt.niter_decay)
        save_epoch = epoch % opt.save_epoch_freq == 0
        if save_latest or save_epoch:  # one D2H fetch serves both saves
            host_state = jax.device_get(state)
            net_vars = host_state.net.variables
        if save_latest:
            save_tree(opt.checkpoints_dir, opt.name, "latest_net_flowNet", net_vars)
            save_tree(opt.checkpoints_dir, opt.name, "latest_state", host_state)
        if save_epoch:
            if is_chief:
                print(f"saving the model at the end of epoch {epoch}")
            save_tree(opt.checkpoints_dir, opt.name, f"{epoch}_net_flowNet", net_vars)
            save_tree(opt.checkpoints_dir, opt.name, f"{epoch}_state",
                      host_state)
            if is_chief:
                save_pth(net_vars, "flownet",
                         os.path.join(opt.checkpoints_dir, opt.name,
                                      f"{epoch}_net_flowNet.pth"))


if __name__ == "__main__":
    main()
