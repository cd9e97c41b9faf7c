#!/usr/bin/env python
"""Train the full FFWM face-frontalization GAN — TPU-native.

CLI-compatible rebuild of the reference train_ffwm.py: same flags and
checkpoint conventions, same loss mix and optimizers, with the D-then-G
alternation compiled into ONE XLA program per step and the batch sharded
over a jax.sharding.Mesh (data parallelism; BatchNorm statistics are global
across the mesh automatically under GSPMD).

Required pretrained pieces (same as the reference README):
    --flownetf / --flownetb : trained flow nets (orbax dir or .pth)
    --lightcnn              : finetuned LightCNN-29 (.pth or orbax dir)
    --vgg                   : VGG19 ImageNet weights (.pth state_dict)

Example:
    python train_ffwm.py --dataroot ./dataset --name ffwm --batch_size 8
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.data import create_dataset
from ffwm_tpu.engine import (
    build_models,
    create_ffwm_train_state,
    exists,
    make_ffwm_inference,
    make_ffwm_train_step,
    restore_tree,
    save_pth,
    save_tree,
    set_lr,
)
from ffwm_tpu.engine.schedule import PlateauTracker, get_lr
from ffwm_tpu.options import print_and_save, train_parser
from ffwm_tpu.parallel import (
    check_batch_divisible,
    drop_remainder,
    make_mesh,
    replicate,
    shard_batch,
)
from ffwm_tpu.utils import Visualizer


def load_net_vars(path: str, kind: str, init_vars, what: str,
                  validate: bool = True):
    """Load from an orbax checkpoint dir or a torch .pth; None if missing.

    validate=False loads with the CHECKPOINT's shapes instead of validating
    against init_vars — used for the frozen LightCNN, whose classifier head
    width (num_classes) is irrelevant to the identity features and may
    legitimately differ from the 79077-way default (e.g. a finetune run on
    a smaller label set; reference FFWM equally never uses the logits,
    models/ffwm_model.py:196-202).
    """
    if not path:
        return None
    import orbax.checkpoint as ocp

    if os.path.isdir(path + ".ckpt") or os.path.isdir(path):
        p = path if os.path.isdir(path) else path + ".ckpt"
        ckptr = ocp.StandardCheckpointer()
        print(f"loading {what} from {p}")
        # abspath: orbax rejects relative paths, and the CLI defaults are
        # cwd-relative ./checkpoints/... like the reference's
        p = os.path.abspath(p)
        if not validate:
            return ckptr.restore(p)
        return ckptr.restore(p, target=jax.tree.map(np.asarray, init_vars))
    if os.path.exists(path) and path.endswith(".pth"):
        from ffwm_tpu.utils.convert import load_pth

        print(f"loading {what} from {path}")
        return load_pth(path, kind, init_vars if validate else None)
    print(f"WARNING: {what} checkpoint not found at {path}; random init")
    return None


def main():
    parser = train_parser("ffwm")
    parser.set_defaults(name="ffwm")
    opt = parser.parse_args()
    if opt.multihost:
        jax.distributed.initialize()  # TPU pods auto-detect coordinates
    print_and_save(opt, "train", chief=jax.process_index() == 0)

    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    rank, nproc = jax.process_index(), jax.process_count()
    is_chief = rank == 0
    print(f"mesh: {n_dev} device(s)")
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

    models = build_models()
    s = opt.load_size
    # pretrained flownets: init variables only as the restore template
    # (building a flow TRAIN state here would also allocate an unused
    # Adam tree — test_ffwm.py:69 uses the same init-only pattern)
    flow_init = models.flownet.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, s, s, 3), jnp.float32),
                                    train=False)
    flow_f_vars = load_net_vars(opt.flownetf, "flownet", flow_init, "flowNetF")
    flow_b_vars = load_net_vars(opt.flownetb, "flownet", flow_init, "flowNetB")

    state, txs = create_ffwm_train_state(
        jax.random.PRNGKey(opt.seed), models, image_size=s,
        lr_g=opt.lr, lr_d=opt.lr,
        flow_f_vars=flow_f_vars, flow_b_vars=flow_b_vars)

    lc_vars = load_net_vars(opt.lightcnn, "lightcnn", None, "lightCNN",
                            validate=False)
    if lc_vars is not None:
        # the frozen extractor must match the CHECKPOINT's classifier head
        # width (flax validates param shapes at apply); num_classes only
        # shapes the unused logits — the identity loss reads the 256-d fc
        # feature like the reference (models/ffwm_model.py:196-202)
        from ffwm_tpu.models import LightCNN29
        from ffwm_tpu.models.lightcnn import checkpoint_num_classes

        ncls = checkpoint_num_classes(lc_vars, what=opt.lightcnn)
        if ncls != models.lightcnn.num_classes:
            models = models._replace(lightcnn=LightCNN29(num_classes=ncls))
    else:
        lc_vars = models.lightcnn.init(jax.random.PRNGKey(1),
                                       jnp.zeros((1, s, s, 1)))
    vgg_init = models.vgg.init(jax.random.PRNGKey(2), jnp.zeros((1, s, s, 3)))
    if opt.vgg and os.path.exists(opt.vgg):
        from ffwm_tpu.utils.convert import load_pth as _lp

        conv = _lp(opt.vgg, "vgg19")
        vgg_vars = {"params": {k: conv["params"][k] for k in vgg_init["params"]}}
        print(f"loaded VGG19 from {opt.vgg}")
    else:
        vgg_vars = vgg_init
        print("WARNING: no --vgg weights; perceptual losses use a fixed-seed "
              "random VGG (smoke-test mode).")
    frozen = {"lightcnn": lc_vars, "vgg": vgg_vars}

    if opt.continue_train and exists(opt.checkpoints_dir, opt.name,
                                     f"{opt.epoch}_state"):
        state = restore_tree(opt.checkpoints_dir, opt.name,
                             f"{opt.epoch}_state", target=state)
        print(f"resumed full train state from {opt.epoch}_state "
              f"(titers={int(state.titers)})")

    from ffwm_tpu.utils.profiling import print_networks
    print_networks({"netG": state.gen.params, "netD": state.disc.params,
                    "flowNetF": state.flow_f.params,
                    "flowNetB": state.flow_b.params})
    state = replicate(state, mesh)
    frozen = replicate(frozen, mesh)
    # --bf16: bf16 compute with fp32 master weights/moments — measured
    # 77.8 vs 90.2 ms/step at b=8 on v5e, 114.5 img/s at b=16 (BASELINE.md
    # round-3 train profile). fp32 (default) is the parity configuration.
    # --no_remat trades HBM for a few % of step time (75.1 ms with bf16).
    step_fn = make_ffwm_train_step(
        models, txs, crop_identity=opt.crop,
        compute_dtype=jnp.bfloat16 if opt.bf16 else None,
        remat_frozen=not opt.no_remat)
    infer_fn = make_ffwm_inference(models)

    # chief-only: the constructor itself writes (dirs + loss-log header);
    # every later vis call in the loop is already is_chief-gated
    vis = Visualizer(opt.name, opt.checkpoints_dir, phase="train",
                     tensorboard=opt.display_id > 0) if is_chief else None
    total_iters = int(jax.device_get(state.titers))
    # 'plateau' needs a per-epoch metric (reference feeds self.metric,
    # base_model.py:148-149); we feed the epoch-mean loss_G. The decayed
    # *scale* applies to all three optimizers like the reference's per-
    # optimizer ReduceLROnPlateau schedulers stepping on the same metric.
    plateau = (PlateauTracker(1.0, factor=0.2, patience=5, threshold=1e-2)
               if opt.lr_policy == "plateau" else None)
    for epoch in range(opt.epoch_count, opt.niter + opt.niter_decay + 1):
        epoch_start = time.time()
        e = epoch - opt.epoch_count
        if plateau is not None:
            lr_g, lr_f = opt.lr * plateau.lr, 5e-5 * plateau.lr
        else:
            lr_g = get_lr(opt.lr_policy, opt.lr, e,
                          decay_epochs=opt.lr_decay_iters,
                          niter=opt.niter, niter_decay=opt.niter_decay,
                          epoch_count=opt.epoch_count)
            lr_f = get_lr(opt.lr_policy, 5e-5, e,
                          decay_epochs=opt.lr_decay_iters,
                          niter=opt.niter, niter_decay=opt.niter_decay,
                          epoch_count=opt.epoch_count)
        state = state.replace(opt_g=set_lr(state.opt_g, lr_g),
                              opt_f=set_lr(state.opt_f, lr_f),
                              opt_d=set_lr(state.opt_d, lr_g))
        t_data_mark = time.time()
        last_batch = None
        epoch_losses = []  # device scalars; fetched once at epoch end
        for batch in loader:
            t_data = time.time() - t_data_mark
            fb = {k: batch[k] for k in
                  ("img_S", "img_F", "lm_F", "mask_S", "mask_F")}
            fb = drop_remainder(fb, drop_mult)
            if fb is None:
                t_data_mark = time.time()
                continue
            fb = shard_batch(fb, mesh)
            last_batch = fb
            t0 = time.time()
            state, metrics = step_fn(state, fb, frozen)
            epoch_losses.append(metrics["loss_G"])
            total_iters += opt.batch_size
            if is_chief and total_iters % opt.print_freq < opt.batch_size:
                metrics = jax.device_get(metrics)
                vis.print_current_losses(epoch, total_iters, metrics,
                                         time.time() - t0, t_data)
            # periodic visuals: single-host only — infer_fn runs on the
            # globally-sharded batch, so a chief-only call would leave the
            # other hosts out of a global program (deadlock), and its output
            # isn't fully addressable on one host to device_get. Multi-host
            # runs monitor via the loss log; visuals come from eval runs.
            if (nproc == 1 and total_iters % opt.display_freq < opt.batch_size
                    and last_batch is not None):
                out = jax.device_get(infer_fn(
                    state.flow_f.variables, state.gen.variables,
                    last_batch["img_S"], last_batch["img_F"]))
                vis.display_current_results(
                    {"img_S": jax.device_get(last_batch["img_S"]),
                     "img_F": jax.device_get(last_batch["img_F"]),
                     "fake_F128": out["fake_F128"],
                     "img_GF128": out["img_GF128"],
                     "img_S_warp": out["img_S_warp"]}, epoch)
            t_data_mark = time.time()

        if plateau is not None and epoch_losses:
            plateau.update(float(np.mean(jax.device_get(epoch_losses))))
        if is_chief:
            print(f"End of epoch {epoch} / {opt.niter + opt.niter_decay}\t"
                  f"Time: {time.time() - epoch_start:.0f}s\tlr_G: {lr_g:.2e}")
        # orbax checkpointing is a COLLECTIVE in multi-process runs (it
        # syncs processes internally; the primary host writes the data), so
        # EVERY host calls save_tree — only logs and .pth exports are
        # chief-only (see train_flow.py for the measured deadlock).
        save_latest = (epoch % opt.save_latest_freq == 0
                       or epoch == opt.niter + opt.niter_decay)
        save_epoch = epoch % opt.save_epoch_freq == 0
        if save_latest or save_epoch:  # one D2H fetch serves both saves
            host_state = jax.device_get(state)
        if save_latest:
            for net, tag in (("gen", "netG"), ("disc", "netD"),
                             ("flow_f", "flowNetF"), ("flow_b", "flowNetB")):
                save_tree(opt.checkpoints_dir, opt.name, f"latest_net_{tag}",
                          getattr(host_state, net).variables)
            save_tree(opt.checkpoints_dir, opt.name, "latest_state", host_state)
        if save_epoch:
            if is_chief:
                print(f"saving the model at the end of epoch {epoch}, "
                      f"iters {total_iters}")
            save_tree(opt.checkpoints_dir, opt.name, f"{epoch}_state", host_state)
            if is_chief:
                save_pth(host_state.gen.variables, "ffwm",
                         os.path.join(opt.checkpoints_dir, opt.name,
                                      f"{epoch}_net_netG.pth"))
                save_pth(host_state.flow_f.variables, "flownet",
                         os.path.join(opt.checkpoints_dir, opt.name,
                                      f"{epoch}_net_flowNetF.pth"))


if __name__ == "__main__":
    main()
