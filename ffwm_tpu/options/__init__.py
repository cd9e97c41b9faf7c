"""CLI options — reference-compatible flag surface.

Mirrors options/{base,train,test}_options.py of the reference so existing
run scripts port 1:1 (BASELINE.json requires preserved CLI semantics).
GPU-specific flags (--gpu_ids) are accepted and ignored: device placement is
the JAX platform's job; data parallelism comes from the mesh.

Also prints and saves the options snapshot to
``{checkpoints_dir}/{name}/{phase}_opt.txt`` like the reference
(options/base_options.py:107-130).
"""

from __future__ import annotations

import argparse
import os
import sys


def base_parser(phase: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--dataroot", type=str, default="./dataset",
                   help="path with {multipie,lfw} subdirs")
    p.add_argument("--name", type=str, default="experiment_name")
    p.add_argument("--gpu_ids", type=str, default="0",
                   help="accepted for compatibility; unused (JAX owns devices)")
    p.add_argument("--checkpoints_dir", type=str, default="./checkpoints")
    p.add_argument("--model", type=str, default="ffwm",
                   choices=["ffwm", "flownet"])
    p.add_argument("--dataset_mode", type=str, default="face")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--load_size", type=int, default=128)
    p.add_argument("--num_threads", type=int, default=4)
    p.add_argument("--preload", action="store_true",
                   help="preload all images into RAM")
    p.add_argument("--serial_batches", action="store_true",
                   help="take images in order instead of shuffling")
    p.add_argument("--max_dataset_size", type=int, default=None)
    p.add_argument("--display_id", type=int, default=0,
                   help=">0 enables tensorboard scalar/image logging")
    p.add_argument("--suffix", type=str, default="",
                   help="name suffix template, e.g. {model}_{load_size}")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--phase", type=str, default=phase)
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute: eval runs the conv stacks in "
                        "bf16; the FFWM trainer runs forward/backward in "
                        "bf16 with fp32 master weights (-14%% step time; "
                        "-22%% per image with --batch_size 16); the flow "
                        "trainer runs net+correctness in bf16 with the "
                        "affine regularizer on fp32 flows (-19%% step "
                        "time, see BASELINE.md). fp32 (default) is the "
                        "parity configuration")
    return p


def train_parser(model: str = "ffwm") -> argparse.ArgumentParser:
    p = base_parser("train")
    p.add_argument("--print_freq", type=int, default=400)
    p.add_argument("--display_freq", type=int, default=6400)
    p.add_argument("--save_epoch_freq", type=int, default=2)
    p.add_argument("--save_latest_freq", type=int, default=1,
                   help="EPOCHS between 'latest' checkpoint saves — NOTE the "
                        "unit differs from the reference, whose flag of the "
                        "same name counts ITERATIONS (default 5000, "
                        "train_options.py:12); here 1 = the reference's "
                        "effective cadence (every epoch, train_ffwm.py:94). "
                        "Raise it on slow-interconnect dev setups: the "
                        "full-state save device_gets the whole params+Adam "
                        "tree, which costs minutes per epoch through a "
                        "tunneled chip. The final epoch always saves")
    p.add_argument("--save_by_iter", action="store_true",
                   help="accepted for compatibility; unused — the reference "
                        "declares it (options/train_options.py:24) but its "
                        "trainers only save at epoch end, as do ours")
    p.add_argument("--continue_train", action="store_true")
    p.add_argument("--epoch", type=str, default="latest",
                   help="which checkpoint to resume from")
    p.add_argument("--epoch_count", type=int, default=1)
    p.add_argument("--niter", type=int, default=20)
    p.add_argument("--niter_decay", type=int, default=20)
    p.add_argument("--lr", type=float, default=0.0004)
    p.add_argument("--lr_policy", type=str, default="step",
                   choices=["step", "linear", "cosine", "plateau"])
    p.add_argument("--lr_decay_iters", type=int, default=3)
    p.add_argument("--datamode", type=str, default="multipie")
    p.add_argument("--aug", action="store_true",
                   help="random rotation augmentation")
    # trainer-only flags (the eval/finetune CLIs don't implement multi-host
    # or the remat knob; adding the flags there would silently ignore them)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() at startup "
                        "(TPU pods auto-detect coordinator/topology). "
                        "--batch_size stays the GLOBAL batch: each host "
                        "loads a disjoint 1/n_process slice per epoch and "
                        "the collectives ride ICI/DCN. Checkpoints/logs "
                        "are written by process 0")
    if model == "flownet":
        p.add_argument("--reverse", action="store_true",
                       help="train the reverse (frontal->profile) flow")
    else:
        p.add_argument("--no_remat", action="store_true",
                       help="keep the frozen VGG/LightCNN activations "
                            "instead of rematerializing them in the "
                            "backward pass: a few %% faster when the batch "
                            "fits HBM (b<=8 fp32, b<=16 bf16 on a 16 GB "
                            "chip)")
        p.add_argument("--flownetf", type=str,
                       default="./checkpoints/flownetf/4_net_flowNet",
                       help="pretrained forward flownet (orbax dir or .pth)")
        p.add_argument("--flownetb", type=str,
                       default="./checkpoints/flownetb/4_net_flowNet")
        p.add_argument("--lightcnn", type=str,
                       default="./checkpoints/lightCNN_10_checkpoint.pth")
        p.add_argument("--vgg", type=str, default="",
                       help="VGG19 weights (.pth state_dict); random if empty")
        p.add_argument("--crop", action="store_true")
    return p


def test_parser() -> argparse.ArgumentParser:
    p = base_parser("test")
    p.add_argument("--results_dir", type=str, default="./results/",
                   help="accepted for compatibility; unused — the reference "
                        "declares but never reads it either "
                        "(options/test_options.py:11); visuals go to "
                        "{checkpoints_dir}/{name}/test/{datamode}")
    p.add_argument("--num_test", type=int, default=float("inf"))
    p.add_argument("--eval", action="store_true")
    p.add_argument("--epoch", type=str, default="latest")
    p.add_argument("--save_image", action="store_true")
    p.add_argument("--datamode", type=str, default="multipie")
    p.add_argument("--crop", action="store_true",
                   help="center-crop faces for identity features")
    p.add_argument("--lightcnn", type=str,
                   default="./checkpoints/lightCNN_10_checkpoint.pth")
    p.set_defaults(batch_size=1)
    return p


def print_and_save(opt: argparse.Namespace, phase: str,
                   chief: bool = True) -> None:
    """Print the options block and snapshot it to <ckpt>/<phase>_opt.txt
    (reference base_options.print_options). The opt.name suffix mutation
    runs on every caller; the print and the file write are chief-only in
    multi-host runs (pass chief=jax.process_index()==0) so N hosts don't
    interleave writes to the shared checkpoints_dir."""
    if getattr(opt, "suffix", ""):
        suffix = ("_" + opt.suffix.format(**vars(opt)))
        opt.name = opt.name + suffix
    # a reference-style --save_latest_freq 5000 (ITERATIONS there) would
    # silently mean "save every 5000 EPOCHS" here = never; warn loudly
    if chief and getattr(opt, "save_latest_freq", 0) > 100:
        print(f"WARNING: --save_latest_freq {opt.save_latest_freq} counts "
              "EPOCHS in ffwm_tpu (the reference's flag counts iterations); "
              "'latest' will effectively only be written at the final epoch",
              file=sys.stderr)
    if not chief:
        return
    msg = "----------------- Options ---------------\n"
    for k, v in sorted(vars(opt).items()):
        msg += f"{k:>25}: {v}\n"
    msg += "----------------- End -------------------"
    print(msg)
    expr_dir = os.path.join(opt.checkpoints_dir, opt.name)
    os.makedirs(expr_dir, exist_ok=True)
    with open(os.path.join(expr_dir, f"{phase}_opt.txt"), "w") as f:
        f.write(msg + "\n")
