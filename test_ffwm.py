#!/usr/bin/env python
"""Evaluate/infer with a trained FFWM — TPU-native.

CLI-compatible rebuild of the reference test_ffwm.py: Multi-PIE mode builds
the gallery LightCNN features, frontalizes every test image
(flowNetF -> netG -> guided filter), accumulates rank-1 identification per
pose, and saves visuals for --save_image / visual_list.npy entries; LFW mode
saves frontalized images only.

Improvement over the reference: batched inference (--batch_size N; the
reference is locked to 1) — batching is free throughput on TPU.

Checkpoints: looks for orbax dirs
``{checkpoints_dir}/{name}/{epoch}_net_{netG,flowNetF}.ckpt`` first, then
torch ``.pth`` files with the reference's names.
"""

import os
import time
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np

from ffwm_tpu.data import create_dataset
from ffwm_tpu.data.loader import device_prefetch
from ffwm_tpu.engine import build_models, make_ffwm_inference
from ffwm_tpu.engine.checkpoint import exists, restore_tree
from ffwm_tpu.losses.identity import _center_crop
from ffwm_tpu.models import grayscale
from ffwm_tpu.options import print_and_save, test_parser
from ffwm_tpu.parallel import make_mesh, pad_to_multiple, replicate, shard_batch
from ffwm_tpu.utils import Rank1Meter, Visualizer
from ffwm_tpu.utils.convert import load_pth


def load_variables(opt, tag: str, kind: str, init_vars):
    if exists(opt.checkpoints_dir, opt.name, f"{opt.epoch}_net_{tag}"):
        print(f"loading {tag} from orbax {opt.epoch}_net_{tag}")
        return restore_tree(opt.checkpoints_dir, opt.name,
                            f"{opt.epoch}_net_{tag}",
                            target=jax.tree.map(np.asarray, init_vars))
    pth = join(opt.checkpoints_dir, opt.name, f"{opt.epoch}_net_{tag}.pth")
    if os.path.exists(pth):
        print(f"loading {tag} from {pth}")
        return load_pth(pth, kind, init_vars)
    raise FileNotFoundError(
        f"no checkpoint for {tag}: tried orbax '{opt.epoch}_net_{tag}.ckpt' "
        f"and '{pth}'")


def main():
    opt = test_parser().parse_args()
    print_and_save(opt, "test")

    loader = create_dataset(opt.dataroot, datamode=opt.datamode, phase="test",
                            batch_size=opt.batch_size, load_size=opt.load_size,
                            preload=opt.preload, shuffle=False,
                            max_dataset_size=(None if opt.num_test == float("inf")
                                              else int(opt.num_test)),
                            seed=opt.seed)
    ds = loader.dataset
    print(f"The number of test images = {len(ds)}")

    models = build_models()
    s = opt.load_size
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    flows0 = tuple(jnp.zeros((1, t, t, 2)) for t in (s // 4, s // 2, s))
    # jitted inits: ONE cacheable program per net. Eager flax init dispatches
    # hundreds of per-op compiles — ~0.5 s tunnel round trips each on the
    # remote-compile TPU backend (the round-4 driver-bench-timeout cause);
    # this path is what tools/acceptance.py stage 3 runs on the chip.
    flow_init = jax.jit(
        lambda k: models.flownet.init(k, x, train=False))(jax.random.PRNGKey(0))
    gen_init = jax.jit(
        lambda k: models.gen.init(k, x, flows0, train=False))(jax.random.PRNGKey(0))
    lc_init = jax.jit(
        lambda k: models.lightcnn.init(k, jnp.zeros((1, s, s, 1))))(jax.random.PRNGKey(0))

    flow_vars = load_variables(opt, "flowNetF", "flownet", flow_init)
    gen_vars = load_variables(opt, "netG", "ffwm", gen_init)
    lc_path = opt.lightcnn
    # accept an orbax dir with or without its .ckpt suffix (restore_tree
    # appends the suffix itself), same as the trainers' load_net_vars
    if lc_path.endswith(".ckpt"):
        lc_path = lc_path[:-len(".ckpt")]
    if os.path.exists(lc_path) or os.path.isdir(lc_path + ".ckpt"):
        print(f"loading lightCNN from {lc_path}")
        # no target template: the extractor accepts any classifier head
        # width (num_classes only shapes the unused logits — reference
        # test() reads the 256-d fc feature, models/ffwm_model.py:196-202);
        # the module is rebuilt to the checkpoint's head width because flax
        # validates param shapes at apply
        lc_vars = (load_pth(lc_path, "lightcnn")
                   if lc_path.endswith(".pth") else
                   restore_tree(os.path.dirname(lc_path), "",
                                os.path.basename(lc_path)))
        from ffwm_tpu.models import LightCNN29
        from ffwm_tpu.models.lightcnn import checkpoint_num_classes

        ncls = checkpoint_num_classes(lc_vars, what=lc_path)
        if ncls != models.lightcnn.num_classes:
            models = models._replace(lightcnn=LightCNN29(num_classes=ncls))
    else:
        print("WARNING: lightCNN checkpoint missing; rank-1 numbers are "
              "meaningless (random identity features)")
        lc_vars = lc_init

    # Shard eval over the data mesh like the trainers: variables replicated,
    # batches split on the leading axis (padded to a device multiple; padded
    # rows are sliced off before the metric/visuals see them). On one chip
    # this is the identity sharding — the single-device path is unchanged.
    mesh = make_mesh()
    n_dev = len(mesh.devices.flatten())
    if n_dev > 1:
        print(f"eval mesh: {n_dev} devices")
    flow_vars = replicate(flow_vars, mesh)
    gen_vars = replicate(gen_vars, mesh)
    lc_vars = replicate(lc_vars, mesh)

    # The Mosaic warp kernel carries a GSPMD custom-partitioning spec
    # (batch-sharded, everything else replicated — warp_vmem_pallas
    # grid_sample_vmem_sharded), so sharded eval keeps the kernel on
    # multi-device meshes; no XLA-warp fallback needed.
    infer = make_ffwm_inference(
        models, dtype=jnp.bfloat16 if opt.bf16 else jnp.float32)

    @jax.jit
    def identity_feature(lc_vars, img):
        gray = grayscale(img)
        if opt.crop:
            gray = _center_crop(gray)
        _, fc, _ = models.lightcnn.apply(lc_vars, gray)
        return fc

    @jax.jit
    def gallery_feature(lc_vars, gray):
        # reference get_gallery_fea (models/ffwm_model.py:164-176): gallery
        # images are already grayscale; apply the same optional center crop
        if opt.crop:
            gray = _center_crop(gray)
        _, fc, _ = models.lightcnn.apply(lc_vars, gray)
        return fc

    vis = Visualizer(opt.name, opt.checkpoints_dir, phase="test",
                     datamode=opt.datamode)

    if opt.datamode == "multipie":
        vlist_path = join(opt.dataroot, "multipie", "test", "visual_list.npy")
        visual_list = set(np.load(vlist_path)) if os.path.exists(vlist_path) else set()

        gallery_keys = list(ds.gallery_dict.keys())
        gallery = np.stack([ds.gallery_dict[k] for k in gallery_keys])
        gpad, n_gal = pad_to_multiple({"g": gallery}, n_dev)
        gallery_feas = np.asarray(gallery_feature(
            lc_vars, shard_batch(gpad, mesh)["g"]))[:n_gal]

        # Software-pipelined loop: H2D placement runs 2 batches ahead on a
        # loader thread (device_prefetch) and the D2H fetch + host metric of
        # batch k happen AFTER batch k+1's programs are dispatched, so the
        # chip never idles on the host (the reference's bs=1 eval loop is
        # fully serialized — test_ffwm.py:62-67).
        def place(batch):
            imgs = {"img_S": batch["img_S"], "img_F": batch["img_F"]}
            imgs, bsz = pad_to_multiple(imgs, n_dev)
            return shard_batch(imgs, mesh), bsz

        def process(pending):
            batch, out, feas_dev, bsz = pending
            files = batch["input_path"]
            feas = np.asarray(feas_dev)[:bsz]
            metric.update(feas, files, gallery_feas, gallery_keys)
            for idx, name in enumerate(files):
                # save_image only applies when visual_list.npy is absent —
                # preserved verbatim from the reference (test_ffwm.py:69
                # "name in visual_list or (len(visual_list) == 0 and
                # opt.save_image)")
                if name in visual_list or (not visual_list and opt.save_image):
                    prefix = os.path.splitext(name)[0]
                    vis.display_test_results(
                        {"img_S": batch["img_S"], "img_F": batch["img_F"],
                         "fake_F128": np.asarray(out["fake_F128"])},
                        idx=idx, prefix=prefix)
            return bsz

        metric = Rank1Meter()
        n_done, t0 = 0, time.time()
        pending = None
        for batch, (imgs, bsz) in device_prefetch(loader, place):
            out = infer(flow_vars, gen_vars, imgs["img_S"], imgs["img_F"])
            feas_dev = identity_feature(lc_vars, out["fake_F128"])
            if pending is not None:
                n_done += process(pending)
            pending = (batch, out, feas_dev, bsz)
        if pending is not None:
            n_done += process(pending)
        dt = time.time() - t0
        print(f"processed {n_done} images in {dt:.1f}s "
              f"({n_done / max(dt, 1e-9):.1f} img/s)")
        vis.print_test_results(metric)
    else:  # lfw etc: dump images
        def place(batch):
            imgs = {"img_S": batch["img_S"], "img_F": batch["img_F"]}
            imgs, _ = pad_to_multiple(imgs, n_dev)
            return shard_batch(imgs, mesh)

        for batch, imgs in device_prefetch(loader, place):
            files = batch["input_path"]
            out = infer(flow_vars, gen_vars, imgs["img_S"], imgs["img_F"])
            for idx, name in enumerate(files):
                prefix = os.path.splitext(name)[0]
                vis.display_test_results(
                    {"img_S": batch["img_S"],
                     "fake_F128": np.asarray(out["fake_F128"])},
                    idx=idx, prefix=prefix)


if __name__ == "__main__":
    main()
