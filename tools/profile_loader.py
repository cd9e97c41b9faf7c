#!/usr/bin/env python
"""Host input-pipeline profile: can the data plane feed the chip?

Measures, on a synthetic Multi-PIE dataroot (ffwm_tpu.data.synthetic):

  item      per-item decode+transform rate of FaceDataset.__getitem__
            (cold = PNG decode + pixel work; preload = pixel work only),
            at 1..N loader threads
  batch     steady-state DataLoader batch rate (thread-pool fetch +
            collate + bounded prefetch queue), img/s
  h2d       jax.device_put rate of collated batches onto the default
            backend, img/s

Context for the numbers (BASELINE.md): the device consumes 803 img/s on
the inference path and ~100-115 img/s on the GAN train step — the loader
must sustain those rates for the device never to stall. The reference
measures the same thing as the loss log's `data:` field
(/root/reference/train_ffwm.py:73-93); this tool is the standalone
equivalent.

Usage: python tools/profile_loader.py [dataroot] [--aug] [--threads N]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def rate(fn, n, warm=2):
    for _ in range(warm):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return n / (time.perf_counter() - t0)


def profile_items(ds, threads, n_items=256):
    from concurrent.futures import ThreadPoolExecutor

    idx = np.arange(n_items) % len(ds)
    if threads == 1:
        t0 = time.perf_counter()
        for i in idx:
            ds[int(i)]
        return n_items / (time.perf_counter() - t0)
    with ThreadPoolExecutor(threads) as pool:
        list(pool.map(ds.__getitem__, idx[:16]))  # warm
        t0 = time.perf_counter()
        list(pool.map(ds.__getitem__, idx))
        return n_items / (time.perf_counter() - t0)


def profile_batches(ds, batch_size, threads, n_batches=24):
    from ffwm_tpu.data.loader import DataLoader

    loader = DataLoader(ds, batch_size=batch_size, shuffle=True,
                        num_threads=threads, prefetch=2, seed=0)
    it = iter(loader)
    next(it)  # warm the producer
    t0 = time.perf_counter()
    got = 0
    for _ in range(n_batches - 1):
        try:
            next(it)
            got += 1
        except StopIteration:
            it = iter(loader)
    return got * batch_size / (time.perf_counter() - t0)


def profile_h2d(ds, batch_size, n=16):
    import jax

    from ffwm_tpu.data.loader import collate

    batch = collate([ds[i % len(ds)] for i in range(batch_size)])
    arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    nbytes = sum(a.nbytes for a in arrays.values())

    def put():
        out = jax.device_put(arrays)
        jax.block_until_ready(out)

    r = rate(put, n)
    return r * batch_size, r * nbytes / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataroot", nargs="?", default=None)
    ap.add_argument("--aug", action="store_true",
                    help="include the +-5 deg rotation augmentation")
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--batch_size", type=int, default=8)
    args = ap.parse_args()

    from ffwm_tpu.data.face_dataset import FaceDataset
    from ffwm_tpu.data.native import get_lib

    root = args.dataroot
    if root is None:
        from ffwm_tpu.data.synthetic import make_synthetic_multipie

        root = os.path.join(tempfile.gettempdir(), "ffwm_loader_prof")
        if not os.path.isdir(os.path.join(root, "multipie", "train", "images")):
            make_synthetic_multipie(root, n_ids=24,
                                    cameras=("051", "050", "041", "090", "130"))
    print(f"# dataroot: {root}  native dataplane: "
          f"{'built' if get_lib() is not None else 'numpy fallback'}  "
          f"host cores: {os.cpu_count()}")

    thread_counts = sorted({1, 2, 4, args.threads})
    for preload in (False, True):
        ds = FaceDataset(root, phase="train", aug=args.aug, preload=preload,
                         seed=0)
        tag = "preload" if preload else "cold   "
        rates = {t: profile_items(ds, t) for t in thread_counts}
        row = "  ".join(f"t={t}: {r:7.1f}" for t, r in rates.items())
        print(f"item/{tag} img/s  {row}")
        bt = profile_batches(ds, args.batch_size, args.threads)
        print(f"batch/{tag} (b={args.batch_size}, t={args.threads}, "
              f"prefetch=2): {bt:.1f} img/s")
    ips, gbs = profile_h2d(ds, args.batch_size)
    print(f"h2d (b={args.batch_size}): {ips:.1f} img/s ({gbs:.2f} GB/s)")
    print("# device demand: ~803 img/s inference, ~100-115 img/s GAN train "
          "(BASELINE.md)")


if __name__ == "__main__":
    main()
