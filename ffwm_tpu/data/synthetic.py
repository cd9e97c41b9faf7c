"""Synthetic Multi-PIE-format data for tests, demos, and benchmarks.

Generates a directory tree with the exact on-disk layout the reference's
pipeline consumes (data/face_dataset.py, data_process/process.py output):

    {root}/multipie/train/{images,masks}/*.png + landmarks.npy
    {root}/multipie/test/{images,masks}/*.png
    {root}/lfw/images/*.png

File names follow Multi-PIE convention ``{id}_{session}_{rec}_{camera}_
{illum}.png`` (frontal camera '051'); landmarks.npy holds
{lm_S, lm_F, gate} dicts keyed by filename[:-7] with 580-point arrays.
"""

from __future__ import annotations

import os
from os.path import join
from typing import List, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CAMERAS = ("050", "140", "041", "130", "080", "190", "090", "200",
           "010", "120", "110", "240")
N_LANDMARKS = 580


def _face_like(rng: np.random.RandomState, size: int, identity_seed: int,
               shift: int) -> np.ndarray:
    """A deterministic face-ish blob: identity-colored ellipse + eyes/mouth,
    horizontally shifted by pose."""
    img = np.zeros((size, size, 3), np.uint8)
    id_rng = np.random.RandomState(identity_seed)
    skin = tuple(int(c) for c in id_rng.randint(80, 220, 3))
    cx, cy = size // 2 + shift, size // 2
    cv2.ellipse(img, (cx, cy), (size // 3, size // 2 - 8), 0, 0, 360, skin, -1)
    eye = tuple(int(c) for c in id_rng.randint(0, 80, 3))
    cv2.circle(img, (cx - size // 8, cy - size // 8), size // 20, eye, -1)
    cv2.circle(img, (cx + size // 8, cy - size // 8), size // 20, eye, -1)
    cv2.ellipse(img, (cx, cy + size // 6), (size // 10, size // 24), 0, 0, 360,
                (150, 40, 40), -1)
    noise = rng.randint(0, 12, (size, size, 3), np.uint8)
    return cv2.add(img, noise)


def _landmarks(rng: np.random.RandomState, size: int, shift: int) -> np.ndarray:
    base = rng.randint(size // 4, 3 * size // 4, (N_LANDMARKS, 2))
    base[:, 0] = np.clip(base[:, 0] + shift, 0, size - 1)
    return base.astype(np.int64)


def make_synthetic_multipie(root: str, n_ids: int = 4,
                            cameras: Sequence[str] = ("051", "050", "090"),
                            size: int = 128, seed: int = 0,
                            n_test_ids: int = 2) -> List[str]:
    """Build train+test splits; returns the list of train image names."""
    rng = np.random.RandomState(seed)
    names = []
    for split, ids in (("train", range(n_ids)), ("test", range(n_test_ids))):
        img_dir = join(root, "multipie", split, "images")
        mask_dir = join(root, "multipie", split, "masks")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        lm_s, lm_f, gates = {}, {}, {}
        for i in ids:
            ident = f"{i + 1:03d}"
            for cam in cameras:
                shift = 0 if cam == "051" else (int(cam[:2]) % 5) * 4 - 8
                fname = f"{ident}_01_01_{cam}_06.png"
                img = _face_like(rng, size, identity_seed=1000 + i, shift=shift)
                cv2.imwrite(join(img_dir, fname), img[:, :, ::-1])
                mask = np.zeros((size, size), np.uint8)
                cv2.circle(mask, (size // 2 + shift, size // 2), size // 3, 255, -1)
                cv2.imwrite(join(mask_dir, fname), mask)
                key = fname[:-7]
                lm_s[key] = _landmarks(rng, size, shift)
                lm_f[key] = _landmarks(rng, size, 0)
                gates[key] = (rng.rand(N_LANDMARKS) > 0.2).astype(np.float32)
                if split == "train":
                    names.append(fname)
        if split == "train":
            np.save(join(root, "multipie", split, "landmarks.npy"),
                    {"lm_S": lm_s, "lm_F": lm_f, "gate": gates},
                    allow_pickle=True)
    return names


def make_synthetic_lfw(root: str, n: int = 4, size: int = 128, seed: int = 1):
    rng = np.random.RandomState(seed)
    img_dir = join(root, "lfw", "images")
    os.makedirs(img_dir, exist_ok=True)
    for i in range(n):
        img = _face_like(rng, size, identity_seed=2000 + i, shift=rng.randint(-8, 8))
        cv2.imwrite(join(img_dir, f"person_{i:04d}.png"), img[:, :, ::-1])
