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
    """A deterministic face-ish blob, horizontally shifted by pose.

    Identity cues are GRAYSCALE-separable — luminance, geometry (face/eye/
    mouth shape), and identity-keyed high-contrast "moles" — because the
    eval pipeline's LightCNN sees channel-mean gray (reference
    ffwm_model.py:196, lightcnn/dataset.py:62). An earlier variant that
    differed only in RGB tint collapsed 8 identities to ~7%-apart gray
    levels, capping the round-4 overfit proof's rank-1 near chance."""
    img = np.zeros((size, size, 3), np.uint8)
    id_rng = np.random.RandomState(identity_seed)
    base_l = int(id_rng.randint(90, 210))
    skin = tuple(int(np.clip(base_l + t, 60, 235))
                 for t in id_rng.randint(-25, 26, 3))
    ax = size // 3 + int(id_rng.randint(-size // 12, size // 12 + 1))
    ay = size // 2 - 8 + int(id_rng.randint(-size // 12, size // 12 + 1))
    cx, cy = size // 2 + shift, size // 2
    cv2.ellipse(img, (cx, cy), (ax, ay), 0, 0, 360, skin, -1)
    eye_dx = size // 8 + int(id_rng.randint(-size // 24, size // 24 + 1))
    eye_dy = size // 8 + int(id_rng.randint(-size // 24, size // 24 + 1))
    eye_r = size // 24 + int(id_rng.randint(1, size // 24 + 1))
    eye = (int(id_rng.randint(0, 60)),) * 3
    for sx in (-1, 1):
        cv2.circle(img, (cx + sx * eye_dx, cy - eye_dy), eye_r, eye, -1)
    mouth_w = size // 12 + int(id_rng.randint(0, size // 16 + 1))
    mouth_h = size // 28 + int(id_rng.randint(0, size // 24 + 1))
    mouth = (int(id_rng.randint(20, 100)),) * 3
    cv2.ellipse(img, (cx, cy + size // 6), (mouth_w, mouth_h), 0, 0, 360,
                mouth, -1)
    # 3 identity-keyed moles: high-contrast marks at identity-specific spots
    # — rank-1 then requires the generator to place them correctly, tying
    # the metric to actual frontalization rather than mean brightness
    for _ in range(3):
        mx = cx + int(id_rng.randint(-ax // 2, ax // 2 + 1))
        my = cy + int(id_rng.randint(-ay // 2, ay // 2 + 1))
        mole = (int(id_rng.randint(0, 256)),) * 3
        cv2.circle(img, (mx, my), max(2, size // 28), mole, -1)
    noise = rng.randint(0, 12, (size, size, 3), np.uint8)
    return cv2.add(img, noise)


def _identity_landmarks(identity_seed: int, size: int) -> np.ndarray:
    """ONE frontal landmark set per identity (drawn from the identity seed,
    so train/test splits regenerate the same points).

    Keying matters as much as the draw: the loader — like the reference
    (data/face_dataset.py:55-56) — reads lm_S from the PROFILE file's key
    and lm_F from the FRONTAL file's key, so every camera's lm_S must be
    derived from the SAME frontal point set that the 051 entry stores as
    lm_F. The round-4 version drew a fresh base per camera and stored the
    consistent pair under the profile key only; the (lm_S-from-profile-key,
    lm_F-from-frontal-key) pair the trainer actually assembles was then two
    unrelated draws — a noise mapping that left the flow nets unlearnable
    (measured: ideal-shift flow scored landmark loss 120 vs 116 for the
    identity flow; round-5 overfit proof failed at rank-1 3.9%)."""
    lm_rng = np.random.RandomState(5000 + identity_seed)
    # margin size//4 keeps the +-8 px pose shift from clipping at 64 px,
    # preserving exact lm_S == lm_F + (shift, 0) correspondence everywhere
    return lm_rng.randint(size // 4, 3 * size // 4,
                          (N_LANDMARKS, 2)).astype(np.int64)


def _shifted_landmarks(lm_f: np.ndarray, size: int, shift: int) -> np.ndarray:
    lm_s = lm_f.copy()
    lm_s[:, 0] = np.clip(lm_s[:, 0] + shift, 0, size - 1)
    return lm_s


def make_synthetic_multipie(root: str, n_ids: int = 4,
                            cameras: Sequence[str] = ("051", "050", "090"),
                            size: int = 128, seed: int = 0,
                            n_test_ids: int = 2) -> List[str]:
    """Build train+test splits; returns the list of train image names."""
    if size < 32:
        # landmarks are drawn in [size//4, 3*size//4) and pose shifts reach
        # ±8 px; below 32 px the clip in _shifted_landmarks would silently
        # break the exact lm_S == lm_F + (shift, 0) correspondence the flow
        # supervision relies on (the round-5 overfit-proof bug class)
        raise ValueError(f"size must be >= 32 (got {size}): the ±8 px pose "
                         "shift would clip out of the landmark margin")
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
            lm_frontal = _identity_landmarks(1000 + i, size)
            for cam in cameras:
                shift = 0 if cam == "051" else (int(cam[:2]) % 5) * 4 - 8
                fname = f"{ident}_01_01_{cam}_06.png"
                img = _face_like(rng, size, identity_seed=1000 + i, shift=shift)
                cv2.imwrite(join(img_dir, fname), img[:, :, ::-1])
                mask = np.zeros((size, size), np.uint8)
                cv2.circle(mask, (size // 2 + shift, size // 2), size // 3, 255, -1)
                cv2.imwrite(join(mask_dir, fname), mask)
                key = fname[:-7]
                # each file's lm_S = ITS view of the shared frontal points;
                # its lm_F = the frontal points themselves — so any
                # (profile-key lm_S, frontal-key lm_F) pair corresponds
                lm_s[key] = _shifted_landmarks(lm_frontal, size, shift)
                lm_f[key] = lm_frontal.copy()
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
