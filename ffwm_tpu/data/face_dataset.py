"""Multi-PIE / LFW face dataset — host-side input pipeline.

Clean-room rebuild of the reference FaceDataset (data/face_dataset.py):

  * Multi-PIE pairs ``(profile, s2f(profile))`` where s2f rewrites the camera
    field to '051' (:10-17),
  * training items: RGB images /255, masks /255, 580-pt landmark arrays
    (clamped int64) + half-face validity ``gate``; the dataset is doubled
    with a deterministic mirror flip for index >= len(pairs)
    (x -> 127 - x, :65-71),
  * optional +-5 deg rotation augmentation of the profile image/mask/
    landmarks (:110-130),
  * LFW mode: (file, file) pairs, images only (:144-147),
  * test gallery: ``gallery_list.npy`` or "one ``*_051_06.png`` per
    identity", grayscale-mean tensors keyed by the 3-char id (:153-168),
  * ``preload``: read everything into RAM with a thread pool (:197-208).

Arrays are NHWC numpy (TPU-native layout); batching + prefetch live in
ffwm_tpu.data.loader.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from os.path import join
from typing import Dict, Optional

import threading

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the target env
    cv2 = None


def s2f(filename: str) -> str:
    """Frontal counterpart of a Multi-PIE profile image name."""
    name = os.path.basename(filename)
    ss = name.split("_")
    return "{}_{}_{}_{}_{}".format(ss[0], ss[1], ss[2], "051", ss[4])


def _imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.uint8)


def _imread_mask(path: str) -> np.ndarray:
    mask = cv2.imread(path, 0)
    if mask is None:
        raise FileNotFoundError(path)
    return mask[:, :, None].astype(np.uint8)


def rotate_augment(img: np.ndarray, mask: np.ndarray, lm: np.ndarray,
                   ang: int, load_size: int):
    """+-ang-degree rotation of image/mask with the matching landmark
    transform (reference aug_transform :110-130; note the landmark rotation
    uses -ang to match OpenCV's convention). Pixel work runs in the native
    C++ data plane when built (ffwm_tpu.data.native; cv2 fallback inside)."""
    from ffwm_tpu.data import native

    img_aug = native.rotate_u8(img, int(ang))
    mask_aug = native.threshold_u8(native.rotate_u8(mask, int(ang)))
    if mask_aug.ndim == 2:
        mask_aug = mask_aug[:, :, None]

    lm_aug = lm.astype(np.float32).copy()
    half = load_size // 2
    x0 = lm_aug[:, 0] - half
    y0 = lm_aug[:, 1] - half
    rad = -ang * np.pi / 180.0
    lm_aug[:, 0] = x0 * np.cos(rad) - y0 * np.sin(rad) + half
    lm_aug[:, 1] = x0 * np.sin(rad) + y0 * np.cos(rad) + half
    lm_aug = np.clip(lm_aug, 0, load_size)
    return img_aug, mask_aug, lm_aug


class FaceDataset:
    """phase: 'train' or 'test'; datamode: 'multipie' or 'lfw'."""

    def __init__(self, dataroot: str, datamode: str = "multipie",
                 phase: str = "train", load_size: int = 128,
                 aug: bool = False, preload: bool = False,
                 seed: Optional[int] = None):
        self.datamode = datamode
        self.phase = phase
        self.load_size = load_size
        self.aug = aug
        self.preload = preload
        self.isval = phase != "train"
        self.rng = np.random.RandomState(seed)
        # __getitem__ runs on the loader's thread pool; RandomState is not
        # thread-safe (concurrent draws can corrupt state), so augmentation
        # draws take this lock. (Cross-thread scheduling already makes the
        # angle->item assignment nondeterministic; the lock keeps the draws
        # valid.)
        self._rng_lock = threading.Lock()
        self.image_dict: Dict[str, np.ndarray] = {}
        self.mask_dict: Dict[str, np.ndarray] = {}
        self.lm_dicts = None
        self.gallery_dict: Dict[str, np.ndarray] = {}

        dataroot = join(dataroot, datamode)
        if datamode == "multipie":
            self.base_path = join(dataroot, "test" if self.isval else "train")
            self.files = sorted(os.listdir(join(self.base_path, "images")))
            if self.isval:
                self.gallery_dict = self._build_gallery()
            else:
                self.lm_dicts = np.load(join(self.base_path, "landmarks.npy"),
                                        allow_pickle=True).item()
            self.pairs = [(f, s2f(f)) for f in self.files]
        else:  # LFW or other frontal-free sets
            self.base_path = dataroot
            self.files = sorted(os.listdir(join(self.base_path, "images")))
            self.pairs = [(f, f) for f in self.files]

        if preload:
            self._preload()

    # ------------------------------------------------------------------ io
    def _image(self, f: str) -> np.ndarray:
        if self.preload and f in self.image_dict:
            return self.image_dict[f]
        return _imread_rgb(join(self.base_path, "images", f))

    def _mask(self, f: str) -> np.ndarray:
        if self.preload and f in self.mask_dict:
            return self.mask_dict[f]
        return _imread_mask(join(self.base_path, "masks", f))

    def _preload(self):
        def read(f):
            for _ in range(3):  # per-file retry like the reference imreader
                try:
                    self.image_dict[f] = self._imread_fresh(f)
                    if not self.isval:
                        self.mask_dict[f] = _imread_mask(
                            join(self.base_path, "masks", f))
                    return
                except Exception as e:  # pragma: no cover
                    err = e
            print(f"{f} fails! ({err})")

        with ThreadPoolExecutor() as pool:
            list(pool.map(read, self.files))

    def _imread_fresh(self, f):
        return _imread_rgb(join(self.base_path, "images", f))

    # --------------------------------------------------------------- items
    def __len__(self) -> int:
        return len(self.pairs) if self.isval else len(self.pairs) * 2

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.get_test_item(index) if self.isval else self.get_train_item(index)

    def get_test_item(self, index: int) -> Dict[str, np.ndarray]:
        path_s, path_f = self.pairs[index]
        img_s = self._image(path_s).astype(np.float32) / 255.0
        if self.datamode == "multipie":
            img_f = self._image(path_f).astype(np.float32) / 255.0
        else:
            img_f = img_s
        return {"img_S": img_s, "img_F": img_f, "input_path": path_s}

    def get_train_item(self, index: int) -> Dict[str, np.ndarray]:
        flipped = index >= len(self.pairs)
        i = index % len(self.pairs)
        path_s, path_f = self.pairs[i]
        key_s, key_f = path_s[:-7], path_f[:-7]

        lm_s = self.lm_dicts["lm_S"][key_s].copy()
        lm_f = self.lm_dicts["lm_F"][key_f].copy()
        gate = self.lm_dicts["gate"][key_s].copy()

        img_s = self._image(path_s).copy()
        img_f = self._image(path_f).copy()
        mask_s = self._mask(path_s).copy()
        mask_f = self._mask(path_f).copy()

        if flipped:  # deterministic mirror doubling (reference :65-71)
            lm_s = np.hstack((127 - lm_s[:, 0:1], lm_s[:, 1:2]))
            lm_f = np.hstack((127 - lm_f[:, 0:1], lm_f[:, 1:2]))
            img_s = img_s[:, ::-1, :]
            img_f = img_f[:, ::-1, :]
            mask_s = mask_s[:, ::-1, :]
            mask_f = mask_f[:, ::-1, :]

        if self.aug:
            with self._rng_lock:
                ang = self.rng.randint(-5, 5)
            img_s, mask_s, lm_s = rotate_augment(img_s, mask_s, lm_s, ang,
                                                 self.load_size)

        from ffwm_tpu.data import native

        cl = self.load_size - 1
        return {
            "img_S": native.u8_to_f32(img_s),
            "img_F": native.u8_to_f32(img_f),
            "mask_S": native.u8_to_f32(mask_s),
            "mask_F": native.u8_to_f32(mask_f),
            "lm_S": np.clip(lm_s, 0, cl).astype(np.int32),
            "lm_F": np.clip(lm_f, 0, cl).astype(np.int32),
            "gate": gate.astype(np.float32)[:, None],
            "input_path": path_s,
        }

    # ------------------------------------------------------------- gallery
    def _build_gallery(self) -> Dict[str, np.ndarray]:
        glist_path = join(self.base_path, "gallery_list.npy")
        if os.path.exists(glist_path):
            gallery_list = list(np.load(glist_path))
        else:
            picked: Dict[str, str] = {}
            files = list(self.files)
            self.rng.shuffle(files)
            for f in files:
                if f[:3] not in picked and f.strip().endswith("051_06.png"):
                    picked[f[:3]] = f
            gallery_list = list(picked.values())
        gallery = {}
        for g in gallery_list:
            img = _imread_rgb(join(self.base_path, "images", g)).astype(np.float32) / 255.0
            gallery[g[:3]] = np.mean(img, axis=2, keepdims=True)  # gray HW1
        return gallery
