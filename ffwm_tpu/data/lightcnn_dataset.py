"""LightCNN finetune dataset — grayscale Multi-PIE with labels.

Rebuild of lightcnn/dataset.py: channel-mean gray 128x128 images; train-time
random +-5 deg rotation + horizontal flip; optional center crop
([:, 28:-2, 15:-15] resized back to 128, :62-74); labels are
``int(filename[:3]) - 1`` (finetune.py:150); same gallery heuristic as the
face dataset.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, Optional

import threading

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class LightCNNDataset:
    def __init__(self, dataroot: str, phase: str = "train",
                 load_size: int = 128, crop: bool = False, aug: bool = True,
                 seed: Optional[int] = None):
        self.base_path = join(dataroot, "multipie", "train" if phase == "train" else "test")
        self.files = sorted(os.listdir(join(self.base_path, "images")))
        self.load_size = load_size
        self.crop = crop
        self.aug = aug and phase == "train"
        self.isval = phase != "train"
        self.rng = np.random.RandomState(seed)
        self._rng_lock = threading.Lock()  # pool threads share this RNG
        self.gallery_dict = self._gallery() if self.isval else {}

    def __len__(self):
        return len(self.files)

    def _gray(self, f: str) -> np.ndarray:
        img = cv2.imread(join(self.base_path, "images", f))
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return np.mean(img, axis=2, keepdims=True)  # HW1, channel-mean gray

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        f = self.files[index]
        gray = self._gray(f)
        if self.aug:
            h, w = gray.shape[:2]
            with self._rng_lock:  # pool threads share the RandomState
                ang = int(self.rng.randint(-5, 5))
                flip = bool(self.rng.rand() < 0.5)
            mat = cv2.getRotationMatrix2D((w // 2, h // 2), ang, 1)
            gray = cv2.warpAffine(gray, mat, (w, h))[:, :, None]
            if flip:
                gray = gray[:, ::-1, :]
        if self.crop:
            gray = gray[28:-2, 15:-15]
            gray = cv2.resize(gray, (self.load_size, self.load_size))[:, :, None]
        label = int(f[:3]) - 1
        return {"image": np.ascontiguousarray(gray, np.float32),
                "label": np.int32(label), "input_path": f}

    def _gallery(self) -> Dict[str, np.ndarray]:
        picked: Dict[str, str] = {}
        files = list(self.files)
        self.rng.shuffle(files)
        for f in files:
            if f[:3] not in picked and f.endswith("051_06.png"):
                picked[f[:3]] = f
        return {k: self._gray(v) for k, v in picked.items()}
