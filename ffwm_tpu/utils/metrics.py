"""Evaluation metrics — Multi-PIE rank-1 identification.

Rebuild of the reference AverageMeter (util/util.py:141-181): per test
image, cosine similarity of its LightCNN 256-d feature against all gallery
features, top-k retrieval, accuracy accumulated per camera code and reported
per pose angle (15..90 deg via the camera->angle map).
"""

from __future__ import annotations

from os.path import basename
from typing import Dict, List, Sequence

import numpy as np

DEG_CAMERAS = {
    "15": ["050", "140"],
    "30": ["041", "130"],
    "45": ["080", "190"],
    "60": ["090", "200"],
    "75": ["010", "120"],
    "90": ["110", "240"],
}


def cosine_similarity(a: np.ndarray, b: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """[N, D] x [M, D] -> [N, M] cosine similarity matrix."""
    an = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), eps)
    bn = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), eps)
    return an @ bn.T


class Rank1Meter:
    """Accumulates rank-1 identification per camera code."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.stat: Dict[str, Dict[str, int]] = {}

    def update(self, test_feas: np.ndarray, test_names: Sequence[str],
               gallery_feas: np.ndarray, gallery_keys: List[str],
               topk: int = 1):
        sims = cosine_similarity(np.asarray(test_feas), np.asarray(gallery_feas))
        k = min(max(10, topk), sims.shape[1])
        for b in range(sims.shape[0]):
            name = basename(test_names[b])
            ss = name.split("_")  # ss[0] identity, ss[3] camera
            order = np.argsort(-sims[b])[:k]
            ids = [gallery_keys[i] for i in order]
            cam = ss[3]
            self.stat.setdefault(cam, {"correct": 0, "all": 0})
            self.stat[cam]["all"] += 1
            if ss[0] in ids[:topk]:
                self.stat[cam]["correct"] += 1

    def accuracy_by_angle(self) -> Dict[str, float]:
        out = {}
        for deg, cams in DEG_CAMERAS.items():
            c = sum(self.stat.get(cam, {}).get("correct", 0) for cam in cams)
            a = sum(self.stat.get(cam, {}).get("all", 0) for cam in cams)
            if a:
                out[deg] = c / a
        return out

    def overall(self) -> float:
        c = sum(v["correct"] for v in self.stat.values())
        a = sum(v["all"] for v in self.stat.values())
        return c / a if a else 0.0

    def __str__(self) -> str:
        lines = []
        for cam, v in self.stat.items():
            lines.append(f"{cam}: [{v['correct']}/{v['all']}, {v['correct'] / max(v['all'], 1)}]")
        tail = ""
        for deg, acc in self.accuracy_by_angle().items():
            cams = DEG_CAMERAS[deg]
            c = sum(self.stat.get(cam, {}).get("correct", 0) for cam in cams)
            a = sum(self.stat.get(cam, {}).get("all", 0) for cam in cams)
            lines.append(f"{deg}: [{c}/{a}, {acc}]")
            tail += f" {100.0 * acc:.2f} |"
        return "\n".join(lines) + "\n" + tail + "\n"
