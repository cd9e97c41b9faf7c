"""Training/eval visualization + logging.

Rebuild of util/visualizer.py + util/html.py: saves train visuals under
``checkpoints/{name}/web/images`` with a self-refreshing HTML index, test
visuals under ``checkpoints/{name}/test/{datamode}``, appends
``loss_log.txt`` / ``test_log.txt``, and optionally writes TensorBoard-style
scalar/image event files when tensorboardX is available (gated — not baked
into the environment).
"""

from __future__ import annotations

import os
import time
from os.path import join
from typing import Dict, Mapping, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def tensor2im(arr: np.ndarray, idx: int = 0) -> np.ndarray:
    """[B,H,W,C] float [0,1] (or [B,H,W,1]) -> uint8 RGB (HWC).

    The 1-channel branch remaps to [-1,1] before the *255 clip (values
    <= 0.5 render black) — preserved verbatim from the reference's
    grayscale-to-RGB path (util/util.py:17-18 "(image_numpy - 0.5) * 2");
    use tensor2mask for plain grayscale scaling."""
    img = np.asarray(arr)[idx].astype(np.float32)
    if img.shape[-1] == 1:
        img = np.tile((img - 0.5) * 2, (1, 1, 3))
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def tensor2mask(arr: np.ndarray, idx: int = 0) -> np.ndarray:
    img = np.asarray(arr)[idx].astype(np.float32)
    if img.shape[-1] == 1:
        img = np.tile(img, (1, 1, 3))
    return np.clip(img * 255.0, 0, 255).astype(np.uint8)


def tensor2att(arr: np.ndarray, idx: int = 0) -> np.ndarray:
    """Attention map -> JET colormap RGB."""
    img = np.asarray(arr)[idx].astype(np.float32)
    gray = np.clip(img[..., 0] * 255.0, 0, 255).astype(np.uint8)
    return cv2.applyColorMap(gray, cv2.COLORMAP_JET)[:, :, ::-1]


def tensor2flow(arr: np.ndarray, idx: int = 0) -> np.ndarray:
    from ffwm_tpu.utils.flow_viz import grid_to_flow_image

    return grid_to_flow_image(np.asarray(arr)[idx])


def save_image(img_rgb: np.ndarray, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, img_rgb[:, :, ::-1])


class HTMLIndex:
    """Minimal self-contained image-grid page (replaces dominate)."""

    def __init__(self, web_dir: str, title: str, refresh: int = 0):
        self.web_dir = web_dir
        self.img_dir = join(web_dir, "images")
        os.makedirs(self.img_dir, exist_ok=True)
        self.title = title
        self.refresh = refresh
        self.rows = []  # (header, [(img, label), ...])

    def add_images(self, header: str, images_labels) -> None:
        self.rows.append((header, list(images_labels)))

    def save(self) -> None:
        head = f"<title>{self.title}</title>"
        if self.refresh:
            head += f'<meta http-equiv="refresh" content="{self.refresh}">'
        body = []
        for header, imgs in self.rows:
            body.append(f"<h3>{header}</h3><table border='1'><tr>")
            for img, label in imgs:
                body.append(
                    f"<td><p>{label}</p><img src='images/{img}' width='256'></td>")
            body.append("</tr></table>")
        with open(join(self.web_dir, "index.html"), "w") as f:
            f.write(f"<html><head>{head}</head><body>{''.join(body)}</body></html>")


class Visualizer:
    def __init__(self, name: str, checkpoints_dir: str = "./checkpoints",
                 phase: str = "train", datamode: str = "multipie",
                 use_html: bool = True, tensorboard: bool = False):
        self.name = name
        self.ckpt_dir = join(checkpoints_dir, name)
        self.web_dir = join(self.ckpt_dir, "web")
        self.img_dir = join(self.web_dir, "images")
        self.test_dir = join(self.ckpt_dir, "test", datamode)
        self.use_html = use_html
        os.makedirs(self.img_dir, exist_ok=True)
        self.log_name = join(self.ckpt_dir, f"{phase}_loss_log.txt"
                             if phase == "train" else "test_log.txt")
        with open(self.log_name, "a") as f:
            f.write(f"=== {self.name} ({time.strftime('%c')}) ===\n")
        self.saved_epochs = []
        self.tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter  # optional

                self.tb = SummaryWriter(join(self.ckpt_dir, "tb"))
            except ImportError:
                print("tensorboardX unavailable; scalar logging to text only")

    # ------------------------------------------------------------- train
    def display_current_results(self, visuals: Mapping[str, np.ndarray],
                                epoch: int, converters: Optional[Dict] = None):
        converters = converters or {}
        for label, arr in visuals.items():
            conv = converters.get(label, tensor2im)
            save_image(conv(arr), join(self.img_dir, f"epoch{epoch:03d}_{label}.png"))
        if self.use_html:
            page = HTMLIndex(self.web_dir, f"Experiment = {self.name}", refresh=0)
            for e in range(epoch, 0, -1):
                page.add_images(
                    f"epoch [{e}]",
                    [(f"epoch{e:03d}_{k}.png", k) for k in visuals],
                )
            page.save()
        if self.tb:
            for label, arr in visuals.items():
                conv = converters.get(label, tensor2im)
                self.tb.add_image(f"img/{label}", conv(arr), epoch,
                                  dataformats="HWC")

    def print_current_losses(self, epoch: int, iters: int,
                             losses: Mapping[str, float],
                             t_comp: float, t_data: float) -> str:
        msg = f"(epoch: {epoch}, iters: {iters}, time: {t_comp:.3f}, data: {t_data:.3f}) "
        msg += " ".join(f"{k}: {float(v):.3f}" for k, v in losses.items())
        print(msg, flush=True)
        with open(self.log_name, "a") as f:
            f.write(msg + "\n")
        if self.tb:
            for k, v in losses.items():
                self.tb.add_scalar(f"iter_loss/{k}", float(v), iters)
        return msg

    # -------------------------------------------------------------- test
    def display_test_results(self, visuals: Mapping[str, np.ndarray],
                             idx: int = 0, prefix: str = "",
                             converters: Optional[Dict] = None):
        converters = converters or {}
        os.makedirs(self.test_dir, exist_ok=True)
        for label, arr in visuals.items():
            conv = converters.get(label, tensor2im)
            save_image(conv(arr, idx), join(self.test_dir, f"{prefix}_{label}.png"))

    def print_test_results(self, metric) -> None:
        s = str(metric)
        print(s, flush=True)
        with open(self.log_name, "a") as f:
            f.write(s + "\n")
