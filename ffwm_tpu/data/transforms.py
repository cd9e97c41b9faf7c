"""Generic numpy image transforms — pix2pix-template parity surface.

Rebuild of the reference's BaseDataset transform helpers
(data/base_dataset.py:46-157: resize/scale-width/crop/flip pipelines keyed
by a ``preprocess`` spec plus deterministic shared params). FaceDataset does
its own cv2 pipeline — these exist for dataset authors porting pix2pix-style
datasets onto ffwm_tpu. All functions take/return HWC numpy arrays.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def resize(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    out = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_CUBIC)
    return out if out.ndim == img.ndim else out[..., None]


def scale_width(img: np.ndarray, target_width: int, crop_width: int) -> np.ndarray:
    h, w = img.shape[:2]
    if w == target_width and h >= crop_width:
        return img
    nw = target_width
    nh = max(int(round(target_width * h / w)), crop_width)
    return resize(img, (nh, nw))


def crop(img: np.ndarray, pos: Tuple[int, int], size: int) -> np.ndarray:
    y, x = pos
    return img[y:y + size, x:x + size]


def flip(img: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(img[:, ::-1])


def make_power_2(img: np.ndarray, base: int = 4) -> np.ndarray:
    h, w = img.shape[:2]
    nh = int(round(h / base) * base)
    nw = int(round(w / base) * base)
    if (nh, nw) == (h, w):
        return img
    return resize(img, (nh, nw))


def get_params(preprocess: str, load_size: int, crop_size: int,
               im_shape: Tuple[int, int],
               rng: Optional[np.random.RandomState] = None) -> Dict:
    """Shared random params so paired images transform identically
    (reference get_params, data/base_dataset.py:46-60)."""
    rng = rng or np.random.RandomState()
    h, w = im_shape
    if "resize" in preprocess:
        nh = nw = load_size
    elif "scale_width" in preprocess:
        nw, nh = load_size, int(load_size * h / w)
    else:
        nh, nw = h, w
    x = rng.randint(0, max(nw - crop_size, 0) + 1)
    y = rng.randint(0, max(nh - crop_size, 0) + 1)
    return {"crop_pos": (y, x), "flip": bool(rng.rand() > 0.5)}


def get_transform(preprocess: str = "resize_and_crop", load_size: int = 286,
                  crop_size: int = 256, params: Optional[Dict] = None,
                  no_flip: bool = False,
                  normalize: bool = True) -> Callable[[np.ndarray], np.ndarray]:
    """Compose a transform pipeline from a preprocess spec
    (reference get_transform, data/base_dataset.py:63-94)."""
    steps: List[Callable[[np.ndarray], np.ndarray]] = []
    if "resize" in preprocess:
        steps.append(lambda im: resize(im, (load_size, load_size)))
    elif "scale_width" in preprocess:
        steps.append(lambda im: scale_width(im, load_size, crop_size))
    if "crop" in preprocess:
        if params is None:
            steps.append(lambda im: crop(
                im, ((im.shape[0] - crop_size) // 2,
                     (im.shape[1] - crop_size) // 2), crop_size))
        else:
            steps.append(lambda im: crop(im, params["crop_pos"], crop_size))
    if preprocess == "none":
        steps.append(make_power_2)
    if not no_flip and params is not None and params.get("flip"):
        steps.append(flip)
    if normalize:
        steps.append(lambda im: (im.astype(np.float32) / 255.0 - 0.5) / 0.5)

    def apply(im: np.ndarray) -> np.ndarray:
        for s in steps:
            im = s(im)
        return im

    return apply
