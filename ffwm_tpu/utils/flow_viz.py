"""Flow field -> color image (Middlebury color wheel).

Rebuild of util/flow_util.py + util/util.py:tensor2flow: a [-1,1] sampling
grid is first converted to pixel *motion* relative to the identity grid,
then rendered with the standard Middlebury wheel.
"""

from __future__ import annotations

import numpy as np


def _color_wheel() -> np.ndarray:
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    ncols = ry + yg + gc + cb + bm + mr
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    wheel[col:col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col:col + yg, 1] = 255
    col += yg
    wheel[col:col + gc, 1] = 255
    wheel[col:col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    wheel[col:col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col:col + cb, 2] = 255
    col += cb
    wheel[col:col + bm, 2] = 255
    wheel[col:col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    wheel[col:col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col:col + mr, 0] = 255
    return wheel


_WHEEL = _color_wheel()


def motion_to_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Middlebury encoding of a (u, v) motion field -> uint8 RGB."""
    rad = np.sqrt(u**2 + v**2)
    maxrad = max(rad.max(), 1e-8)
    u, v = u / maxrad, v / maxrad
    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    ncols = _WHEEL.shape[0]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    for c in range(3):
        col0 = _WHEEL[k0, c] / 255.0
        col1 = _WHEEL[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        col = np.where(rad <= 1, 1 - rad * (1 - col), col * 0.75)
        img[..., c] = np.floor(255 * col).astype(np.uint8)
    return img


def grid_to_flow_image(grid: np.ndarray) -> np.ndarray:
    """[H, W, 2] sampling grid in [-1,1] -> RGB flow visualization.

    Converts the grid to pixel motion like the reference tensor2flow
    (util/util.py:25-43): clamp to the image, subtract the identity grid.
    """
    h, w, _ = grid.shape
    # H scales/clips BOTH axes — preserved verbatim from the reference
    # (util/util.py:36 "(flow + 1) * (H / 2)" clamped to H-1 for both
    # channels); all live flows are square so the quirk is invisible
    gx = np.clip((grid[..., 0] + 1) * (h / 2), 0, h - 1)
    gy = np.clip((grid[..., 1] + 1) * (h / 2), 0, h - 1)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    return motion_to_color(gx - xs, gy - ys)
