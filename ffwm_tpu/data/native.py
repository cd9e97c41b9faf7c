"""ctypes bindings for the native C++ data plane (native/dataplane.cpp).

Builds the shared library on first use with g++ -O3 (cached next to the
source); every entry point has a numpy fallback, so the framework works
without a compiler. ctypes calls release the GIL — the loader's Python
threads get real host-core parallelism for the pixel work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "dataplane.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libffwm_dataplane.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        print(f"native dataplane build failed ({e}); using numpy fallbacks")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_LIB) or (os.path.getmtime(_LIB)
                                        < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError as e:
            print(f"native dataplane load failed ({e})")
            return None
        u8 = ctypes.POINTER(ctypes.c_uint8)
        f32 = ctypes.POINTER(ctypes.c_float)
        lib.rotate_u8.argtypes = [u8, u8, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_int, ctypes.c_double]
        lib.u8_to_f32.argtypes = [u8, f32, ctypes.c_int64]
        lib.u8_to_f32_parallel.argtypes = [u8, f32, ctypes.c_int64, ctypes.c_int]
        lib.hflip.argtypes = [u8, u8, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_int]
        lib.threshold_u8.argtypes = [u8, ctypes.c_int64]
        _lib = lib
        return _lib


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rotate_u8(img: np.ndarray, angle_deg: float) -> np.ndarray:
    """Rotate HWC uint8 about the center, bilinear, zero border."""
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    if lib is None:
        import cv2

        mat = cv2.getRotationMatrix2D((w // 2, h // 2), angle_deg, 1)
        out = cv2.warpAffine(img, mat, (w, h))
        return out if out.ndim == img.ndim else out[..., None]
    out = np.empty_like(img)
    lib.rotate_u8(_u8p(img), _u8p(out), h, w, c, float(angle_deg))
    return out


def u8_to_f32(img: np.ndarray, parallel: int = 0) -> np.ndarray:
    """uint8 -> float32 / 255."""
    lib = get_lib()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is None:
        return img.astype(np.float32) / 255.0
    out = np.empty(img.shape, np.float32)
    if parallel > 1:
        lib.u8_to_f32_parallel(_u8p(img), _f32p(out), img.size, parallel)
    else:
        lib.u8_to_f32(_u8p(img), _f32p(out), img.size)
    return out


def hflip(img: np.ndarray) -> np.ndarray:
    lib = get_lib()
    img = np.ascontiguousarray(img)
    if lib is None:
        return np.ascontiguousarray(img[:, ::-1])
    h, w = img.shape[:2]
    c = img.shape[2] if img.ndim == 3 else 1
    out = np.empty_like(img)
    lib.hflip(_u8p(img.view(np.uint8)), _u8p(out.view(np.uint8)),
              h, w, c, img.itemsize)
    return out


def threshold_u8(img: np.ndarray) -> np.ndarray:
    """Binarize (>0 -> 255) and return a NEW array. The native kernel works
    in place, so copy first: ascontiguousarray is a no-op for an
    already-contiguous uint8 input and would otherwise let the kernel
    silently mutate a caller's cached array (e.g. a preloaded mask) —
    diverging from the allocating numpy fallback."""
    lib = get_lib()
    if lib is None:
        # cast to uint8 BEFORE comparing, like the native path's copy does
        # (float 0.5 truncates to 0, int 256 wraps) — keeps both builds
        # bit-identical for any input dtype
        return np.where(np.asarray(img).astype(np.uint8) > 0, 255,
                        0).astype(np.uint8)
    img = np.array(img, np.uint8, copy=True)
    lib.threshold_u8(_u8p(img), img.size)
    return img
