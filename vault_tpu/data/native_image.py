"""ctypes wrapper for the native image core (native/imagecore.cpp).

The core reimplements Pillow's fixed-point bicubic resample bit-exactly
(tested per build in tests/test_native_image.py) and fuses the
(x/255 - mean)/std normalize + HWC->CHW transpose, roughly halving the
host image-preprocessing cost (docs/BENCHMARKS.md "Host preprocessing").
``resize_normalize_native`` returns None when the library isn't built or
the input isn't contiguous uint8 RGB — callers fall back to the PIL/numpy
path, which produces identical values.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "libimagecore.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ic_resize_rgb8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.ic_resize_normalize.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float]
    lib.ic_normalize_chw.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float]
    _lib = lib
    return lib


def build_native_lib() -> bool:
    """Compile the shared library in-tree (idempotent)."""
    import subprocess

    try:
        subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)],
                       check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def available() -> bool:
    return _load_lib() is not None


def resize_rgb8_native(image: np.ndarray,
                       out_hw: Tuple[int, int]) -> Optional[np.ndarray]:
    """uint8 (H, W, 3) -> uint8 (oh, ow, 3), bit-identical to PIL BICUBIC."""
    lib = _load_lib()
    if lib is None or image.dtype != np.uint8 or image.ndim != 3 \
            or image.shape[2] != 3:
        return None
    img = np.ascontiguousarray(image)
    out = np.empty((*out_hw, 3), np.uint8)
    lib.ic_resize_rgb8(img.ctypes.data, img.shape[0], img.shape[1],
                       out.ctypes.data, out_hw[0], out_hw[1])
    return out


def resize_normalize_native(image: np.ndarray, out_hw: Tuple[int, int],
                            mean: float, std: float) -> Optional[np.ndarray]:
    """uint8 (H, W, 3) -> float32 (3, oh, ow) resized + normalized, or None
    when the native path can't serve this input."""
    lib = _load_lib()
    if lib is None or image.dtype != np.uint8 or image.ndim != 3 \
            or image.shape[2] != 3:
        return None
    img = np.ascontiguousarray(image)
    out = np.empty((3, *out_hw), np.float32)
    lib.ic_resize_normalize(img.ctypes.data, img.shape[0], img.shape[1],
                            out_hw[0], out_hw[1], out.ctypes.data,
                            out_hw[0], out_hw[1],
                            ctypes.c_float(mean), ctypes.c_float(std))
    return out
