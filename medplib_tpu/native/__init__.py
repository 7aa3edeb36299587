"""ctypes bindings for the native C++ preprocessing library.

Builds libmedplib_pp.so on first use (g++, cached next to the source) and
exposes numpy-friendly wrappers. data/preprocess.py uses these when
available and falls back to PIL/numpy otherwise — same numerics (the C++
resampler implements PIL's triangle-filter BILINEAR in float, parity within
1/255 of Pillow's fixed-point path; tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_LIB_PATH = os.path.join(_HERE, "libmedplib_pp.so")
_lock = threading.Lock()
_lib = None


def _build() -> str:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
           "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_library() -> Optional[ctypes.CDLL]:
    """Build (if needed) + load. Returns None when no toolchain exists."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.CalledProcessError):
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.pp_resize_longest.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p, i32p]
        lib.pp_sam_preprocess.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
            i32p, i32p]
        lib.pp_clip_preprocess.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p]
        lib.pp_encode_sparse_mask.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int]
        lib.pp_encode_sparse_mask.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def sam_preprocess(image_rgb: np.ndarray, size: int, mean: np.ndarray,
                   std: np.ndarray) -> Tuple[np.ndarray, Tuple[int, int]]:
    lib = load_library()
    src = np.ascontiguousarray(image_rgb, np.uint8)
    h, w = src.shape[:2]
    out = np.empty((size, size, 3), np.float32)
    rh, rw = ctypes.c_int(), ctypes.c_int()
    lib.pp_sam_preprocess(src, h, w, size,
                          np.ascontiguousarray(mean, np.float32),
                          np.ascontiguousarray(std, np.float32), out,
                          ctypes.byref(rh), ctypes.byref(rw))
    return out, (rh.value, rw.value)


def clip_preprocess(image_rgb: np.ndarray, size: int, mean: np.ndarray,
                    std: np.ndarray) -> np.ndarray:
    lib = load_library()
    src = np.ascontiguousarray(image_rgb, np.uint8)
    h, w = src.shape[:2]
    out = np.empty((size, size, 3), np.float32)
    lib.pp_clip_preprocess(src, h, w, size,
                           np.ascontiguousarray(mean, np.float32),
                           np.ascontiguousarray(std, np.float32), out)
    return out


def encode_sparse_mask(mask: np.ndarray):
    lib = load_library()
    src = np.ascontiguousarray(mask > 0, np.uint8)
    h, w = src.shape
    coords = np.empty((h * w, 2), np.int32)
    n = lib.pp_encode_sparse_mask(src, h, w, coords, h * w)
    return coords[:n]
