"""Native (C++) host-side kernels with lazy self-compilation.

``augment.cpp`` is compiled once with g++ into ``_augment.so`` next to
this file (no packaging machinery needed — the toolchain is part of the
deployment image).  Everything degrades gracefully: if the compiler or
the .so is unavailable, callers fall back to the numpy/scipy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SO = os.path.join(_HERE, "_augment.so")
_SRC = os.path.join(_HERE, "augment.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
        _SRC
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.crop_pad_rotate_f32.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, ctypes.c_float, ctypes.c_uint64,
    ]
    lib.translate_hflip_f32.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.c_uint64,
    ]
    lib.gather_rows_f32.argtypes = [
        f32p, i64p, f32p, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def crop_pad_rotate(x: np.ndarray, pad: int, max_deg: float,
                    seed: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    b, h, w, c = x.shape
    out = np.empty_like(x)
    lib.crop_pad_rotate_f32(x, out, b, h, w, c, pad, max_deg,
                            np.uint64(seed & (2**64 - 1)))
    return out


def translate_hflip(x: np.ndarray, frac: float, seed: int
                    ) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    b, h, w, c = x.shape
    out = np.empty_like(x)
    lib.translate_hflip_f32(x, out, b, h, w, c, frac,
                            np.uint64(seed & (2**64 - 1)))
    return out


def gather_rows(x: np.ndarray, idx: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x2 = np.ascontiguousarray(x.reshape(len(x), -1), np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx), x2.shape[1]), np.float32)
    lib.gather_rows_f32(x2, idx, out, len(idx), x2.shape[1])
    return out.reshape((len(idx),) + x.shape[1:])
