"""ctypes bindings for the native host runtime (native/tpu3d_native.cpp).

The reference's host runtime is C++ (thread pool, PLY parser, mask prep);
this module loads the framework's native equivalents when the shared
library is built (``make -C native``) and every caller degrades to the pure
Python path when it isn't — the .so is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    override = os.environ.get("TPU3D_NATIVE_LIB")
    if override:
        return override
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
        "libtpu3d_native.so",
    )


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.t3d_version.restype = ctypes.c_int
        lib.t3d_load_ply.restype = ctypes.c_int
        lib.t3d_load_ply.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.t3d_free.argtypes = [ctypes.c_void_p]
        lib.t3d_resize_mask_nearest.restype = ctypes.c_int
        lib.t3d_resize_mask_nearest.argtypes = [
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        if lib.t3d_version() != 1:
            return None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def load_ply(path: str):
    """Native PLY load → (points f32[N,3], colors f32[N,3]|None) or None if
    the library is unavailable or the file needs the Python fallback."""
    lib = _load()
    if lib is None:
        return None
    pts_p = ctypes.POINTER(ctypes.c_float)()
    col_p = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int(0)
    rc = lib.t3d_load_ply(
        path.encode(), ctypes.byref(pts_p), ctypes.byref(col_p),
        ctypes.byref(n),
    )
    if rc != 0 or n.value <= 0:
        return None
    count = n.value
    pts = np.ctypeslib.as_array(pts_p, shape=(count, 3)).copy()
    cols = None
    if col_p:
        cols = np.ctypeslib.as_array(col_p, shape=(count, 3)).copy()
    lib.t3d_free(ctypes.cast(pts_p, ctypes.c_void_p))
    if col_p:
        lib.t3d_free(ctypes.cast(col_p, ctypes.c_void_p))
    return pts, cols


def resize_mask_nearest_threshold(
    mask: np.ndarray, out_h: int, out_w: int, nthreads: int = 0
) -> Optional[np.ndarray]:
    """Native nearest resize + binarize (>10 → 255); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    out = np.empty((out_h, out_w), np.uint8)
    rc = lib.t3d_resize_mask_nearest(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        mask.shape[0],
        mask.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        out_h,
        out_w,
        nthreads,
    )
    return out if rc == 0 else None
