"""ctypes bindings for the native C++ IO library (native/gs_io.cpp).

The reference's loaders are C++ (colmap_loader.cpp, tinyply); ours keep a C++
fast path for the variable-length binary walks that numpy cannot vectorize
(COLMAP points3D/images track skipping) while every caller degrades gracefully
to the pure-Python parsers when the shared library hasn't been built.

Build with:  make -C native   (produces native/libgsio.so)
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.path.join(here, "native", "libgsio.so"),
        os.path.join(os.path.dirname(__file__), "libgsio.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def get_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.gsio_count_points.restype = ctypes.c_longlong
        lib.gsio_count_points.argtypes = [ctypes.c_char_p]
        lib.gsio_load_points.restype = ctypes.c_longlong
        lib.gsio_load_points.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
        ]
        lib.gsio_knn_mean_dist.restype = ctypes.c_int
        lib.gsio_knn_mean_dist.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def load_points_bin(path: str):
    """COLMAP points3D.bin via C++; None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = lib.gsio_count_points(path.encode())
    if n < 0:
        return None
    pos = np.empty((n, 3), np.float32)
    col = np.empty((n, 3), np.float32)
    err = np.empty((n,), np.float32)
    got = lib.gsio_load_points(
        path.encode(),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        col.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
    )
    if got != n:
        return None
    return pos, col, err


def knn_mean_dist(points: np.ndarray, k: int = 3):
    """Mean k-NN distance per point via the C++ grid index; None if
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty((pts.shape[0],), np.float32)
    rc = lib.gsio_knn_mean_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        pts.shape[0],
        k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None
