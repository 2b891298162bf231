r"""ctypes binding for the native host preprocessing library.

Builds ``geolib.cpp`` with g++ on first use (cached as ``libgeolib.so`` next
to the source) and exposes numpy-facing wrappers with the exact same
contracts as the pure-numpy implementations in
:mod:`geotransformer_tpu.preprocess.voxel` / ``.neighbors``. Falls back to
numpy transparently if no compiler is available.
"""

import ctypes
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "geolib.cpp")
_LIB = osp.join(_DIR, "libgeolib.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build():
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, "-o", _LIB],
        check=True, capture_output=True,
    )


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not osp.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.gt_grid_subsample.restype = ctypes.c_int64
            lib.gt_grid_subsample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.gt_radius_neighbors.restype = None
            lib.gt_radius_neighbors.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def _fptr(array):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(array):
    return array.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_available():
    return get_lib() is not None


def grid_subsample(points, lengths, voxel_size):
    """Native stack-mode voxel subsampling (same contract as preprocess.voxel)."""
    lib = get_lib()
    points = np.ascontiguousarray(points, dtype=np.float32)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    capacity = points.shape[0]
    out_points = np.empty((capacity, 3), dtype=np.float32)
    out_lengths = np.empty(lengths.shape[0], dtype=np.int64)
    total = lib.gt_grid_subsample(
        _fptr(points), _iptr(lengths), lengths.shape[0], float(voxel_size),
        _fptr(out_points), capacity, _iptr(out_lengths),
    )
    assert total >= 0, "native grid_subsample capacity overflow"
    return out_points[:total].copy(), out_lengths


def radius_search(q_points, s_points, q_lengths, s_lengths, radius, neighbor_limit):
    """Native stack-mode fixed-K radius search (same contract as preprocess.neighbors)."""
    lib = get_lib()
    q_points = np.ascontiguousarray(q_points, dtype=np.float32)
    s_points = np.ascontiguousarray(s_points, dtype=np.float32)
    q_lengths = np.ascontiguousarray(q_lengths, dtype=np.int64)
    s_lengths = np.ascontiguousarray(s_lengths, dtype=np.int64)
    out = np.empty((q_points.shape[0], neighbor_limit), dtype=np.int64)
    lib.gt_radius_neighbors(
        _fptr(q_points), _fptr(s_points), _iptr(q_lengths), _iptr(s_lengths),
        q_lengths.shape[0], float(radius), int(neighbor_limit), _iptr(out),
    )
    return out
