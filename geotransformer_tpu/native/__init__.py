r"""ctypes binding for the native host preprocessing library.

Builds ``geolib.cpp`` with g++ on first use into a build cache keyed by a
hash of the source + compile flags (so a stale or foreign binary is never
loaded — binaries are not checked into git) and exposes numpy-facing
wrappers with the exact same contracts as the pure-numpy implementations in
:mod:`geotransformer_tpu.preprocess.voxel` / ``.neighbors``. Falls back to
numpy transparently if no compiler is available, and self-tests the library
on a tiny input before trusting it.
"""

import ctypes
import hashlib
import os
import os.path as osp
import subprocess
import threading

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_DIR, "geolib.cpp")
# No -march=native: the binary lands in a local build cache, but a portable
# ISA plus the self-test below keeps a copied cache from crashing at call time.
_FLAGS = ["-O3", "-shared", "-fPIC", "-std=c++17"]
_lock = threading.Lock()
_lib = None
_build_failed = False


def _lib_path():
    digest = hashlib.sha256(
        open(_SRC, "rb").read() + " ".join(_FLAGS).encode()
    ).hexdigest()[:16]
    return osp.join(_DIR, "build", f"libgeolib-{digest}.so")


def _build(lib_path):
    os.makedirs(osp.dirname(lib_path), exist_ok=True)
    subprocess.run(
        ["g++", *_FLAGS, _SRC, "-o", lib_path], check=True, capture_output=True
    )


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            lib_path = _lib_path()
            if not osp.exists(lib_path):
                _build(lib_path)
            lib = ctypes.CDLL(lib_path)
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
            _self_test(lib)
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def _self_test(lib):
    """Tiny end-to-end call so a broken binary fails here, not mid-pipeline."""
    pts = np.asarray([[0.0, 0.0, 0.0], [0.05, 0.0, 0.0], [1.0, 1.0, 1.0]], np.float32)
    lengths = np.asarray([3], np.int64)
    out_points = np.empty((3, 3), np.float32)
    out_lengths = np.empty(1, np.int64)
    total = lib.gt_grid_subsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1, 0.2, out_points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        3, out_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if total != 2 or out_lengths[0] != 2:
        raise RuntimeError(f"native geolib self-test failed (total={total})")


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
    if total < 0:
        # Capacity overflow (cannot happen with capacity == N since voxel
        # subsampling never grows the cloud, but the C contract allows it);
        # out buffers are garbage, so recompute with the numpy path.
        from geotransformer_tpu.preprocess import voxel as _voxel

        return _voxel.grid_subsample(points, lengths, voxel_size)
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
