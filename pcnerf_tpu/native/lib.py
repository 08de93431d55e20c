"""ctypes bindings for the native preprocessing core.

The shared library is built on demand (g++ is in the image); every entry
point has identical semantics to its C++ implementation documented in
``src/preprocess.cpp``.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    from pcnerf_tpu.native.build import build
    path = build()
    lib = ctypes.CDLL(path)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

    lib.pcnerf_ground_filter.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, u8p, u8p]
    lib.pcnerf_ground_filter.restype = None

    lib.pcnerf_region_grow.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_int64, i32p]
    lib.pcnerf_region_grow.restype = ctypes.c_int64

    lib.pcnerf_nn_distances.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float, f32p]
    lib.pcnerf_nn_distances.restype = None

    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def ground_filter(points: np.ndarray, *, num_iter: int = 3, num_lpr: int = 20,
                  th_seeds: float = 1.2, th_dist: float = 0.3,
                  sensor_height: float = 1.73, clip_height: float = 4.0,
                  min_distance: float = 0.0, max_distance: float = 1000.0):
    """Iterative plane-fit ground segmentation.

    Defaults are the reference launch-file parameters
    (``plane_ground_filter.launch:8-31``).  Returns (ground_mask,
    noground_mask) boolean arrays over the input points; the no-ground mask
    includes the clip-above/distance post-processing.
    """
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    g = np.zeros(n, np.uint8)
    ng = np.zeros(n, np.uint8)
    _load().pcnerf_ground_filter(pts, n, num_iter, num_lpr, th_seeds, th_dist,
                                 sensor_height, clip_height, min_distance,
                                 max_distance, g, ng)
    return g.astype(bool), ng.astype(bool)


def region_grow(points: np.ndarray, *, radius: float = 0.35,
                min_cluster: int = 15):
    """Radius region-growing clustering.

    Returns (labels, n_clusters): labels[i] in [0, n_clusters) for points in
    kept clusters (ordered by discovery), -1 for unclustered points.
    """
    pts = np.ascontiguousarray(points, dtype=np.float32)
    labels = np.empty(pts.shape[0], np.int32)
    k = _load().pcnerf_region_grow(pts, pts.shape[0], radius, min_cluster, labels)
    return labels, int(k)


def nn_distances(target: np.ndarray, query: np.ndarray, cell: float = 0.5):
    """Exact nearest-neighbor distance from each query point to the target
    set (grid-accelerated; CPU fallback for the CD/F-score metrics)."""
    t = np.ascontiguousarray(target, dtype=np.float32)
    q = np.ascontiguousarray(query, dtype=np.float32)
    out = np.empty(q.shape[0], np.float32)
    _load().pcnerf_nn_distances(t, t.shape[0], q, q.shape[0], cell, out)
    return out
