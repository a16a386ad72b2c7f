"""Native host components (C++, ctypes-bound): iso-surface extraction and
KD-tree nearest-neighbor, replacing the reference's PyMCubes / sklearn
compiled dependencies (SURVEY.md §2.4)."""
from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

from .build import build, load  # noqa: F401


def marching_cubes(grid: np.ndarray, iso: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """(vertices [V,3] float32 in grid-index coords, triangles [T,3] int32).

    Same call contract as `mcubes.marching_cubes(u, threshold)`
    (ref:models/renderer.py:35)."""
    lib = load()
    g = np.ascontiguousarray(grid, dtype=np.float32)
    nx, ny, nz = g.shape
    # the C++ edge-dedup cache packs two corner ids into one uint64 as
    # (ka<<32)|kb — corner ids must fit 32 bits or distinct edges collide
    if (nx + 1) * (ny + 1) * (nz + 1) >= (1 << 32):
        raise ValueError(
            f"grid {g.shape} exceeds the 32-bit corner-id limit of the "
            "edge cache (~1600^3); tile the extraction instead")
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.marching_cubes(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        ctypes.c_float(iso), ctypes.byref(vp), ctypes.byref(nv),
        ctypes.byref(tp), ctypes.byref(nt))
    if rc != 0:
        raise MemoryError("marching_cubes allocation failed")
    try:
        verts = np.ctypeslib.as_array(vp, shape=(nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(tp, shape=(nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mc_free(vp)
        lib.mc_free(tp)
    return verts, tris


class KDTree:
    """Nearest-neighbor queries on a fixed point cloud (C++, threaded)."""

    def __init__(self, points: np.ndarray):
        self._lib = load()
        pts = np.ascontiguousarray(points, dtype=np.float32)
        assert pts.ndim == 2 and pts.shape[1] == 3
        self._n = len(pts)
        self._handle = self._lib.kdtree_build(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), self._n)

    def query(self, queries: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(distances [M], indices [M]) of the nearest tree point."""
        q = np.ascontiguousarray(queries, dtype=np.float32)
        m = len(q)
        dist = np.empty(m, np.float32)
        idx = np.empty(m, np.int32)
        self._lib.kdtree_query(
            self._handle, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            m, dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return dist, idx

    def query_radius_count(self, queries: np.ndarray, radius: float
                           ) -> np.ndarray:
        q = np.ascontiguousarray(queries, dtype=np.float32)
        m = len(q)
        cnt = np.empty(m, np.int32)
        self._lib.kdtree_query_radius_count(
            self._handle, q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            m, ctypes.c_float(radius),
            cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return cnt

    def __del__(self):
        try:
            self._lib.kdtree_free(self._handle)
        except Exception:
            pass


def greedy_downsample(points: np.ndarray, radius: float) -> np.ndarray:
    """Boolean keep-mask from the greedy radius-suppression downsample
    (native; replicates ref:evaluation/dtu_eval.py:85-93)."""
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = len(pts)
    keep = np.empty(n, np.uint8)
    load().kdtree_greedy_downsample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        ctypes.c_float(radius),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return keep.astype(bool)
