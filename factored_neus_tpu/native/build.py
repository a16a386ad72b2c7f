"""Build + load the native host library (marching tetrahedra, KD-tree).

Compiled lazily with g++ on first use; the .so is cached next to the sources
and rebuilt when any .cpp is newer.  ctypes bindings (no pybind11 in this
image).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfneus_native.so")
_SOURCES = ["marching_cubes.cpp", "kdtree.cpp"]
_LOCK = threading.Lock()
_LIB = None


def _needs_build() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    return any(os.path.getmtime(os.path.join(_DIR, s)) > so_mtime
               for s in _SOURCES)


def build() -> str:
    # compile to a temp path then atomically rename: a concurrent process
    # (parallel eval jobs on a fresh checkout) must never dlopen a
    # half-written .so.  -march=native is safe because the .so is always
    # built on the machine that loads it (it is gitignored, not shipped).
    tmp = _SO + f".tmp.{os.getpid()}"
    cmd = (["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", "-o", tmp]
           + [os.path.join(_DIR, s) for s in _SOURCES])
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        raise RuntimeError(
            f"native build failed (rc={e.returncode}):\n{e.stderr}") from e
    os.replace(tmp, _SO)
    return _SO


def load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _needs_build():
            build()
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            # stale binary from another machine/arch: rebuild locally
            build()
            lib = ctypes.CDLL(_SO)

        c_i64 = ctypes.c_int64
        c_f32p = ctypes.POINTER(ctypes.c_float)
        c_i32p = ctypes.POINTER(ctypes.c_int32)

        lib.marching_cubes.restype = ctypes.c_int
        lib.marching_cubes.argtypes = [
            c_f32p, c_i64, c_i64, c_i64, ctypes.c_float,
            ctypes.POINTER(c_f32p), ctypes.POINTER(c_i64),
            ctypes.POINTER(c_i32p), ctypes.POINTER(c_i64)]
        lib.mc_free.restype = None
        lib.mc_free.argtypes = [ctypes.c_void_p]

        lib.kdtree_build.restype = ctypes.c_void_p
        lib.kdtree_build.argtypes = [c_f32p, c_i64]
        lib.kdtree_free.restype = None
        lib.kdtree_free.argtypes = [ctypes.c_void_p]
        lib.kdtree_query.restype = None
        lib.kdtree_query.argtypes = [ctypes.c_void_p, c_f32p, c_i64,
                                     c_f32p, c_i32p]
        lib.kdtree_query_radius_count.restype = None
        lib.kdtree_query_radius_count.argtypes = [
            ctypes.c_void_p, c_f32p, c_i64, ctypes.c_float, c_i32p]
        lib.kdtree_greedy_downsample.restype = None
        lib.kdtree_greedy_downsample.argtypes = [
            c_f32p, c_i64, ctypes.c_float, ctypes.POINTER(ctypes.c_uint8)]

        _LIB = lib
        return lib
