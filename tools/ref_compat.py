"""Shims that make /root/reference's torch training stack runnable on this
CPU-only image — used by the e2e parity harness and the torch-parity tests.

The reference needs: CUDA (absent), pyhocon / mcubes / trimesh / open3d /
icecream (not installed), and numpy<2.0's ``np.math``. Every shim is either
a no-op redirect (``.cuda()`` -> identity) or is backed by this framework's
own equivalent (HOCON parser, native marching cubes, PLY writer), so the
reference runs its real code paths.
"""
from __future__ import annotations

import math
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

_installed = False


def install(reference_path: str = REFERENCE) -> None:
    global _installed
    if _installed:
        return
    if REPO not in sys.path:
        sys.path.insert(0, REPO)

    import numpy as np
    if not hasattr(np, "math"):
        np.math = math

    # --- icecream ---------------------------------------------------------
    if "icecream" not in sys.modules:
        m = types.ModuleType("icecream")
        m.ic = lambda *a, **k: (a[0] if a else None)
        sys.modules["icecream"] = m

    # --- mcubes: back the reference's marching cubes with our native one --
    if "mcubes" not in sys.modules:
        from factored_neus_tpu.native import marching_cubes as _mc
        m = types.ModuleType("mcubes")
        m.marching_cubes = lambda grid, iso: _mc(np.asarray(grid), float(iso))
        sys.modules["mcubes"] = m

    # --- trimesh: minimal Trimesh with .export via our PLY writer ---------
    if "trimesh" not in sys.modules:
        from factored_neus_tpu.meshing.ply import write_ply

        class Trimesh:
            def __init__(self, vertices=None, faces=None, **kw):
                self.vertices = np.asarray(vertices)
                self.faces = None if faces is None else np.asarray(faces)

            def export(self, path):
                write_ply(path, self.vertices, self.faces)

            def apply_transform(self, T):
                T = np.asarray(T)
                v = np.concatenate([self.vertices,
                                    np.ones((len(self.vertices), 1))], -1)
                self.vertices = (v @ T.T)[:, :3]
                return self

        m = types.ModuleType("trimesh")
        m.Trimesh = Trimesh
        sys.modules["trimesh"] = m

    # --- open3d: attribute sink (imported at reference top level; the only
    # executed use in our runs is never reached) ----------------------------
    if "open3d" not in sys.modules:
        class _Sink:
            def __getattr__(self, name):
                return _Sink()

            def __call__(self, *a, **k):
                return _Sink()

        def _o3d_getattr(name):
            # importlib probes __path__/__spec__ etc. on every module in
            # sys.modules; answering those with a sink corrupts imports
            if name.startswith("__"):
                raise AttributeError(name)
            return _Sink()

        m = types.ModuleType("open3d")
        m.__getattr__ = _o3d_getattr
        sys.modules["open3d"] = m

    # --- pyhocon: backed by our HOCON-subset parser ------------------------
    if "pyhocon" not in sys.modules:
        from factored_neus_tpu.utils import hocon as H

        class ConfigFactory:
            @staticmethod
            def parse_string(text):
                return H.parse_string(text)

            @staticmethod
            def parse_file(path):
                return H.parse_file(path)

        m = types.ModuleType("pyhocon")
        m.ConfigFactory = ConfigFactory
        m.ConfigTree = H.ConfigTree
        sys.modules["pyhocon"] = m

    # --- tifffile: only the Shiny loader path touches it (unused on the
    # DTU parity scene); back it with our TIFF reader where possible --------
    if "tifffile" not in sys.modules:
        try:
            import tifffile  # noqa: F401
        except ImportError:
            from factored_neus_tpu.data import exr as _exr
            m = types.ModuleType("tifffile")
            m.imread = getattr(_exr, "read_tiff", None)
            m.imwrite = getattr(_exr, "write_tiff", None)
            sys.modules["tifffile"] = m

    # --- imageio: the reference's rend_util downloads the freeimage plugin
    # at import time; there is no network egress here (EXR paths unused on
    # the DTU parity scene) ---------------------------------------------------
    try:
        import imageio
        imageio.plugins.freeimage.download = lambda *a, **k: None
    except Exception:
        pass

    # --- torch: make .cuda() a no-op on CPU --------------------------------
    import torch
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
    # the reference pickles numpy scalars (iter_step) into its checkpoints;
    # torch>=2.6 weights_only loading rejects them by default. These are our
    # own harness-produced files.
    try:
        import numpy.dtypes as _npdt
        dtype_classes = [getattr(_npdt, n) for n in dir(_npdt)
                         if n.endswith("DType")]
        torch.serialization.add_safe_globals(
            [np._core.multiarray.scalar, np.dtype, np.int64, np.float64]
            + dtype_classes)
    except Exception:
        pass

    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    _installed = True
