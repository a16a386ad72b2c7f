"""Host-side image loading (I/O boundary; arrays then live on device).

Behavior parity: ref:models/rend_util.py:10-34 (load_rgb gamma-linearizes
non-EXR files; load_mask thresholds alpha at 0.5) and the /256 normalization
quirk of the DTU loader (ref:models/dataset.py:61-64 — the reference divides
8-bit images by 256, not 255; we reproduce it for parity).
"""
from __future__ import annotations

import os

import numpy as np

try:                               # cv2 is present in this image; imageio too
    import cv2 as _cv
except Exception:                  # pragma: no cover
    _cv = None
import imageio.v2 as _imageio


def imread_bgr_norm256(path: str) -> np.ndarray:
    """8-bit image as float BGR / 256 (DTU convention, cv2 channel order)."""
    if _cv is not None:
        img = _cv.imread(path)
    else:
        img = _imageio.imread(path)[..., :3][..., ::-1]
    return np.asarray(img, np.float64) / 256.0


def load_rgb(path: str) -> np.ndarray:
    """float RGB; EXR stays linear, LDR is gamma-2.2 linearized.
    ref:models/rend_util.py:10-17."""
    if path.endswith(".exr"):
        try:
            img = _imageio.imread(path)
        except Exception:
            from .exr import read_exr   # self-contained fallback backend
            img = read_exr(path)
        return np.float32(img)[..., :3]
    img = _imageio.imread(path)
    img = np.float32(img)[..., :3]
    img = img / 255.0
    return np.power(img, 2.2)


def load_mask(path: str) -> np.ndarray:
    """bool object mask from an L-mode alpha image. ref:rend_util.py:20-25."""
    alpha = _imageio.imread(path, mode="L")
    return (np.float32(alpha) / 255.0) > 0.5


def load_nerfactor_mask(path: str) -> np.ndarray:
    """bool mask from the alpha channel of an RGBA image.
    ref:rend_util.py:28-34."""
    if _cv is not None:
        alpha = _cv.imread(path, _cv.IMREAD_UNCHANGED)[:, :, 3]
    else:
        alpha = _imageio.imread(path)[:, :, 3]
    return (np.float32(alpha) / 255.0) > 0.5


def imread_tiff(path: str) -> np.ndarray:
    """Float TIFF reader: tifffile when present, else PIL/imageio (the Shiny
    datasets store disparity masks as float32 TIFFs, ref:dataset.py:584)."""
    try:
        import tifffile
        return np.asarray(tifffile.imread(path))
    except ImportError:
        pass
    try:
        from PIL import Image
        return np.asarray(Image.open(path))
    except Exception:
        return np.asarray(_imageio.imread(path))


def imwrite(path: str, img: np.ndarray) -> None:
    """uint8 image write (BGR when cv2, matching the reference's cv.imwrite
    artifact conventions)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(img, 0, 255).astype(np.uint8)
    if _cv is not None:
        _cv.imwrite(path, arr)
    else:
        _imageio.imwrite(path, arr[..., ::-1] if arr.ndim == 3 else arr)


def imresize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    if _cv is not None:
        return _cv.resize(img, (w, h))
    # nearest fallback
    ys = (np.linspace(0, img.shape[0] - 1, h)).astype(int)
    xs = (np.linspace(0, img.shape[1] - 1, w)).astype(int)
    return img[ys][:, xs]
