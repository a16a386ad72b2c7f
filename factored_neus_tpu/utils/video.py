"""Video writing with graceful degradation.

The reference writes mp4s with cv.VideoWriter (ref:exp_runner.py:623-634,
ref:mateIllu.py:782-789). This environment may lack opencv/imageio-ffmpeg,
so: imageio -> cv2 -> PNG frame directory (always available; `ffmpeg -i
%04d.png out.mp4` reassembles).
"""
from __future__ import annotations

import os
from typing import List

import numpy as np


def write_video(path: str, frames: List[np.ndarray], fps: int = 30,
                bgr: bool = False) -> str:
    """frames: list of [H,W,3] uint8; bgr=True when they follow the cv2/DTU
    channel order (the loaders' convention for cv-loaded datasets). Returns
    the path actually written (the mp4, or the PNG frame directory when no
    encoder exists)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rgb = [np.ascontiguousarray(f[..., ::-1] if bgr else f) for f in frames]
    try:
        import imageio.v2 as imageio
        imageio.mimwrite(path, rgb, fps=fps, quality=9)
        if os.path.exists(path) and os.path.getsize(path) > 0:
            return path
    except Exception:
        pass
    try:
        import cv2 as cv
        h, w = rgb[0].shape[:2]
        wr = cv.VideoWriter(path, cv.VideoWriter_fourcc(*"mp4v"), fps,
                            (w, h))
        # cv.VideoWriter does NOT raise when the codec is unavailable —
        # construction succeeds and write() silently no-ops — so check
        # isOpened() and that a non-empty file actually landed on disk
        if wr.isOpened():
            for f in rgb:
                wr.write(np.ascontiguousarray(f[..., ::-1]))   # RGB -> BGR
            wr.release()
            if os.path.exists(path) and os.path.getsize(path) > 0:
                return path
        else:
            wr.release()
    except Exception:
        pass
    # last resort: PNG frame sequence next to the requested path; drop any
    # partial mp4 a mid-write encoder failure left behind so globs don't
    # pick up an unplayable file
    if os.path.exists(path):
        try:
            os.remove(path)
        except OSError:
            pass
    from ..data.images import imwrite
    frame_dir = os.path.splitext(path)[0] + "_frames"
    os.makedirs(frame_dir, exist_ok=True)
    for i, f in enumerate(rgb):
        imwrite(os.path.join(frame_dir, f"{i:04d}.png"), f[..., ::-1])
    return frame_dir
