"""Mask-based mesh cleaning: project vertices into all views, keep vertices
inside every dilated object mask, drop orphan faces, keep the largest
connected component.

Behavior parity: ref:clean_mesh_pose.py:22-73 (25x25 ellipse dilation,
+1 pixel shift with ones-border padding, largest component via face-graph
connectivity — we use a union-find instead of trimesh.split).
"""
from __future__ import annotations

import os
from glob import glob
from typing import Sequence, Tuple

import numpy as np


def _dilate_ellipse(mask: np.ndarray, ksize: int = 25) -> np.ndarray:
    # cv2 only: the sole caller already imports cv2 before reaching here,
    # so a fallback path could never run (and the scipy one previously
    # kept was rank/scale-broken — removed rather than maintained dead)
    import cv2 as cv
    kernel = cv.getStructuringElement(cv.MORPH_ELLIPSE, (ksize, ksize))
    return cv.dilate(mask.astype(np.uint8), kernel, iterations=1)


def clean_points_by_mask(points: np.ndarray, cameras_npz: str,
                         mask_paths: Sequence[str], n_images: int,
                         dilate_ksize: int = 25) -> np.ndarray:
    """Boolean keep-mask for vertices visible inside every view's dilated
    mask. ref:clean_mesh_pose.py:22-45."""
    import cv2 as cv

    cameras = np.load(cameras_npz)
    inside = np.ones(len(points), dtype=bool)
    for i in range(n_images):
        P = cameras[f"world_mat_{i}"]
        pts_img = (P[None, :3, :3] @ points[:, :, None])[..., 0] + P[None, :3, 3]
        pts_img = pts_img / pts_img[:, 2:]
        pts_img = np.round(pts_img).astype(np.int32) + 1

        mask_img = cv.imread(mask_paths[i])
        mask_img = _dilate_ellipse(mask_img, dilate_ksize)
        mask_img = mask_img[:, :, 0] > 128
        H, W = mask_img.shape
        # ones border so out-of-frame projections survive
        padded = np.ones((H + 2, W + 2), dtype=bool)
        padded[1:H + 1, 1:W + 1] = mask_img
        ys = pts_img[:, 1].clip(0, H + 1)
        xs = pts_img[:, 0].clip(0, W + 1)
        inside &= padded[ys, xs]
    return inside


def largest_component(vertices: np.ndarray, faces: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Keep the connected component with the most faces (connectivity over
    shared vertices; the trimesh.split equivalent at
    ref:clean_mesh_pose.py:70-71).  Vectorized via scipy's
    connected_components — the previous per-face python union-find took
    minutes on a million-face DTU extraction."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    n = len(vertices)
    rows = np.concatenate([faces[:, 0], faces[:, 1]])
    cols = np.concatenate([faces[:, 1], faces[:, 2]])
    adj = coo_matrix((np.ones(len(rows), np.int8), (rows, cols)),
                     shape=(n, n))
    _, labels = connected_components(adj, directed=False)
    face_roots = labels[faces[:, 0]]
    roots, counts = np.unique(face_roots, return_counts=True)
    best = roots[np.argmax(counts)]
    keep_faces = faces[face_roots == best]

    used = np.zeros(len(vertices), dtype=bool)
    used[keep_faces.ravel()] = True
    remap = np.full(len(vertices), -1, dtype=np.int64)
    remap[used] = np.arange(used.sum())
    return vertices[used], remap[keep_faces]


def clean_mesh(vertices: np.ndarray, faces: np.ndarray, cameras_npz: str,
               mask_paths: Sequence[str], n_images: int
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Full cleaning pipeline (ref:clean_mesh_pose.py:48-73)."""
    keep = clean_points_by_mask(vertices, cameras_npz, mask_paths, n_images)
    remap = np.full(len(vertices), -1, dtype=np.int64)
    remap[keep] = np.arange(keep.sum())
    face_keep = keep[faces].all(-1)
    new_faces = remap[faces[face_keep]]
    new_vertices = vertices[keep]
    return largest_component(new_vertices, new_faces)
