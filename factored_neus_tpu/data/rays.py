"""Device-side ray generation.

TPU-first replacement for the reference's CPU pixel gather + per-step
host->device copy (ref:models/dataset.py:133-151): camera tables and image
stacks are uploaded to HBM once at dataset construction; each training step
draws pixel indices with jax.random and gathers rays/colors entirely
on-device inside the jitted train step.  This removes the per-step host
boundary the reference pays (SURVEY.md §3.1 "process/device boundary").

Two camera conventions exist in the reference:
  * 'c2w'  — pose[:3,:3] rotates camera->world, pose[:3,3] is the origin
             (DTU/Sk3d/Synthetic/Shiny; ref:dataset.py:115-151)
  * 'w2c'  — pose is [R|t] world->camera; dirs use R^T, origin = -R^T t
             (GlossySynthetic/GlossyReal "nero" convention;
             ref:dataset.py:735-778)
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pixel_to_dir_c2w(intr_inv, pose, p):
    """p [...,3] homogeneous pixels -> world unit dirs (c2w convention)."""
    cam = jnp.einsum("ij,...j->...i", intr_inv[:3, :3], p)
    cam = cam / jnp.linalg.norm(cam, axis=-1, keepdims=True)
    return jnp.einsum("ij,...j->...i", pose[:3, :3], cam)


def pixel_to_dir_w2c(intr_inv, pose, p):
    """'nero' convention: v = R^T K^-1 p, normalized after rotation."""
    cam = jnp.einsum("ij,...j->...i", intr_inv[:3, :3], p)
    world = jnp.einsum("ji,...j->...i", pose[:3, :3], cam)
    return world / jnp.linalg.norm(world, axis=-1, keepdims=True)


def origin_c2w(pose):
    return pose[:3, 3]


def origin_w2c(pose):
    return -pose[:3, :3].T @ pose[:3, 3]


@functools.partial(jax.jit, static_argnames=("H", "W", "level", "convention"))
def gen_rays_grid(intr_inv, pose, H: int, W: int, level: int = 1,
                  convention: str = "c2w"):
    """Full-image ray grid at 1/level resolution -> (rays_o, rays_d) [h,w,3].

    Pixel coordinates replicate the reference's linspace(0, W-1, W//l)
    spacing (ref:dataset.py:115-131) so validation renders align.
    """
    tx = jnp.linspace(0.0, W - 1.0, W // level)
    ty = jnp.linspace(0.0, H - 1.0, H // level)
    px, py = jnp.meshgrid(tx, ty, indexing="xy")     # [h, w]
    p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)
    if convention == "c2w":
        # (the reference normalizes in camera space then rotates; the
        # rotation is orthonormal so the helper is identical)
        rays_d = pixel_to_dir_c2w(intr_inv, pose, p)
        rays_o = jnp.broadcast_to(origin_c2w(pose), rays_d.shape)
    else:
        rays_d = pixel_to_dir_w2c(intr_inv, pose, p)
        rays_o = jnp.broadcast_to(origin_w2c(pose), rays_d.shape)
    return rays_o, rays_d


@functools.partial(jax.jit,
                   static_argnames=("batch_size", "convention", "mask_ones",
                                    "roi_prob"))
def gen_random_rays(key, images, masks, intr_inv_all, pose_all, img_idx,
                    batch_size: int, convention: str = "c2w",
                    mask_ones: bool = False,
                    roi_boxes=None, roi_prob: float = 0.0):
    """One training batch, fully on device.

    images/masks: [n, H, W, 3] device arrays; img_idx: scalar int array.
    Returns (rays_o, rays_d, color, mask) each [B, ...].
    Mirrors ref:dataset.py:133-151 and the Sk3d ROI sampler
    (ref:dataset.py:279-322): with probability roi_prob a pixel is drawn from
    the (10px-dilated) ROI box, else uniformly from the full image (the
    reference excludes the box for the outside draws; at roi_prob=0.8 and
    typical box sizes the difference in outside coverage is negligible and
    uniform redraw keeps the gather single-pass on device).
    """
    n, H, W = images.shape[:3]
    kx, ky, kr = jax.random.split(key, 3)
    px = jax.random.randint(kx, (batch_size,), 0, W)
    py = jax.random.randint(ky, (batch_size,), 0, H)

    if roi_boxes is not None and roi_prob > 0.0:
        box = roi_boxes[img_idx]                     # [4] l, r, t, b
        left, right, top, bottom = box[0], box[1], box[2], box[3]
        left = jnp.maximum(0, left - 10)
        right = jnp.minimum(W, right + 10)
        top = jnp.maximum(0, top - 10)
        bottom = jnp.minimum(H, bottom + 10)
        k1, k2, k3 = jax.random.split(kr, 3)
        in_x = left + jax.random.randint(k1, (batch_size,), 0, 1 << 30) % \
            jnp.maximum(right - left, 1)
        in_y = top + jax.random.randint(k2, (batch_size,), 0, 1 << 30) % \
            jnp.maximum(bottom - top, 1)
        take_roi = jax.random.uniform(k3, (batch_size,)) < roi_prob
        px = jnp.where(take_roi, in_x, px)
        py = jnp.where(take_roi, in_y, py)

    color = images[img_idx][py, px]                     # [B, 3]
    if mask_ones:
        mask = jnp.full((batch_size, 3), 255.0 / 256.0)  # ref:dataset.py:315
    else:
        mask = masks[img_idx][py, px]

    p = jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32),
                   jnp.ones((batch_size,), jnp.float32)], axis=-1)
    intr_inv = intr_inv_all[img_idx]
    pose = pose_all[img_idx]
    if convention == "c2w":
        rays_d = pixel_to_dir_c2w(intr_inv, pose, p)
        rays_o = jnp.broadcast_to(origin_c2w(pose), rays_d.shape)
    else:
        rays_d = pixel_to_dir_w2c(intr_inv, pose, p)
        rays_o = jnp.broadcast_to(origin_w2c(pose), rays_d.shape)
    return rays_o, rays_d, color, mask[:, :1]


def near_far_from_sphere(rays_o, rays_d) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chord of the unit sphere along each ray. ref:dataset.py:186-192."""
    a = jnp.sum(rays_d ** 2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0
