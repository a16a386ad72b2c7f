"""IDR-style camera utilities (quaternion poses, pixel lifting, sphere
intersection, depth).

Behavior parity: ref:models/rend_util.py:37-169.  The reference carries these
for IDR-format datasets; they are not on the active Factored-NeuS training
path (SURVEY.md §2.1 item 11) but are part of the public surface.  Pure jnp,
batched, no host loops.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize quaternions [N,4] (w,x,y,z) -> rotation matrices
    [N,3,3]. ref:rend_util.py:87-106."""
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qr, qi, qj, qk = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (qj ** 2 + qk ** 2)
    r01 = 2 * (qj * qi - qk * qr)
    r02 = 2 * (qi * qk + qr * qj)
    r10 = 2 * (qj * qi + qk * qr)
    r11 = 1 - 2 * (qi ** 2 + qk ** 2)
    r12 = 2 * (qj * qk - qi * qr)
    r20 = 2 * (qk * qi - qj * qr)
    r21 = 2 * (qj * qk + qi * qr)
    r22 = 1 - 2 * (qi ** 2 + qj ** 2)
    return jnp.stack([
        jnp.stack([r00, r01, r02], -1),
        jnp.stack([r10, r11, r12], -1),
        jnp.stack([r20, r21, r22], -1)], axis=1)


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices [N,3,3] -> quaternions [N,4] (w-first trace form).
    ref:rend_util.py:109-127."""
    w = jnp.sqrt(jnp.maximum(1.0 + R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2],
                             1e-12)) / 2
    x = (R[:, 2, 1] - R[:, 1, 2]) / (4 * w)
    y = (R[:, 0, 2] - R[:, 2, 0]) / (4 * w)
    z = (R[:, 1, 0] - R[:, 0, 1]) / (4 * w)
    return jnp.stack([w, x, y, z], axis=-1)


def lift(x, y, z, intrinsics):
    """Pixels -> homogeneous camera points (IDR's -y/-z convention).
    ref:rend_util.py:69-84."""
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]
    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    return jnp.stack([x_lift, -y_lift, -z, jnp.ones_like(z)], axis=-1)


def get_camera_params(uv, pose, intrinsics):
    """(ray_dirs [B,S,3], cam_loc [B,3]) from pixel uv and either 7-vector
    (quat+loc) or matrix poses. ref:rend_util.py:37-66."""
    if pose.shape[1] == 7:
        cam_loc = pose[:, 4:]
        R = quat_to_rot(pose[:, :4])
        p = jnp.tile(jnp.eye(4), (pose.shape[0], 1, 1))
        p = p.at[:, :3, :3].set(R).at[:, :3, 3].set(cam_loc)
    else:
        cam_loc = pose[:, :3, 3]
        p = jnp.tile(jnp.eye(4), (pose.shape[0], 1, 1))
        p = p.at[:, :3, :4].set(pose[:, :3, :4])

    B, S, _ = uv.shape
    z = jnp.ones((B, S))
    pts_cam = lift(uv[:, :, 0], uv[:, :, 1], z, intrinsics)      # [B,S,4]
    world = jnp.einsum("bij,bsj->bsi", p, pts_cam)[:, :, :3]
    dirs = world - cam_loc[:, None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=2, keepdims=True)
    return dirs, cam_loc


def get_sphere_intersection(cam_loc, ray_directions, r: float = 1.0
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(near/far intersections [B,S,2] clamped to 0.01, hit mask [B,S]) of
    rays with the radius-r origin sphere. ref:rend_util.py:130-152."""
    ray_cam_dot = jnp.einsum("bsi,bi->bs", ray_directions, cam_loc)
    under_sqrt = ray_cam_dot ** 2 - (
        jnp.sum(cam_loc ** 2, -1)[:, None] - r ** 2)
    mask = under_sqrt > 0
    sq = jnp.sqrt(jnp.maximum(under_sqrt, 0.0))
    inter = jnp.stack([-sq, sq], axis=-1) - ray_cam_dot[..., None]
    inter = jnp.where(mask[..., None], inter, 0.0)
    return jnp.maximum(inter, 0.01), mask


def get_depth(points, pose):
    """Camera-frame depth of world points. ref:rend_util.py:155-169."""
    B, S, _ = points.shape
    if pose.shape[1] == 7:
        cam_loc = pose[:, 4:]
        R = quat_to_rot(pose[:, :4])
        pose_m = jnp.tile(jnp.eye(4), (B, 1, 1))
        pose_m = pose_m.at[:, :3, 3].set(cam_loc).at[:, :3, :3].set(R)
    else:
        pose_m = pose
    pts_hom = jnp.concatenate([points, jnp.ones((B, S, 1))], axis=2)
    pts_cam = jnp.einsum("bij,bsj->bsi", jnp.linalg.inv(pose_m), pts_hom)
    return pts_cam[:, :, 2:3]
