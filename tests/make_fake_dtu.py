"""Fabricate a DTU-format scene directory (cameras_sphere.npz + image/ +
mask/) from the analytic sphere scene — lets the CLI pipeline run end-to-end
without any external data (the reference ships none either)."""
import os

import numpy as np


def make_fake_dtu_scene(out_dir: str, n_views: int = 3, H: int = 64,
                        W: int = 80, radius: float = 3.0,
                        y_range=(0.4, 0.4)):
    """Analytic-sphere DTU-format scene. y_range=(lo, hi) spreads camera
    heights over the ring (default keeps the historical single-height
    ring; (0.2, 1.2) approximates DTU's elevation arc for 49-view runs,
    ref:models/dataset.py:41-96 49-64 view scans)."""
    import cv2 as cv

    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)

    focal = 1.1 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float64)
    cameras = {}
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        # deterministic elevation sweep across the ring (triangle wave so
        # neighbouring views differ in height, like a DTU scan arc)
        frac = (i % 7) / 6.0 if n_views > 1 else 0.0
        y = y_range[0] + (y_range[1] - y_range[0]) * frac
        c = np.array([radius * np.sin(ang), y, -radius * np.cos(ang)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        # c2w pose
        pose = np.eye(4)
        pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = \
            right, up2, fwd, c
        w2c = np.linalg.inv(pose)
        P = np.eye(4)
        P[:3, :4] = K @ w2c[:3, :4]
        cameras[f"world_mat_{i}"] = P.astype(np.float32)
        cameras[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)

        # analytic render: gray sphere r=0.5 on dark background
        ys, xs = np.mgrid[0:H, 0:W]
        p = np.stack([xs, ys, np.ones_like(xs)], -1).astype(np.float64)
        cam = p @ np.linalg.inv(K).T
        cam /= np.linalg.norm(cam, axis=-1, keepdims=True)
        d = cam @ pose[:3, :3].T
        b = 2 * (d @ c)
        c_ = (c @ c) - 0.25
        disc = b * b - 4 * c_
        hit = disc > 0
        t = (-b - np.sqrt(np.maximum(disc, 0))) / 2
        n = c[None, None] + t[..., None] * d
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        shade = np.clip(n[..., 1] * 0.5 + 0.5, 0, 1)
        img = np.where(hit[..., None], 0.25 + 0.55 * shade[..., None], 0.05)
        cv.imwrite(os.path.join(out_dir, "image", f"{i:06d}.png"),
                   (img * 255).astype(np.uint8).repeat(3, -1)
                   if img.shape[-1] == 1 else (img * 255).astype(np.uint8))
        mask = (hit[..., None] * np.ones(3)).astype(np.uint8) * 255
        cv.imwrite(os.path.join(out_dir, "mask", f"{i:06d}.png"), mask)

    np.savez(os.path.join(out_dir, "cameras_sphere.npz"), **cameras)
    return out_dir


TINY_CONF = """
general {{
    base_exp_dir_geo = {exp}/geometry
    base_exp_dir_lvis = {exp}/lvis
    base_exp_dir_mateIllu = {exp}/mateIllu
    recording = [ ./ ]
}}
dataset {{
    data_dir = {data}
    render_cameras_name = cameras_sphere.npz
    object_cameras_name = cameras_sphere.npz
}}
train {{
    learning_rate = 5e-4
    learning_rate_alpha = 0.05
    end_iter = {iters}
    batch_size = 64
    validate_resolution_level = 4
    warm_up_end = 2
    anneal_end = 0
    use_white_bkgd = False
    save_freq = {save_freq}
    val_freq = {val_freq}
    val_mesh_freq = {val_freq}
    report_freq = 4
    igr_weight = 0.1
    mask_weight = 0.1
    lvis {{
        batch_size = 32
        end_iter = {iters2}
        warm_up_end = 1
    }}
    metaIllu {{
        batch_size = 32
        end_iter = {iters2}
    }}
}}
model {{
    nerf {{
        D = 2,
        d_in = 4,
        d_in_view = 3,
        W = 32,
        multires = 4,
        multires_view = 2,
        output_ch = 4,
        skips = [],
        use_viewdirs = True
    }}
    sdf_network {{
        d_out = 65,
        d_in = 3,
        d_hidden = 64,
        n_layers = 2,
        skip_in = []
        multires = 4
        bias = 0.5
        scale = 1.0
        geometric_init = True
        weight_norm = True
    }}
    variance_network {{
        init_val = 0.3
    }}
    rendering_network {{
        d_feature = 64,
        mode = idr,
        d_in = 9,
        d_out = 3,
        d_hidden = 64,
        n_layers = 2
        weight_norm = True
        multires_view = 2
        squeeze_out = True
    }}
    neus_renderer {{
        n_samples = 16,
        n_importance = 16,
        n_outside = 0,
        up_sample_steps = 2
        perturb = 1.0
    }}
    lvis_renderer {{
        n_samples = 16,
        n_importance = 16,
        n_outside = 0,
        up_sample_steps = 2
        perturb = 1.0
    }}
}}
"""


def write_tiny_conf(path: str, data_dir: str, exp_dir: str, iters: int = 8,
                    iters2: int = 4):
    with open(path, "w") as f:
        f.write(TINY_CONF.format(data=data_dir, exp=exp_dir, iters=iters,
                                 iters2=iters2, save_freq=iters,
                                 val_freq=iters))
    return path
