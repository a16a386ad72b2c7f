"""Dataset-loader tests on fabricated format-faithful fixtures for every
family the reference supports (SURVEY §2.2)."""
import json
import os
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _write_png(path, img):
    import cv2 as cv
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))


def _blender_pose(ang, radius=3.0):
    """OpenGL/blender-convention c2w (camera looks down -z)."""
    c = np.array([radius * np.sin(ang), 0.0, radius * np.cos(ang)])
    fwd = c / np.linalg.norm(c)                   # blender: -z is view dir
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, fwd); right /= np.linalg.norm(right)
    up2 = np.cross(fwd, right)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, up2, fwd, c
    return pose


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def synthetic_dir(tmp_path_factory):
    """transforms_{train,test}.json + EXR rgb + mask pngs (+ test GT maps)."""
    from factored_neus_tpu.data.exr import write_exr
    root = str(tmp_path_factory.mktemp("synthetic"))
    H = W = 16
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        frames = []
        for i in range(2):
            name = f"{split}_{i:03d}"
            frames.append({"file_path": name,
                           "transform_matrix": _blender_pose(i).tolist()})
            img = rng.rand(H, W, 3).astype(np.float32)
            if split == "train":
                write_exr(os.path.join(root, name + "_rgb.exr"), img)
                _write_png(os.path.join(root, name + "_mask.png"),
                           np.ones((H, W)))
            else:
                _write_png(os.path.join(root, name + "_rgba.png"), img)
                _write_png(os.path.join(root, name + "_rough.png"),
                           np.full((H, W, 3), 0.4))
                _write_png(os.path.join(root, name + "_albedo.png"),
                           np.full((H, W, 3), 0.6))
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return root


def test_synthetic_dataset(synthetic_dir):
    from factored_neus_tpu.data.datasets import SyntheticDataset
    ds = SyntheticDataset({"data_dir": synthetic_dir}, split="train")
    assert ds.n_images == 2 and ds.H == 16 and ds.W == 16
    assert ds.masks.shape == (2, 16, 16, 3)
    rays_o, rays_d = ds.gen_rays_at(0)
    # pose scaled by 1/2 -> camera at radius 1.5
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_o[0, 0])),
                               1.5, atol=1e-4)
    # central ray points toward the origin (blender convert flips z)
    center = np.asarray(rays_d[8, 8])
    to_origin = -np.asarray(rays_o[8, 8])
    to_origin /= np.linalg.norm(to_origin)
    assert float(center @ to_origin) > 0.99

    test_ds = SyntheticDataset({"data_dir": synthetic_dir}, split="test")
    assert test_ds.albedo.shape == (2, 16, 16, 3)
    assert test_ds.rough.shape == (2, 16, 16, 3)


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def shiny_dir(tmp_path_factory):
    cv = pytest.importorskip("cv2")
    from PIL import Image
    root = str(tmp_path_factory.mktemp("shiny"))
    H = W = 16
    rng = np.random.RandomState(1)
    frames = []
    for i in range(2):
        name = f"r_{i}"
        frames.append({"file_path": name,
                       "transform_matrix": _blender_pose(i + 0.3).tolist()})
        _write_png(os.path.join(root, name + ".png"), rng.rand(H, W, 3))
        disp = np.zeros((H, W), np.float32)
        disp[4:12, 4:12] = 0.5
        Image.fromarray(disp, mode="F").save(
            os.path.join(root, name + "_disp.tiff"))
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)
    return root


def test_shiny_dataset(shiny_dir):
    from factored_neus_tpu.data.datasets import ShinyDataset
    ds = ShinyDataset({"data_dir": shiny_dir}, split="train")
    assert ds.n_images == 2
    m = np.asarray(ds.masks[0, :, :, 0])
    assert m[8, 8] == 1.0 and m[0, 0] == 0.0       # disp>0 thresholding
    # the scale_mat the reference leaves undefined must exist here
    np.testing.assert_allclose(ds.scale_mat,
                               np.diag([2.0, 2.0, 2.0, 1.0]))


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def glossy_synthetic_dir(tmp_path_factory):
    cv = pytest.importorskip("cv2")
    root = str(tmp_path_factory.mktemp("glossy_syn"))
    H = W = 16
    rng = np.random.RandomState(2)
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float32)
    for i in range(2):
        # w2c pose [R|t]
        ang = 2 * np.pi * i / 3
        c = np.array([2 * np.sin(ang), 0.3, -2 * np.cos(ang)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0, -1, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        R = np.stack([right, np.cross(fwd, right), fwd], axis=0)  # w2c rows
        t = -R @ c
        pose = np.concatenate([R, t[:, None]], axis=1).astype(np.float32)
        with open(os.path.join(root, f"{i}-camera.pkl"), "wb") as f:
            pickle.dump((pose, K), f)
        _write_png(os.path.join(root, f"{i}.png"), rng.rand(H, W, 3))
        depth = np.ones((H, W, 3)) * 0.95
        depth[4:12, 4:12] = 0.5                      # object = near depth
        _write_png(os.path.join(root, f"{i}-depth.png"), depth)
    return root


def test_glossy_synthetic_dataset(glossy_synthetic_dir):
    from factored_neus_tpu.data.datasets import GlossySyntheticDataset
    ds = GlossySyntheticDataset({"data_dir": glossy_synthetic_dir})
    assert ds.n_images == 2 and ds.convention == "w2c"
    m = np.asarray(ds.masks[0, :, :, 0])
    assert m[8, 8] == 1.0 and m[0, 0] == 0.0         # depth<0.9 mask
    rays_o, rays_d = ds.gen_rays_at(0)
    # origin = -R^T t = camera center (radius ~2.02)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_o[0, 0])),
                               np.sqrt(4 + 0.09), atol=1e-3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def glossy_real_dir(tmp_path_factory):
    cv = pytest.importorskip("cv2")
    from factored_neus_tpu.meshing.ply import write_ply
    root = str(tmp_path_factory.mktemp("glossy_real"))
    scene = os.path.join(root, "bear", "raw")
    os.makedirs(os.path.join(scene, "images"), exist_ok=True)
    os.makedirs(os.path.join(scene, "images_raw_1024"), exist_ok=True)
    H = W = 16
    rng = np.random.RandomState(3)

    poses, Ks, names, ids = {}, {}, {}, []
    K = np.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]], np.float64)
    for i in range(2):
        ang = 2 * np.pi * i / 3
        c = np.array([2 * np.sin(ang), 0.2, -2 * np.cos(ang)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0, -1, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        R = np.stack([right, np.cross(fwd, right), fwd], axis=0)
        t = -R @ c
        poses[i] = np.concatenate([R, t[:, None]], axis=1)
        Ks[i] = K
        names[i] = f"{i:06d}.png"
        ids.append(i)
        img = rng.rand(H, W, 3)
        _write_png(os.path.join(scene, "images", names[i]), img)
        _write_png(os.path.join(scene, "images_raw_1024", names[i]), img)
    with open(os.path.join(scene, "cache.pkl"), "wb") as f:
        pickle.dump((poses, Ks, names, ids), f)
    pts = rng.randn(500, 3) * 0.3
    write_ply(os.path.join(scene, "object_point_cloud.ply"),
              pts.astype(np.float32))
    return scene + "/"


def test_glossy_real_dataset(glossy_real_dir):
    from factored_neus_tpu.data.datasets import GlossyRealDataset
    ds = GlossyRealDataset({"data_dir": glossy_real_dir})
    assert ds.n_images == 2 and ds.convention == "w2c"
    # normalization: the reference point cloud lands inside the unit sphere
    assert np.linalg.norm(ds.ref_points, axis=1).max() <= 1.0 + 1e-6
    rays_o, rays_d = ds.gen_rays_at(0)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sk3d_dir(tmp_path_factory):
    cv = pytest.importorskip("cv2")
    root = str(tmp_path_factory.mktemp("sk3d"))
    img_dir = os.path.join(root, "tis_right/rgb/undistorted/ambient@best")
    cam_dir = os.path.join(root, "tis_right/idr_input")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(cam_dir, exist_ok=True)
    H, W = 16, 20
    rng = np.random.RandomState(4)
    K = np.array([[25.0, 0, 10, 0], [0, 25.0, 8, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float64)
    cams = {}
    for i in range(2):
        ang = 2 * np.pi * i / 3
        c = np.array([2.5 * np.sin(ang), 0.2, -2.5 * np.cos(ang)])
        fwd = -c / np.linalg.norm(c)
        up = np.array([0, -1, 0.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        w2c = np.eye(4)
        w2c[:3, :3] = np.stack([right, np.cross(fwd, right), fwd], 0)
        w2c[:3, 3] = -w2c[:3, :3] @ c
        cams[f"world_mat_{i}"] = (K @ w2c).astype(np.float32)
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)
        cams[f"roi_box_{i}"] = np.array([4, 16, 3, 13])   # l, r, t, b
        _write_png(os.path.join(img_dir, f"{i:04d}.png"), rng.rand(H, W, 3))
    np.savez(os.path.join(cam_dir, "cameras.npz"), **cams)
    return root


def test_sk3d_dataset_roi_sampling(sk3d_dir):
    import jax
    from factored_neus_tpu.data.datasets import Sk3dDataset
    ds = Sk3dDataset({"data_dir": sk3d_dir, "sample_roi_prob": 1.0})
    assert ds.n_images == 2 and ds.mask_ones
    ro, rd, color, mask = ds.gen_random_rays_at(0, 256,
                                                key=jax.random.PRNGKey(0))
    # mask is the constant 255/256 fill (ref:dataset.py:315)
    np.testing.assert_allclose(np.asarray(mask), 255.0 / 256.0)
    assert ro.shape == (256, 3)


def test_exr_roundtrip(tmp_path):
    from factored_neus_tpu.data.exr import read_exr, write_exr
    img = np.random.RandomState(0).rand(9, 13, 3).astype(np.float32)
    p = str(tmp_path / "t.exr")
    write_exr(p, img)
    back = read_exr(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)
    # half precision
    write_exr(p, img, half=True)
    back = read_exr(p)
    np.testing.assert_allclose(back, img, atol=2e-3)
    # single channel
    write_exr(p, img[..., 0])
    back = read_exr(p)
    assert back.shape == (9, 13, 1)
