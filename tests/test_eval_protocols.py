"""End-to-end runs of the full DTU and Shiny chamfer protocols on fabricated
ground truth (ObsMask/Plane .mat files, GT point clouds, predicted meshes)."""
import os

import numpy as np
import pytest

from factored_neus_tpu.meshing.ply import read_ply_points, write_ply
from factored_neus_tpu.native import marching_cubes


def _sphere_mesh(res=40, r=0.5, scale=10.0, center=(0, 0, 0)):
    x = np.linspace(-1, 1, res, dtype=np.float32)
    xx, yy, zz = np.meshgrid(x, x, x, indexing="ij")
    grid = -(np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - r)
    v, t = marching_cubes(grid, 0.0)
    v = (v / (res - 1.0) * 2.0 - 1.0) * scale + np.asarray(center)
    return v, t


def test_dtu_eval_protocol(tmp_path):
    from scipy.io import savemat
    from factored_neus_tpu.evaltools import dtu

    scene = 97
    dataset_dir = tmp_path / "dtu"
    eval_dir = tmp_path / "eval"
    os.makedirs(dataset_dir / "ObsMask")
    os.makedirs(dataset_dir / "Points" / "stl")

    # predicted mesh: sphere radius 5 (world units), GT: same sphere sampled
    verts, tris = _sphere_mesh(scale=10.0)          # sphere r=5 in [-10,10]
    mesh_path = str(tmp_path / "pred.ply")
    write_ply(mesh_path, verts, tris)

    rng = np.random.default_rng(0)
    gt = rng.normal(size=(50000, 3))
    gt = 5.0 * gt / np.linalg.norm(gt, axis=1, keepdims=True)
    write_ply(str(dataset_dir / "Points" / "stl" / f"stl{scene:03}_total.ply"),
              gt.astype(np.float32))

    # ObsMask: everything observed; grid resolution 1, bounds [-12,12]
    bb = np.array([[-12.0, -12.0, -12.0], [12.0, 12.0, 12.0]])
    obs = np.ones((24, 24, 24), dtype=np.uint8)
    savemat(str(dataset_dir / "ObsMask" / f"ObsMask{scene}_10.mat"),
            {"ObsMask": obs, "BB": bb, "Res": np.array([[1.0]])})
    # ground plane z = -6 (everything above)
    savemat(str(dataset_dir / "ObsMask" / f"Plane{scene}.mat"),
            {"P": np.array([[0.0], [0.0], [1.0], [6.0]])})

    d2s, s2d, overall = dtu.eval(mesh_path, scene, str(dataset_dir),
                                 str(eval_dir))
    # marching-tetra sphere at res 40 over 20 world units: ~0.25-unit facets
    assert d2s < 0.5 and s2d < 0.5, (d2s, s2d)
    assert overall == pytest.approx((d2s + s2d) / 2)
    assert (eval_dir / "result.txt").exists()
    assert (eval_dir / f"vis_{scene:03}_d2s.ply").exists()
    assert (eval_dir / f"vis_{scene:03}_s2d.ply").exists()
    # error-vis point cloud round-trips
    pts = read_ply_points(str(eval_dir / f"vis_{scene:03}_s2d.ply"))
    assert len(pts) == len(gt)


def test_shiny_eval_protocol(tmp_path):
    from factored_neus_tpu.evaltools.shiny import evaluation_shinyblender

    verts, tris = _sphere_mesh(scale=2.0)           # sphere r=1
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(30000, 3))
    gt = 1.0 * gt / np.linalg.norm(gt, axis=1, keepdims=True)
    gt_path = str(tmp_path / "dense_pcd.ply")
    write_ply(gt_path, gt.astype(np.float32))

    d2s, s2d, overall = evaluation_shinyblender(
        verts, tris, gt_path, str(tmp_path), downsample_density=0.05,
        max_dist_d=10.0, max_dist_t=10.0,
        points_for_plane=[[1, 0, -2], [0, 0, -2], [0, 1, -2]])
    assert d2s < 0.2 and s2d < 0.2
    assert (tmp_path / "vis_d2s.ply").exists()

    # nonvalid bbox culling: excluding a region should not raise and should
    # not increase d2s
    d2s2, _, _ = evaluation_shinyblender(
        verts, tris, gt_path, str(tmp_path), downsample_density=0.05,
        max_dist_d=10.0, max_dist_t=10.0,
        points_for_plane=[[1, 0, -2], [0, 0, -2], [0, 1, -2]],
        nonvalid_bbox=[[3.0, 3.0, 3.0], [2.0, 2.0, 2.0]])
    assert d2s2 <= d2s + 1e-6
