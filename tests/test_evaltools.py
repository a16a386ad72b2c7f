"""Evaluation-tool tests on synthetic geometry."""
import numpy as np
import pytest

from factored_neus_tpu.evaltools import pointcloud as PC
from factored_neus_tpu.evaltools.clean_mesh import largest_component
from factored_neus_tpu.evaltools.epfl import sample_points_uniformly
from factored_neus_tpu.evaltools.shiny import plane_from_points
from factored_neus_tpu.native import marching_cubes
from factored_neus_tpu.data import idr_cameras as IDR


def _sphere_mesh(res=32, r=0.5):
    x = np.linspace(-1, 1, res, dtype=np.float32)
    xx, yy, zz = np.meshgrid(x, x, x, indexing="ij")
    grid = -(np.sqrt(xx ** 2 + yy ** 2 + zz ** 2) - r)
    v, t = marching_cubes(grid, 0.0)
    return v / (res - 1.0) * 2.0 - 1.0, t


def test_sample_mesh_points_density():
    # coarse mesh + fine sampling density -> interior grid samples appear
    verts, tris = _sphere_mesh(res=12)
    pts = PC.sample_mesh_points(verts, tris, thresh=0.02)
    assert len(pts) > 2 * len(verts)
    radii = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(radii.mean(), 0.5, atol=0.08)


def test_downsample_enforces_min_spacing():
    rng = np.random.RandomState(0)
    pts = rng.rand(2000, 3).astype(np.float32) * 0.2    # dense cluster
    down = PC.downsample(pts, thresh=0.05)
    assert len(down) < len(pts)
    # no two kept points closer than the radius
    d2 = ((down[:, None] - down[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, 1.0)
    assert d2.min() > 0.05 ** 2 - 1e-9


def test_nn_distances_symmetric_zero():
    pts = np.random.RandomState(1).rand(100, 3).astype(np.float32)
    d = PC.nn_distances(pts, pts)
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_chamfer_of_shifted_spheres():
    """d2s between a sphere and itself shifted by eps ~ eps."""
    v1, t1 = _sphere_mesh()
    eps = 0.05
    p1 = PC.sample_mesh_points(v1, t1, 0.05)
    p2 = p1 + np.array([eps, 0, 0])
    d = PC.nn_distances(p1, p2)
    assert d.mean() < eps + 1e-3
    assert d.mean() > 0.3 * eps


def test_plane_from_points_positive_z():
    n, D = plane_from_points([[1, 0, 0], [0, 0, 0], [0, 1, 0]])
    assert n[2] > 0
    # points above/below classify correctly
    assert (np.array([0, 0, 1]) @ n - D) > 0
    assert (np.array([0, 0, -1]) @ n - D) < 0


def test_largest_component():
    # two disconnected triangles clusters: big (2 faces) and small (1 face)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],   # big
                      [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float64)  # small
    faces = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]])
    v, f = largest_component(verts, faces)
    assert len(f) == 2 and len(v) == 4
    np.testing.assert_allclose(v[:, 2], 0.0)


def test_sample_points_uniformly_area_weighted():
    # one huge triangle + one tiny: samples should land ~proportional to area
    verts = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0],
                      [100, 100, 0], [100.1, 100, 0], [100, 100.1, 0]])
    faces = np.array([[0, 1, 2], [3, 4, 5]])
    pts = sample_points_uniformly(verts, faces, 10000, seed=0)
    frac_big = (pts[:, 0] < 50).mean()
    assert frac_big > 0.999


def test_quat_rot_roundtrip():
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    q = rng.randn(8, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1                    # canonical hemisphere
    R = IDR.quat_to_rot(jnp.asarray(q))
    # proper rotations
    eye = np.einsum("bij,bkj->bik", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    q2 = np.asarray(IDR.rot_to_quat(R))
    np.testing.assert_allclose(q2, q, atol=1e-4)


def test_sphere_intersection():
    import jax.numpy as jnp
    cam = jnp.asarray([[0.0, 0.0, -2.0]])
    dirs = jnp.asarray([[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]])  # hit, miss
    inter, mask = IDR.get_sphere_intersection(cam, dirs, r=1.0)
    assert bool(mask[0, 0]) and not bool(mask[0, 1])
    np.testing.assert_allclose(np.asarray(inter[0, 0]), [1.0, 3.0], atol=1e-5)
