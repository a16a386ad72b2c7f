"""Native marching-tetrahedra + PLY I/O + grid extraction tests."""
import os
import tempfile

import numpy as np
import pytest

from factored_neus_tpu.native import KDTree, marching_cubes
from factored_neus_tpu.meshing.ply import (read_ply_mesh, read_ply_points,
                                           write_ply)
from factored_neus_tpu.meshing.extract import extract_fields, extract_geometry


def _sphere_grid(res, r=0.5):
    """-sdf grid of a sphere (positive inside), like the extraction caller."""
    x = np.linspace(-1, 1, res, dtype=np.float32)
    xx, yy, zz = np.meshgrid(x, x, x, indexing="ij")
    return -(np.sqrt(xx**2 + yy**2 + zz**2) - r)


def test_marching_cubes_sphere_accuracy():
    res = 48
    verts, tris = marching_cubes(_sphere_grid(res), 0.0)
    assert len(verts) > 100 and len(tris) > 100
    world = verts / (res - 1.0) * 2.0 - 1.0
    radii = np.linalg.norm(world, axis=-1)
    # surface within a voxel of r=0.5
    assert abs(radii.mean() - 0.5) < 2.0 / res
    assert radii.std() < 2.0 / res


def test_marching_cubes_watertight():
    verts, tris = marching_cubes(_sphere_grid(32), 0.0)
    # every undirected edge must be shared by exactly 2 triangles
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_marching_cubes_orientation():
    """Signed volume must be positive (outward normals) and close to the
    analytic sphere volume."""
    res = 48
    verts, tris = marching_cubes(_sphere_grid(res), 0.0)
    world = verts / (res - 1.0) * 2.0 - 1.0
    a, b, c = world[tris[:, 0]], world[tris[:, 1]], world[tris[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", a, np.cross(b, c))) / 6.0
    want = 4.0 / 3.0 * np.pi * 0.5 ** 3
    assert vol > 0
    np.testing.assert_allclose(vol, want, rtol=0.05)


def test_marching_cubes_empty():
    grid = np.full((8, 8, 8), -1.0, np.float32)
    verts, tris = marching_cubes(grid, 0.0)
    assert len(verts) == 0 and len(tris) == 0


def test_kdtree_vs_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.randn(500, 3).astype(np.float32)
    q = rng.randn(64, 3).astype(np.float32)
    tree = KDTree(pts)
    dist, idx = tree.query(q)
    d2 = ((q[:, None] - pts[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d2.argmin(1))
    np.testing.assert_allclose(dist, np.sqrt(d2.min(1)), rtol=1e-5)


def test_kdtree_radius_count():
    rng = np.random.RandomState(1)
    pts = rng.rand(300, 3).astype(np.float32)
    q = rng.rand(16, 3).astype(np.float32)
    tree = KDTree(pts)
    cnt = tree.query_radius_count(q, 0.2)
    want = (((q[:, None] - pts[None]) ** 2).sum(-1) <= 0.2 ** 2 + 1e-9).sum(1)
    np.testing.assert_array_equal(cnt, want)


def test_ply_roundtrip_mesh():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.ply")
        write_ply(path, verts, faces)
        v, f = read_ply_mesh(path)
        np.testing.assert_allclose(v, verts)
        np.testing.assert_array_equal(f, faces)


def test_ply_points_roundtrip():
    pts = np.random.RandomState(0).randn(57, 3).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.ply")
        write_ply(path, pts)
        got = read_ply_points(path)
        np.testing.assert_allclose(got, pts, rtol=1e-6)


def test_extract_geometry_device_sphere():
    import jax.numpy as jnp

    def query(pts):                      # -sdf of a sphere r=0.5
        return -(jnp.linalg.norm(pts, axis=-1) - 0.5)

    verts, tris = extract_geometry([-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                                   resolution=40, threshold=0.0,
                                   query_fn=query, slab=16)
    radii = np.linalg.norm(verts, axis=-1)
    assert abs(radii.mean() - 0.5) < 0.06
    assert len(tris) > 100


def test_extract_fields_sharded_matches_single():
    """The grid fill sharded over an 8-device mesh is bit-identical to the
    single-device fill (embarrassingly parallel over x-planes)."""
    import jax
    import jax.numpy as jnp
    from factored_neus_tpu.meshing.extract import extract_fields
    from factored_neus_tpu.parallel import sharding as SH

    def query(pts):
        return -(jnp.linalg.norm(pts, axis=-1) - 0.5) \
            + 0.05 * jnp.sin(4.0 * pts[..., 0])

    mesh = SH.make_mesh(jax.devices()[:8])
    ref = extract_fields([-1.0] * 3, [1.0] * 3, 40, query, slab=16)
    # slab=16 divides 8; also exercise the non-divisible adjust (slab=12->8)
    for slab in (16, 12):
        got = extract_fields([-1.0] * 3, [1.0] * 3, 40, query, slab=slab,
                             mesh=mesh)
        np.testing.assert_array_equal(got, ref)


def test_extract_geometry_sharded_through_runner_args():
    """extract_geometry(mesh=...) end-to-end on the virtual device mesh."""
    import jax
    import jax.numpy as jnp
    from factored_neus_tpu.parallel import sharding as SH

    def query(pts):
        return -(jnp.linalg.norm(pts, axis=-1) - 0.5)

    mesh = SH.make_mesh(jax.devices()[:8])
    verts, tris = extract_geometry([-1.0] * 3, [1.0] * 3, resolution=40,
                                   threshold=0.0, query_fn=query, slab=16,
                                   mesh=mesh)
    radii = np.linalg.norm(verts, axis=-1)
    assert abs(radii.mean() - 0.5) < 0.06 and len(tris) > 100


def test_make_sdf_grid_query_matches_plain_and_shards():
    """The production grid-fill query (chunked narrowed sweep) equals
    -sdf_value pointwise and runs inside shard_map (lax.map under
    shard_map) bit-identically to the single-device fill."""
    import jax
    import jax.numpy as jnp
    from factored_neus_tpu.meshing.extract import (extract_fields,
                                                   make_sdf_grid_query)
    from factored_neus_tpu.models import fields as F
    from factored_neus_tpu.models.renderer import RendererConfig
    from factored_neus_tpu.parallel import sharding as SH
    from factored_neus_tpu.train.common import init_all_params

    cfg = RendererConfig(
        n_samples=8, n_importance=8, up_sample_steps=2,
        sdf=F.SDFConfig(n_layers=2, d_hidden=32, d_out=33, skip_in=(),
                        multires=4))
    params = init_all_params(jax.random.PRNGKey(0), cfg)
    # chunk=64 forces the production lax.map + tail-padding branch of
    # chunked_apply (257 and 24^2*8-point calls would otherwise take the
    # single-call early-out and leave the chunked path untested)
    query = make_sdf_grid_query(params["sdf"], cfg.sdf, chunk=64)

    pts = jax.random.normal(jax.random.PRNGKey(1), (257, 3))
    np.testing.assert_allclose(
        np.asarray(query(pts)),
        np.asarray(-F.sdf_value(params["sdf"], cfg.sdf, pts)),
        rtol=0, atol=1e-5)

    mesh = SH.make_mesh(jax.devices()[:8])
    ref = extract_fields([-1.0] * 3, [1.0] * 3, 24, query, slab=8)
    got = extract_fields([-1.0] * 3, [1.0] * 3, 24, query, slab=8, mesh=mesh)
    np.testing.assert_array_equal(got, ref)


def test_f16_transfer_mesh_matches_f32():
    """float16 wire dtype (extract_geometry's default) moves iso-surface
    vertices by less than 1e-3 of a cell vs a bit-exact f32 fill."""
    import jax.numpy as jnp

    def query(pts):
        return -(jnp.linalg.norm(pts, axis=-1) - 0.5) \
            + 0.05 * jnp.sin(4.0 * pts[..., 0])

    u16 = extract_fields([-1.0] * 3, [1.0] * 3, 40, query, slab=16,
                         transfer_dtype=jnp.float16)
    u32 = extract_fields([-1.0] * 3, [1.0] * 3, 40, query, slab=16)
    cell = 2.0 / 39
    assert np.abs(u16 - u32).max() < 2e-3          # f16 rounding only
    from factored_neus_tpu.meshing.extract import _mc_native
    v16, t16 = _mc_native(u16, 0.0)
    v32, t32 = _mc_native(u32, 0.0)
    assert len(v16) == len(v32) and len(t16) == len(t32)
    assert np.abs(v16 - v32).max() < 1e-3 * cell * 39  # grid-index units


def test_kdtree_empty_tree_queries():
    """Empty point cloud: nearest queries return inf/-1 and radius counts
    return 0 instead of dereferencing a nonexistent root node."""
    from factored_neus_tpu.native import KDTree
    t = KDTree(np.zeros((0, 3), np.float32))
    q = np.array([[0.1, 0.2, 0.3]], np.float32)
    d, i = t.query(q)
    assert i[0] == -1 and not np.isfinite(d[0]) or d[0] > 1e30
    cnt = t.query_radius_count(q, 0.5)
    assert cnt[0] == 0
