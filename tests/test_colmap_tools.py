"""colmap_tools: database schema round-trip, dense-map I/O, exporters."""
import os

import numpy as np
import pytest

from factored_neus_tpu.colmap_tools import database as DB
from factored_neus_tpu.colmap_tools import dense as DN
from factored_neus_tpu.colmap_tools import export as EX
from factored_neus_tpu.data import colmap_model as CM
from factored_neus_tpu.meshing import ply as PLY


def test_database_roundtrip(tmp_path):
    path = str(tmp_path / "db.db")
    rng = np.random.RandomState(0)
    kps1 = rng.rand(120, 6).astype(np.float32) * 100
    kps2 = rng.rand(80, 6).astype(np.float32) * 100
    matches = np.stack([np.arange(40), np.arange(40) + 5], -1)

    with DB.ColmapDatabase(path) as db:
        cam = db.add_camera("PINHOLE", 640, 480, [500.0, 500.0, 320.0, 240.0])
        im1 = db.add_image("a.png", cam, prior_q=[1, 0, 0, 0],
                           prior_t=[0, 0, 3])
        im2 = db.add_image("b.png", cam)
        db.add_keypoints(im1, kps1)
        db.add_keypoints(im2, kps2)
        db.add_descriptors(im1, rng.randint(0, 255, (120, 128), np.uint8))
        # insert in flipped order: canonicalization must swap columns
        db.add_matches(im2, im1, matches)
        db.add_two_view_geometry(im1, im2, matches, F=np.eye(3))

    with DB.ColmapDatabase(path) as db:
        cams = db.cameras()
        assert cams[1][0] == "PINHOLE" and cams[1][1] == 640
        np.testing.assert_allclose(cams[1][3], [500, 500, 320, 240])
        ims = db.images()
        assert ims[1] == ("a.png", 1) and ims[2] == ("b.png", 1)
        np.testing.assert_allclose(db.keypoints(1), kps1)
        np.testing.assert_allclose(db.keypoints(2), kps2)
        # query in both orders returns consistently-oriented matches
        m12 = db.matches(1, 2)
        m21 = db.matches(2, 1)
        np.testing.assert_array_equal(m12, m21[:, ::-1])
        # the pair was inserted as (im2, im1) with cols (idx2, idx1);
        # canonical storage means matches(1,2) has cols (idx1, idx2)
        np.testing.assert_array_equal(m12[:, 0], matches[:, 1])


def test_pair_id_roundtrip():
    for a, b in ((1, 2), (2, 1), (7, 7), (1, DB.MAX_IMAGE_ID - 1)):
        pid = DB.image_ids_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert DB.pair_id_to_image_ids(pid) == (lo, hi)


def test_dense_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    for shape in ((17, 23), (9, 11, 3)):
        arr = rng.rand(*shape).astype(np.float32)
        p = str(tmp_path / f"d{len(shape)}.bin")
        DN.write_array(arr, p)
        back = DN.read_array(p)
        np.testing.assert_array_equal(back, arr.squeeze())


def test_model_to_ply_and_merge(tmp_path):
    rng = np.random.RandomState(2)
    pts = {}
    for i in range(50):
        pts[i] = CM.Point3D(
            id=i, xyz=rng.randn(3), rgb=rng.randint(0, 255, 3),
            error=0.1, image_ids=np.arange(i % 4 + 1),
            point2D_idxs=np.arange(i % 4 + 1))
    model_dir = str(tmp_path / "sparse")
    os.makedirs(model_dir)
    CM.write_points3D_binary(pts, os.path.join(model_dir, "points3D.bin"))

    out = str(tmp_path / "cloud.ply")
    n = EX.model_to_ply(model_dir, out)
    assert n == 50
    xyz = PLY.read_ply_points(out)
    assert xyz.shape == (50, 3)

    # track-length filter: points with <3 observations are dropped
    out2 = str(tmp_path / "cloud_f.ply")
    n2 = EX.model_to_ply(model_dir, out2, min_track_len=3)
    assert 0 < n2 < 50

    merged = str(tmp_path / "merged.ply")
    total = EX.merge_ply_files([out, out2], merged)
    assert total == n + n2
    assert PLY.read_ply_points(merged).shape == (total, 3)


def test_fused_vis_roundtrip(tmp_path):
    from factored_neus_tpu.colmap_tools import fused as FU
    rng = np.random.RandomState(3)
    pts = []
    for i in range(20):
        n = rng.randn(3)
        pts.append(FU.MeshPoint(
            position=rng.randn(3).astype(np.float32),
            normal=(n / np.linalg.norm(n)).astype(np.float32),
            color=rng.randint(0, 255, 3).astype(np.uint8),
            visible_image_idxs=rng.randint(0, 64, i % 5).astype(np.uint32)))
    ply_p = str(tmp_path / "fused.ply")
    vis_p = ply_p + ".vis"
    FU.write_fused(pts, ply_p, vis_p)
    back = FU.read_fused(ply_p, vis_p)
    assert len(back) == 20
    for a, b in zip(pts, back):
        np.testing.assert_allclose(a.position, b.position, rtol=1e-6)
        np.testing.assert_allclose(a.normal, b.normal, rtol=1e-6)
        np.testing.assert_array_equal(a.color, b.color)
        np.testing.assert_array_equal(a.visible_image_idxs,
                                      b.visible_image_idxs)
        assert b.num_visible_images == len(a.visible_image_idxs)

    # binary layout invariants of the .vis sidecar (colmap fusion.cc)
    raw = open(vis_p, "rb").read()
    assert int(np.frombuffer(raw[:8], "<u8")[0]) == 20
    assert len(raw) == 8 + sum(4 + 4 * p.num_visible_images for p in pts)


def _tiny_model(tmp_path, n_views=3, n_pts=40):
    rng = np.random.RandomState(4)
    cameras = {1: CM.Camera(id=1, model="PINHOLE", width=64, height=48,
                            params=np.array([70.0, 70.0, 32.0, 24.0]))}
    images = {}
    for i in range(1, n_views + 1):
        images[i] = CM.Image(
            id=i, qvec=np.array([1.0, 0, 0, 0]),
            tvec=rng.randn(3) * 0.1 + np.array([0, 0, 3.0]),
            camera_id=1, name=f"v{i}.png",
            xys=np.zeros((0, 2)), point3D_ids=np.zeros(0, np.int64))
    pts = {}
    for i in range(n_pts):
        pts[i] = CM.Point3D(
            id=i, xyz=rng.randn(3) * 0.5, rgb=rng.randint(0, 255, 3),
            error=float(i % 7) * 0.3, image_ids=np.arange(i % 5 + 1),
            point2D_idxs=np.arange(i % 5 + 1))
    d = str(tmp_path / "model")
    os.makedirs(d, exist_ok=True)
    CM.write_model(cameras, images, pts, d, ext=".bin")
    return d, cameras, images, pts


def test_visualize_frustums_and_export(tmp_path):
    from factored_neus_tpu.colmap_tools import visualize as VZ
    d, cameras, images, pts = _tiny_model(tmp_path)

    K = VZ.camera_K(cameras[1])
    np.testing.assert_allclose(np.diag(K), [70, 70, 1])

    # identity rotation, apex at t; corners at depth `scale` in front
    fv = VZ.frustum_vertices(K, np.eye(3), np.array([1.0, 2.0, 3.0]),
                             64, 48, scale=2.0)
    assert fv.shape == (5, 3)
    np.testing.assert_allclose(fv[0], [1, 2, 3])
    np.testing.assert_allclose(fv[1:, 2], 5.0)  # all corners at z = 3+2
    # corner (0,0) unprojects to (-cx/fx, -cy/fy)*scale relative to apex
    np.testing.assert_allclose(fv[1, :2],
                               [1 - 32 / 70 * 2, 2 - 24 / 70 * 2], rtol=1e-6)

    verts, edges = VZ.model_frustums(cameras, images)
    assert verts.shape == (5 * 3, 3) and edges.shape == (8 * 3, 2)
    assert edges.max() == len(verts) - 1

    out = str(tmp_path / "viz.ply")
    info = VZ.export_model_ply(d, out, min_track_len=3,
                               max_reproj_error=1.0)
    assert info["n_views"] == 3 and 0 < info["n_points"] < 40
    data = PLY.read_ply(out)
    assert len(data["vertex"]["x"]) == info["n_points"] + 15
    assert len(data["edge"]["vertex1"]) == 24


def test_database_rolls_back_on_exception(tmp_path):
    """A raising with-block must not persist partial writes (sqlite
    rollback semantics, matching upstream COLMAP usage)."""
    path = str(tmp_path / "rb.db")
    with DB.ColmapDatabase(path) as db:
        cam = db.add_camera("PINHOLE", 8, 8, [4.0, 4.0, 4.0, 4.0])
    with pytest.raises(RuntimeError):
        with DB.ColmapDatabase(path) as db:
            db.add_image("orphan.png", cam)
            raise RuntimeError("boom")
    with DB.ColmapDatabase(path) as db:
        assert db.images() == {}          # the partial image row rolled back
        assert 1 in db.cameras()          # the committed camera survived


def test_fused_read_as_arrays(tmp_path):
    from factored_neus_tpu.colmap_tools import fused as FU
    rng = np.random.RandomState(7)
    pts = [FU.MeshPoint(rng.randn(3).astype(np.float32),
                        rng.randn(3).astype(np.float32),
                        rng.randint(0, 255, 3).astype(np.uint8),
                        rng.randint(0, 9, i % 3).astype(np.uint32))
           for i in range(12)]
    ply_p = str(tmp_path / "f.ply")
    FU.write_fused(pts, ply_p, ply_p + ".vis")
    xyz, nrm, rgb, counts, flat = FU.read_fused(ply_p, ply_p + ".vis",
                                                as_arrays=True)
    assert xyz.shape == (12, 3) and counts.sum() == len(flat)
    np.testing.assert_array_equal(counts,
                                  [p.num_visible_images for p in pts])
    np.testing.assert_array_equal(
        flat, np.concatenate([p.visible_image_idxs for p in pts]))
