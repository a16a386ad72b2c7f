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
