"""Bundler / VisualSfM interchange converters (colmap_tools.interchange):
round-trips on fabricated reconstructions and databases.

Covers SURVEY §2.1 #19's remaining vendored scripts: bundler_to_ply,
nvm_to_ply, export_to_bundler, export_to_visualsfm, export_inlier_matches,
export_inlier_pairs.
"""
import gzip
import os
import struct

import numpy as np

from factored_neus_tpu.colmap_tools import interchange as IC
from factored_neus_tpu.colmap_tools.database import ColmapDatabase
from factored_neus_tpu.meshing.ply import read_ply


def _write_bundle_out(path, xyz, rgb, track):
    n_images = 2
    lines = ["# Bundle file v0.3", f"{n_images} {len(xyz)}"]
    for _ in range(n_images):               # focal k1 k2 / R (3 rows) / t
        lines += ["800 0 0", "1 0 0", "0 1 0", "0 0 1", "0 0 0"]
    for p, c, t in zip(xyz, rgb, track):
        lines.append("%g %g %g" % tuple(p))
        lines.append("%d %d %d" % tuple(c))
        view = " ".join(["0 %d 1.0 1.0" % k for k in range(t)])
        lines.append("%d %s" % (t, view))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _write_nvm(path, xyz, rgb, track):
    lines = ["NVM_V3", "", "2",
             "im0.jpg 800 1 0 0 0 0 0 0 0 0",
             "im1.jpg 800 1 0 0 0 0 0 0 1 0",
             "", f"{len(xyz)}"]
    for p, c, t in zip(xyz, rgb, track):
        meas = " ".join(["0 %d 1.0 1.0" % k for k in range(t)])
        lines.append("%g %g %g %d %d %d %d %s"
                     % (*p, *c, t, meas))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def _pts():
    rng = np.random.RandomState(0)
    xyz = rng.randn(12, 3) * 2.0
    rgb = rng.randint(0, 256, (12, 3))
    track = np.array([1, 2, 3, 4, 5, 3, 2, 6, 3, 1, 4, 3])
    return xyz, rgb, track


def test_bundler_to_ply(tmp_path):
    xyz, rgb, track = _pts()
    src = str(tmp_path / "bundle.out")
    dst = str(tmp_path / "cloud.ply")
    _write_bundle_out(src, xyz, rgb, track)
    n = IC.bundler_to_ply(src, dst, normalize=False, min_track_length=3)
    keep = track >= 3
    assert n == int(keep.sum())
    ply = read_ply(dst)["vertex"]
    got = np.stack([ply["x"], ply["y"], ply["z"]], 1)
    want = xyz[keep] * np.array([1.0, 1.0, -1.0])      # upstream z-flip
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # legacy color property naming preserved
    got_rgb = np.stack([ply["diffuse_red"], ply["diffuse_green"],
                        ply["diffuse_blue"]], 1)
    np.testing.assert_array_equal(got_rgb, rgb[keep])


def test_nvm_to_ply_normalized(tmp_path):
    xyz, rgb, track = _pts()
    src = str(tmp_path / "model.nvm")
    dst = str(tmp_path / "cloud.ply")
    _write_nvm(src, xyz, rgb, track)
    n = IC.nvm_to_ply(src, dst, normalize=True, min_track_length=2)
    keep = track >= 2
    assert n == int(keep.sum())
    ply = read_ply(dst)["vertex"]
    got = np.stack([ply["x"], ply["y"], ply["z"]], 1)
    np.testing.assert_allclose(
        got, IC.normalize_points(xyz[keep]).astype(np.float32),
        rtol=1e-4, atol=1e-5)


def test_normalize_points_properties():
    rng = np.random.RandomState(1)
    xyz = rng.randn(500, 3) * np.array([1.0, 5.0, 0.2]) + 7.0
    out = IC.normalize_points(xyz)
    # centered on the ORIGINAL mean (scale applied after centering)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-9)
    srt = np.sort(out, axis=0)
    lo, hi = srt[int(0.2 * 500)], srt[int(0.8 * 500)]
    np.testing.assert_allclose(np.linalg.norm(hi - lo), 10.0, rtol=1e-6)
    # degenerate inputs don't divide by zero
    same = np.ones((4, 3))
    assert np.isfinite(IC.normalize_points(same)).all()
    assert IC.normalize_points(np.zeros((0, 3))).shape == (0, 3)


def _make_db(tmp_path, n_images=3, n_kp=10, nested=False):
    rng = np.random.RandomState(2)
    db_path = str(tmp_path / "db.db")
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    kps, descs = {}, {}
    with ColmapDatabase(db_path) as db:
        cam = db.add_camera("PINHOLE", 64, 48, [500.0, 480.0, 32.0, 24.0])
        iids = []
        for i in range(n_images):
            # COLMAP image names may carry subdirectories (rig layouts)
            name = f"rig{i % 2}/im{i}.jpg" if nested else f"im{i}.jpg"
            (img_dir / name).parent.mkdir(exist_ok=True)
            (img_dir / name).write_bytes(b"fakejpg")
            iid = db.add_image(name, cam)
            kp = np.concatenate(
                [rng.rand(n_kp, 2) * 64,
                 np.abs(rng.rand(n_kp, 1)) + 1.0,
                 rng.rand(n_kp, 1) * 6.28,
                 np.zeros((n_kp, 2))], 1).astype(np.float32)
            ds = rng.randint(0, 256, (n_kp, 128)).astype(np.uint8)
            db.add_keypoints(iid, kp)
            db.add_descriptors(iid, ds)
            kps[iid], descs[iid] = kp, ds
            iids.append(iid)
        m01 = np.array([[0, 1], [2, 3], [4, 5], [6, 7]], np.uint32)
        m12 = np.array([[1, 2], [3, 4]], np.uint32)
        db.add_two_view_geometry(iids[0], iids[1], m01)
        db.add_two_view_geometry(iids[1], iids[2], m12)
        db.commit()
    return db_path, str(img_dir), iids, kps, descs, {0: m01, 1: m12}


def test_export_to_bundler(tmp_path):
    db_path, img_dir, iids, kps, descs, ms = _make_db(tmp_path)
    out = str(tmp_path / "bundler")
    n = IC.export_to_bundler(db_path, img_dir, out, min_num_matches=3)
    assert n == 3
    lst = open(os.path.join(out, "list.txt")).read().strip().split("\n")
    assert len(lst) == 3 and lst[0].startswith("./im0.jpg 0 500")
    assert os.path.exists(os.path.join(out, "im1.jpg"))   # images copied
    # key file: y x scale orient + 128-d descriptor rows
    with gzip.open(os.path.join(out, "im0.key.gz"), "rt") as f:
        lines = f.read().strip().split("\n")
    nk, dim = map(int, lines[0].split())
    assert (nk, dim) == (10, 128)
    y, x, s, o = map(float, lines[1].split())
    kp0 = kps[iids[0]]
    np.testing.assert_allclose([y, x, s, o], kp0[0, [1, 0, 2, 3]], rtol=1e-5)
    desc_vals = " ".join(lines[2:9]).split()
    np.testing.assert_array_equal(np.array(desc_vals, int),
                                  descs[iids[0]][0])
    # matches.init.txt: only the >=3-inlier pair, 0-based contiguous idxs
    mi = open(os.path.join(out, "matches.init.txt")).read().split()
    assert list(map(int, mi[:3])) == [0, 1, 4]
    np.testing.assert_array_equal(
        np.array(mi[3:], int).reshape(-1, 2), ms[0])
    assert os.path.exists(os.path.join(out, "run_bundler.sh"))


def test_export_nested_image_names(tmp_path):
    """Image names with subdirectories (rig layouts) export without error —
    output subdirs are created on demand."""
    db_path, img_dir, iids, kps, descs, ms = _make_db(tmp_path, nested=True)
    out_b = str(tmp_path / "bundler")
    assert IC.export_to_bundler(db_path, img_dir, out_b,
                                min_num_matches=3) == 3
    assert os.path.exists(os.path.join(out_b, "rig1", "im1.jpg"))
    assert os.path.exists(os.path.join(out_b, "rig0", "im0.key.gz"))
    out_v = str(tmp_path / "vsfm")
    assert IC.export_to_visualsfm(db_path, img_dir, out_v,
                                  min_num_matches=1) == 3
    assert os.path.exists(os.path.join(out_v, "rig0", "im2.sift"))


def test_export_to_visualsfm_binary(tmp_path):
    db_path, img_dir, iids, kps, descs, ms = _make_db(tmp_path)
    out = str(tmp_path / "vsfm")
    n = IC.export_to_visualsfm(db_path, img_dir, out, min_num_matches=1)
    assert n == 3
    raw = open(os.path.join(out, "im2.sift"), "rb").read()
    name, ver, nk, four, dim = struct.unpack("5i", raw[:20])
    assert (name, ver, nk, four, dim) == (IC._SIFT_NAME,
                                          IC._SIFT_VERSION_V4, 10, 4, 128)
    kp = np.frombuffer(raw[20:20 + nk * 16], "<f4").reshape(nk, 4)
    np.testing.assert_allclose(kp, kps[iids[2]][:, :4], rtol=1e-6)
    desc = np.frombuffer(raw[20 + nk * 16: 20 + nk * 16 + nk * 128],
                         np.uint8).reshape(nk, 128)
    np.testing.assert_array_equal(desc, descs[iids[2]])
    (eof,) = struct.unpack("i", raw[-4:])
    assert eof == IC._SIFT_EOF
    # matches.txt: named pairs, row-split indices
    lines = open(os.path.join(out, "matches.txt")).read().strip().split("\n")
    assert lines[0].split() == ["im0.jpg", "im1.jpg", "4"]
    np.testing.assert_array_equal(np.array(lines[1].split(), int),
                                  ms[0][:, 0])
    np.testing.assert_array_equal(np.array(lines[2].split(), int),
                                  ms[0][:, 1])
    assert lines[3].split() == ["im1.jpg", "im2.jpg", "2"]


def test_export_to_visualsfm_ascii(tmp_path):
    db_path, img_dir, iids, kps, descs, _ = _make_db(tmp_path)
    out = str(tmp_path / "vsfm_ascii")
    IC.export_to_visualsfm(db_path, img_dir, out,
                           binary_feature_files=False)
    lines = open(os.path.join(out, "im0.sift")).read().strip().split("\n")
    assert lines[0] == "10 128"
    first = lines[1].split()
    np.testing.assert_allclose(np.array(first[:2], float),
                               kps[iids[0]][0, :2], rtol=1e-5)
    np.testing.assert_array_equal(np.array(first[4:], int),
                                  descs[iids[0]][0])


def test_export_inlier_matches_and_pairs(tmp_path):
    db_path, img_dir, iids, _kps, _descs, ms = _make_db(tmp_path)
    mpath = str(tmp_path / "inliers.txt")
    assert IC.export_inlier_matches(db_path, mpath, min_num_matches=3) == 1
    toks = open(mpath).read().split()
    assert toks[:3] == ["im0.jpg", "im1.jpg", "4"]
    np.testing.assert_array_equal(np.array(toks[3:], int).reshape(-1, 2),
                                  ms[0])
    ppath = str(tmp_path / "pairs.txt")
    assert IC.export_inlier_pairs(db_path, ppath, min_num_matches=1) == 2
    lines = open(ppath).read().strip().split("\n")
    assert lines == ["im0.jpg im1.jpg", "im1.jpg im2.jpg"]


def test_cli_smoke(tmp_path):
    xyz, rgb, track = _pts()
    src = str(tmp_path / "bundle.out")
    dst = str(tmp_path / "c.ply")
    _write_bundle_out(src, xyz, rgb, track)
    assert IC.main(["bundler_to_ply", "--bundler_path", src,
                    "--ply_path", dst, "--normalize", "0"]) == 0
    assert os.path.exists(dst)
