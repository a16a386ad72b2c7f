"""COLMAP model I/O round-trip tests (mirrors the strategy of the
reference's only self-tests, ref:colmap/test_read_write_model.py)."""
import numpy as np
import pytest

from factored_neus_tpu.data import colmap_model as CM


@pytest.fixture
def model():
    rng = np.random.RandomState(0)
    cameras = {
        1: CM.Camera(1, "PINHOLE", 1920, 1080,
                     np.array([1200.0, 1200.0, 960.0, 540.0])),
        2: CM.Camera(2, "SIMPLE_RADIAL", 640, 480,
                     np.array([500.0, 320.0, 240.0, 0.01])),
    }
    images = {}
    for i in (1, 2, 3):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        n2d = rng.randint(0, 5)
        images[i] = CM.Image(
            i, q, rng.randn(3), 1 + i % 2, f"img_{i:04d}.png",
            rng.rand(n2d, 2) * 100,
            rng.randint(-1, 50, size=n2d).astype(np.int64))
    points = {}
    for i in (10, 11):
        tl = rng.randint(1, 4)
        points[i] = CM.Point3D(
            i, rng.randn(3), rng.randint(0, 255, 3).astype(np.uint8),
            float(rng.rand()), rng.randint(1, 4, tl).astype(np.int64),
            rng.randint(0, 5, tl).astype(np.int64))
    return cameras, images, points


def _assert_models_equal(a, b):
    ca, ia, pa = a
    cb, ib, pb = b
    assert ca.keys() == cb.keys()
    for k in ca:
        assert ca[k].model == cb[k].model
        assert ca[k].width == cb[k].width and ca[k].height == cb[k].height
        np.testing.assert_allclose(ca[k].params, cb[k].params)
    assert ia.keys() == ib.keys()
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec)
        assert ia[k].name == ib[k].name
        assert ia[k].camera_id == ib[k].camera_id
        np.testing.assert_allclose(ia[k].xys, ib[k].xys)
        np.testing.assert_array_equal(ia[k].point3D_ids, ib[k].point3D_ids)
    assert pa.keys() == pb.keys()
    for k in pa:
        np.testing.assert_allclose(pa[k].xyz, pb[k].xyz)
        np.testing.assert_array_equal(pa[k].rgb, pb[k].rgb)
        np.testing.assert_allclose(pa[k].error, pb[k].error)
        np.testing.assert_array_equal(pa[k].image_ids, pb[k].image_ids)


@pytest.mark.parametrize("ext", [".txt", ".bin"])
def test_model_roundtrip(model, ext, tmp_path):
    CM.write_model(*model, str(tmp_path), ext=ext)
    loaded = CM.read_model(str(tmp_path), ext=ext)
    _assert_models_equal(model, loaded)


def test_cross_format(model, tmp_path):
    """text -> read -> write binary -> read must be identical."""
    CM.write_model(*model, str(tmp_path / "t"), ext=".txt")
    m1 = CM.read_model(str(tmp_path / "t"), ext=".txt")
    CM.write_model(*m1, str(tmp_path / "b"), ext=".bin")
    m2 = CM.read_model(str(tmp_path / "b"), ext=".bin")
    _assert_models_equal(m1, m2)


def test_autodetect(model, tmp_path):
    CM.write_model(*model, str(tmp_path), ext=".bin")
    loaded = CM.read_model(str(tmp_path))
    _assert_models_equal(model, loaded)


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = CM.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
        q2 = CM.rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)
