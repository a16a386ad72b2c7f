"""Camera decomposition parity vs OpenCV (the reference's implementation)."""
import numpy as np
import pytest

from factored_neus_tpu.data.cameras import (decompose_projection,
                                            interpolate_pose,
                                            load_K_Rt_from_P)


def _random_projection(rng):
    # K upper triangular with positive diagonal
    K = np.array([[800 + rng.rand() * 400, rng.rand() * 2,
                   300 + rng.rand() * 100],
                  [0, 800 + rng.rand() * 400, 250 + rng.rand() * 100],
                  [0, 0, 1.0]])
    # random rotation via QR
    Q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = rng.randn(3) * 2
    P = K @ np.concatenate([Q, t[:, None]], axis=1)
    return P, K, Q, t


def test_decompose_projection_recovers_K_R():
    rng = np.random.RandomState(0)
    for _ in range(10):
        P, K, R, t = _random_projection(rng)
        K2, R2, c2 = decompose_projection(P)
        np.testing.assert_allclose(K2, K / K[2, 2], rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(R2, R, rtol=1e-6, atol=1e-6)
        # camera center: R c + t = 0
        np.testing.assert_allclose(R @ c2 + t, 0.0, atol=1e-6)


def test_matches_opencv():
    cv = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    for _ in range(5):
        P, _, _, _ = _random_projection(rng)
        K_cv, R_cv, t_cv = cv.decomposeProjectionMatrix(P)[:3]
        K_cv = K_cv / K_cv[2, 2]
        intr, pose = load_K_Rt_from_P(P)
        np.testing.assert_allclose(intr[:3, :3], K_cv, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pose[:3, :3], R_cv.T, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(pose[:3, 3], (t_cv[:3] / t_cv[3])[:, 0],
                                   rtol=1e-4, atol=1e-5)


def test_interpolate_pose_endpoints():
    rng = np.random.RandomState(2)
    _, _, R0, t0 = _random_projection(rng)
    _, _, R1, t1 = _random_projection(rng)
    p0 = np.eye(4, dtype=np.float32)
    p0[:3, :3], p0[:3, 3] = R0.T, t0
    p1 = np.eye(4, dtype=np.float32)
    p1[:3, :3], p1[:3, 3] = R1.T, t1
    np.testing.assert_allclose(interpolate_pose(p0, p1, 0.0), p0, atol=1e-5)
    np.testing.assert_allclose(interpolate_pose(p0, p1, 1.0), p1, atol=1e-5)
    mid = interpolate_pose(p0, p1, 0.5)
    R = mid[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
