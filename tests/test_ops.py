"""Unit tests for math/encoding/sampling primitives against independent
numpy reference implementations (hand-derived from the published formulas)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factored_neus_tpu.ops import embedder as E
from factored_neus_tpu.ops import math as U
from factored_neus_tpu.ops import sampling as S
from factored_neus_tpu.ops import sg as SG
from factored_neus_tpu.ops.chunk import chunked_apply


def test_positional_encoding_ordering():
    x = np.array([[0.1, -0.2, 0.3]], np.float32)
    enc = np.asarray(E.positional_encoding(jnp.asarray(x), 3))
    # layout: [x, sin(1x), cos(1x), sin(2x), cos(2x), sin(4x), cos(4x)]
    assert enc.shape == (1, 3 * (1 + 2 * 3))
    np.testing.assert_allclose(enc[0, :3], x[0], rtol=1e-6)
    np.testing.assert_allclose(enc[0, 3:6], np.sin(x[0]), rtol=1e-5)
    np.testing.assert_allclose(enc[0, 6:9], np.cos(x[0]), rtol=1e-5)
    np.testing.assert_allclose(enc[0, 9:12], np.sin(2 * x[0]), rtol=1e-5)
    np.testing.assert_allclose(enc[0, 15:18], np.sin(4 * x[0]), rtol=1e-5)


def test_get_embedder_dims():
    fn, d = E.get_embedder(6, 3)
    assert d == 39
    fn, d = E.get_embedder(10, 3)
    assert d == 63
    fn, d = E.get_embedder(4, 3)
    assert d == 27
    fn, d = E.get_embedder(10, 4)
    assert d == 84


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 101)
    y = U.srgb_to_linear(U.linear_to_srgb(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=2e-4)
    # breakpoint continuity
    lo = U.linear_to_srgb(jnp.asarray(0.0031308 - 1e-7))
    hi = U.linear_to_srgb(jnp.asarray(0.0031308 + 1e-7))
    assert abs(float(lo) - float(hi)) < 1e-3


def test_reflect():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(U.reflect(d, n)), [[0, 0, 1]],
                               atol=1e-6)
    # 45 degrees
    d = U.l2_normalize(jnp.asarray([[1.0, 0.0, 1.0]]))
    r = U.reflect(d, n)
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(U.l2_normalize(
                                   jnp.asarray([[-1.0, 0.0, 1.0]]))),
                               atol=1e-6)


def test_ide_matches_complex_reference():
    """Check the real-arithmetic IDE against a direct complex implementation
    of Ref-NeRF eq. 6-8."""
    deg = 4
    fn = U.generate_ide_fn(deg)
    rng = np.random.RandomState(0)
    xyz = rng.randn(16, 3).astype(np.float32)
    xyz /= np.linalg.norm(xyz, axis=-1, keepdims=True)
    kappa_inv = np.abs(rng.randn(16, 1)).astype(np.float32) * 0.1

    ml = U.get_ml_array(deg)
    l_max = 2 ** (deg - 1)
    mat = np.zeros((l_max + 1, ml.shape[1]))
    for i, (m, l) in enumerate(ml.T):
        for k in range(l - m + 1):
            mat[k, i] = U._sph_harm_coeff(l, m, k)
    x, y, z = xyz[:, :1], xyz[:, 1:2], xyz[:, 2:3]
    vmz = np.concatenate([z ** i for i in range(mat.shape[0])], -1)
    vmxy = np.concatenate([(x + 1j * y) ** m for m in ml[0]], -1)
    sph = vmxy * (vmz @ mat)
    sigma = 0.5 * ml[1] * (ml[1] + 1)
    ide = sph * np.exp(-sigma * kappa_inv)
    want = np.concatenate([np.real(ide), np.imag(ide)], -1)

    got = np.asarray(fn(jnp.asarray(xyz), jnp.asarray(kappa_inv)))
    np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-4)


def _np_sample_pdf_det(bins, weights, n):
    """Independent numpy inverse-CDF reference (NeRF sampling, det mode)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    u = np.linspace(0.5 / n, 1 - 0.5 / n, n)
    out = np.zeros((bins.shape[0], n), np.float32)
    for b in range(bins.shape[0]):
        inds = np.searchsorted(cdf[b], u, side="right")
        below = np.maximum(inds - 1, 0)
        above = np.minimum(inds, cdf.shape[-1] - 1)
        cdf_b, cdf_a = cdf[b][below], cdf[b][above]
        bin_b, bin_a = bins[b][below], bins[b][above]
        denom = np.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        t = (u - cdf_b) / denom
        out[b] = bin_b + t * (bin_a - bin_b)
    return out


def test_sample_pdf_det():
    rng = np.random.RandomState(1)
    bins = np.sort(rng.rand(4, 16).astype(np.float32), -1)
    weights = rng.rand(4, 15).astype(np.float32)
    got = np.asarray(S.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 8))
    want = _np_sample_pdf_det(bins, weights, 8)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_alpha_to_weights():
    alpha = jnp.asarray([[0.5, 0.5, 1.0]])
    w = np.asarray(S.alpha_to_weights(alpha))
    np.testing.assert_allclose(
        w, [[0.5, 0.5 * (0.5 + 1e-7), (0.5 + 1e-7) * (0.5 + 1e-7)]],
        rtol=1e-5)


def test_sample_pdf_monotone_and_in_range():
    rng = np.random.RandomState(2)
    bins = np.sort(rng.rand(8, 32).astype(np.float32) * 4, -1)
    weights = rng.rand(8, 31).astype(np.float32)
    z = np.asarray(S.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 16))
    assert (np.diff(z, axis=-1) >= -1e-6).all()
    assert (z >= bins[:, :1] - 1e-6).all() and (z <= bins[:, -1:] + 1e-6).all()


def test_up_sample_concentrates_near_surface():
    """Samples should concentrate where a synthetic sphere SDF crosses 0."""
    B = 4
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -2.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    z = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 64), (B, 64))
    pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
    sdf = jnp.linalg.norm(pts, axis=-1) - 0.5   # sphere r=0.5 at origin
    new_z = S.up_sample(rays_o, rays_d, z, sdf, 16, 64.0)
    # surface crossing at z = 1.5 (front) — samples should cluster there
    frac_near = float(jnp.mean((jnp.abs(new_z - 1.5) < 0.2).astype(jnp.float32)))
    assert frac_near > 0.5


def test_hemisphere_int_positive_and_bounded():
    lam = jnp.asarray([[1.0], [10.0], [100.0]])
    for cb in [-0.9, 0.0, 0.5, 1.0]:
        v = np.asarray(SG.hemisphere_int(lam, jnp.full((3, 1), cb)))
        assert (v >= 0).all()
        full = 2 * np.pi / np.asarray(lam) * (1 - np.exp(-2 * np.asarray(lam)))
        assert (v <= full + 1e-4).all()


def test_lambda_trick_approximates_product():
    """SG product at the shared lobe direction should match exactly there."""
    lobe1 = jnp.asarray([[0.0, 0.0, 1.0]])
    lobe2 = jnp.asarray([[0.0, 0.0, 1.0]])
    lam1, mu1 = jnp.asarray([[2.0]]), jnp.asarray([[1.5]])
    lam2, mu2 = jnp.asarray([[50.0]]), jnp.asarray([[2.0]])
    lo, la, mu = SG.lambda_trick(lobe1, lam1, mu1, lobe2, lam2, mu2)
    # same lobes -> product is an SG with lambda1+lambda2 at the same axis
    np.testing.assert_allclose(np.asarray(lo), [[0, 0, 1]], atol=1e-4)
    np.testing.assert_allclose(float(la[0, 0]), 52.0, rtol=1e-3)
    np.testing.assert_allclose(float(mu[0, 0]), 3.0, rtol=1e-3)


def test_fibonacci_sphere_unit_norm():
    pts = SG.fibonacci_sphere(64)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-6)


def test_query_sg_mixture():
    sgs = jnp.zeros((2, 3, 7))
    sgs = sgs.at[:, :, 2].set(1.0)      # axis +z
    sgs = sgs.at[:, :, 3].set(5.0)      # lambda
    sgs = sgs.at[:, :, 4:].set(0.5)     # mu
    dirs = jnp.asarray([[[0.0, 0.0, 1.0]], [[0.0, 0.0, -1.0]]])
    out = np.asarray(SG.query_sg_mixture(sgs, dirs))
    np.testing.assert_allclose(out[0, 0], 3 * 0.5, rtol=1e-5)
    np.testing.assert_allclose(out[1, 0], 3 * 0.5 * np.exp(-10.0), rtol=1e-4)


def test_chunked_apply_matches_direct():
    f = lambda x: x * 2.0 + 1.0
    x = jnp.arange(37.0).reshape(-1, 1)
    np.testing.assert_allclose(np.asarray(chunked_apply(f, x, 8)),
                               np.asarray(f(x)))
    np.testing.assert_allclose(np.asarray(chunked_apply(f, x, 100)),
                               np.asarray(f(x)))


def test_sample_dirs_on_hemisphere():
    key = jax.random.PRNGKey(0)
    n = jax.random.normal(key, (16, 3))
    n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
    r_theta = jax.random.uniform(key, (16, 4)) * 2 * np.pi
    r_phi = jnp.arcsin(jax.random.uniform(key, (16, 4)) * 0.95)
    dirs = SG.sample_dirs(n[:, None, :], r_theta, r_phi, x_ref_axis=0)
    assert dirs.shape == (16, 4, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs), axis=-1),
                               1.0, atol=1e-4)
    cos = np.asarray(jnp.sum(dirs * n[:, None, :], -1))
    assert (cos > -1e-4).all()   # hemisphere around the normal


def test_sample_pdf_large_t_matches_numpy():
    """The big-T masked-reduction path (T>160, the stage-2 secondary
    ladder's shape) selects exactly the same elements as index gathers."""
    rng = np.random.RandomState(3)
    bins = np.sort(rng.rand(6, 513).astype(np.float32) * 2, -1)
    weights = rng.rand(6, 512).astype(np.float32)
    got = np.asarray(S.sample_pdf(jnp.asarray(bins), jnp.asarray(weights),
                                  32))
    want = _np_sample_pdf_det(bins, weights, 32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # random-u variant exercises the same selection logic
    key = jax.random.PRNGKey(9)
    z = np.asarray(S.sample_pdf(jnp.asarray(bins), jnp.asarray(weights), 32,
                                key=key))
    assert (z >= bins[:, :1] - 1e-6).all() and (z <= bins[:, -1:] + 1e-6).all()
