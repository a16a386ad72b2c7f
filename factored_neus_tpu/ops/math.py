"""Scalar/vector math primitives shared by all rendering stages.

Behavior parity targets: ref:models/math_utils.py (sRGB transfer curves,
reflection, Smith G1 masking term, integrated directional encoding).
Everything here is pure jnp, shape-polymorphic over leading dims, and safe to
differentiate (no data-dependent control flow).
"""
from __future__ import annotations

import functools
import math as _pymath

import jax
import jax.numpy as jnp
import numpy as np

F32_EPS = float(np.finfo(np.float32).eps)
TINY = 1e-6


def dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Last-axis dot product, keepdims. ref:models/math_utils.py:17-18."""
    return jnp.sum(x * y, axis=-1, keepdims=True)


def l2_normalize(x: jnp.ndarray, eps: float = F32_EPS) -> jnp.ndarray:
    """Unit-normalize along the last axis. ref:models/math_utils.py:12-14."""
    return x * jnp.sqrt(1.0 / jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def norm_axis(x: jnp.ndarray) -> jnp.ndarray:
    """Normalize with additive epsilon (SG convention). ref:models/inverRender.py:55-56."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + TINY)


def reflect(d: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Reflect direction `d` about normal `n`. ref:models/math_utils.py:21-22."""
    return 2.0 * dot(d, n) * n - d


def smith_g1(cos_theta: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Smith G1 shadowing-masking term. ref:models/math_utils.py:5-9."""
    sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta * cos_theta, 0.0))
    tan_theta = sin_theta / (cos_theta + 1e-10)
    root = alpha * tan_theta
    return 2.0 / (1.0 + jnp.hypot(root, jnp.ones_like(root)))


def linear_to_srgb(linear: jnp.ndarray) -> jnp.ndarray:
    """sRGB OETF; input assumed in [0, 1]. ref:models/math_utils.py:138-144."""
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * jnp.maximum(F32_EPS, linear) ** (5.0 / 12.0) - 11.0) / 200.0
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB EOTF; input assumed in [0, 1]. ref:models/math_utils.py:147-152."""
    linear0 = 25.0 / 323.0 * srgb
    linear1 = jnp.maximum(F32_EPS, (200.0 * srgb + 11.0) / 211.0) ** (12.0 / 5.0)
    return jnp.where(srgb <= 0.04045, linear0, linear1)


def rgb_to_hsv(x: jnp.ndarray):
    """RGB -> (h, s, v) channels, each [..., 1]. ref:models/math_utils.py:155-177.

    Vectorized `where` formulation of the reference's boolean-mask scatter.
    The masks are disjoint unless channels tie; the reference writes r,
    then g, then b, so ties resolve to the LAST write (b wins) — mirrored
    here by applying the selects in the same order (each later `where`
    overwrites the earlier value on its mask).
    """
    c_max = jnp.max(x, axis=-1, keepdims=True)
    c_min = jnp.min(x, axis=-1, keepdims=True)
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    v = c_max
    s = jnp.where(v > 0, (v - c_min) / (v + 1e-6), 0.0)
    denom = v - c_min + 1e-6
    h_r = 60.0 * (g - b) / denom
    h_g = 120.0 + 60.0 * (b - r) / denom
    h_b = 240.0 + 60.0 * (r - g) / denom
    h = jnp.zeros_like(v)
    h = jnp.where(v == r, h_r, h)
    h = jnp.where(v == g, h_g, h)
    h = jnp.where(v == b, h_b, h)
    return h, s, v


# ---------------------------------------------------------------------------
# Integrated directional encoding (Ref-NeRF).  ref:models/math_utils.py:25-135
# The coefficient tables are precomputed with numpy at trace time (static),
# and the complex Vandermonde product is expressed in real arithmetic so the
# whole encoding stays in f32 on the VPU (TPUs have no complex support in
# Pallas and complex64 costs double the HBM traffic).
# ---------------------------------------------------------------------------

def _generalized_binomial_coeff(a, k):
    return np.prod(a - np.arange(k)) / max(float(_pymath.factorial(k)), 1e-7)


def _assoc_legendre_coeff(l, m, k):
    return ((-1.0) ** m * 2.0 ** l * _pymath.factorial(l)
            / max(float(_pymath.factorial(k)), 1e-7)
            / max(float(_pymath.factorial(l - k - m)), 1e-7)
            * _generalized_binomial_coeff(0.5 * (l + k + m - 1.0), l))


def _sph_harm_coeff(l, m, k):
    return (np.sqrt((2.0 * l + 1.0) * _pymath.factorial(l - m)
                    / max(4.0 * np.pi * _pymath.factorial(l + m), 1e-7))
            * _assoc_legendre_coeff(l, m, k))


def get_ml_array(deg_view: int) -> np.ndarray:
    """All (m, l) pairs used by the encoding, shape [2, n]."""
    ml_list = []
    for i in range(deg_view):
        l = 2 ** i
        for m in range(l + 1):
            ml_list.append((m, l))
    return np.array(ml_list).T


@functools.lru_cache(maxsize=None)
def _ide_tables(deg_view: int):
    ml_array = get_ml_array(deg_view)
    l_max = 2 ** (deg_view - 1)
    mat = np.zeros((l_max + 1, ml_array.shape[1]), dtype=np.float64)
    for i, (m, l) in enumerate(ml_array.T):
        for k in range(l - m + 1):
            mat[k, i] = _sph_harm_coeff(l, m, k)
    sigma = 0.5 * ml_array[1, :] * (ml_array[1, :] + 1)
    return (ml_array.astype(np.int32), mat.astype(np.float32),
            sigma.astype(np.float32), l_max)


def generate_ide_fn(deg_view: int):
    """Integrated directional encoding. Returns fn(xyz[...,3], kappa_inv[...,1])
    -> [..., 2*n_harmonics]. ref:models/math_utils.py:70-135.
    """
    ml_array, mat, sigma, l_max = _ide_tables(deg_view)
    m_pows = ml_array[0, :]  # [n]

    def integrated_dir_enc_fn(xyz, kappa_inv):
        x = xyz[..., 0:1]
        y = xyz[..., 1:2]
        z = xyz[..., 2:3]
        # z Vandermonde [ ..., l_max+1 ]
        vmz = jnp.concatenate([z ** i for i in range(l_max + 1)], axis=-1)
        # (x+iy)^m in real arithmetic: r^m (cos mθ + i sin mθ)
        r = jnp.sqrt(x * x + y * y)
        theta = jnp.arctan2(y, x)
        m_f = jnp.asarray(m_pows, dtype=xyz.dtype)
        r_pow = r ** m_f  # [..., n]
        vmxy_re = r_pow * jnp.cos(m_f * theta)
        vmxy_im = r_pow * jnp.sin(m_f * theta)
        # precision-critical small matmul: the l=8 Legendre columns cancel
        # from O(100) coefficients down to O(0.1); bf16 MXU passes lose the
        # encoding entirely, so force full f32.
        zcomp = jnp.einsum("...k,kn->...n", vmz, jnp.asarray(mat),
                           precision=jax.lax.Precision.HIGHEST)
        sph_re = vmxy_re * zcomp
        sph_im = vmxy_im * zcomp
        atten = jnp.exp(-jnp.asarray(sigma) * kappa_inv)
        return jnp.concatenate([sph_re * atten, sph_im * atten], axis=-1)

    return integrated_dir_enc_fn
