"""Spherical-Gaussian (SG) shading library.

An SG is parameterized as 7 floats: lobe axis (3), sharpness lambda (1),
amplitude mu (3):  G(v) = mu * exp(lambda * (dot(v, axis) - 1)).

Behavior parity: ref:models/inverRender.py:20-125 and 264-283
(render_envmap_sg / compute_energy / fibonacci_sphere / lambda_trick /
hemisphere_int / integrate_rgb) and ref:models/calLvis.py:302-336
(tangent-frame sampling, SG mixture queries).  These are closed-form math —
pure jnp elementwise chains that XLA fuses into a handful of VPU kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

TINY = 1e-6


def fibonacci_sphere(samples: int) -> np.ndarray:
    """Deterministic near-uniform sphere points [n,3] (host-side, init only).
    ref:models/inverRender.py:66-80."""
    i = np.arange(samples, dtype=np.float64)
    golden = np.pi * (3.0 - np.sqrt(5.0))
    y = 1.0 - (i / float(samples - 1)) * 2.0
    radius = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    theta = golden * i
    return np.stack([np.cos(theta) * radius, y, np.sin(theta) * radius], axis=-1)


def compute_energy(lgt_sgs: jnp.ndarray) -> jnp.ndarray:
    """Total energy per SG [M,3]. ref:models/inverRender.py:59-63."""
    lam = jnp.abs(lgt_sgs[:, 3:4])
    mu = jnp.abs(lgt_sgs[:, 4:])
    return mu * 2.0 * np.pi / lam * (1.0 - jnp.exp(-2.0 * lam))


def render_envmap_sg(lgt_sgs: jnp.ndarray, viewdirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate an SG mixture [M,7] along viewdirs [...,3] -> rgb [...,3].
    ref:models/inverRender.py:36-52."""
    v = viewdirs[..., None, :]  # [...,1,3]
    lobes = lgt_sgs[..., :3] / jnp.linalg.norm(lgt_sgs[..., :3], axis=-1,
                                               keepdims=True)
    lam = jnp.abs(lgt_sgs[..., 3:4])
    mu = jnp.abs(lgt_sgs[..., -3:])
    rgb = mu * jnp.exp(lam * (jnp.sum(v * lobes, axis=-1, keepdims=True) - 1.0))
    return jnp.sum(rgb, axis=-2)


def compute_envmap(lgt_sgs: jnp.ndarray, H: int, W: int,
                   upper_hemi: bool = False) -> jnp.ndarray:
    """Rasterize the SG mixture to an [H,W,3] lat-long envmap (blender
    convention). ref:models/inverRender.py:20-34."""
    phi_max = np.pi / 2.0 if upper_hemi else np.pi
    phi = jnp.linspace(0.0, phi_max, H)
    theta = jnp.linspace(np.pi, -np.pi, W)
    phi, theta = jnp.meshgrid(phi, theta, indexing="ij")
    viewdirs = jnp.stack([jnp.cos(theta) * jnp.sin(phi),
                          jnp.sin(theta) * jnp.sin(phi),
                          jnp.cos(phi)], axis=-1)
    return render_envmap_sg(lgt_sgs, viewdirs)


def lambda_trick(lobe1, lambda1, mu1, lobe2, lambda2, mu2):
    """Product of two SGs approximated as one SG (assumes lambda1 << lambda2).
    ref:models/inverRender.py:83-103."""
    ratio = lambda1 / (lambda2 + TINY)
    lobe1 = lobe1 / (jnp.linalg.norm(lobe1, axis=-1, keepdims=True) + TINY)
    lobe2 = lobe2 / (jnp.linalg.norm(lobe2, axis=-1, keepdims=True) + TINY)
    dot = jnp.sum(lobe1 * lobe2, axis=-1, keepdims=True)
    tmp = jnp.sqrt(ratio * ratio + 1.0 + 2.0 * ratio * dot + TINY)
    tmp = jnp.minimum(tmp, ratio + 1.0)

    lambda3 = lambda2 * tmp
    l1_over_l3 = ratio / (tmp + TINY)
    l2_over_l3 = 1.0 / (tmp + TINY)
    diff = lambda2 * (tmp - ratio - 1.0)

    final_lobes = l1_over_l3 * lobe1 + l2_over_l3 * lobe2
    final_mus = mu1 * mu2 * jnp.exp(diff)
    return final_lobes, lambda3, final_mus


def hemisphere_int(lambda_val, cos_beta):
    """Closed-form hemispherical integral of an SG whose lobe makes angle
    beta with the surface normal. ref:models/inverRender.py:106-125."""
    lambda_val = jnp.maximum(lambda_val, TINY)
    inv_l = 1.0 / (lambda_val + TINY)
    t = jnp.sqrt(lambda_val + TINY) * (1.6988 + 10.8438 * inv_l) / (
        1.0 + 6.2201 * inv_l + 10.2415 * inv_l * inv_l + TINY)

    inv_a = jnp.exp(-t)
    mask = (cos_beta >= 0).astype(lambda_val.dtype)
    inv_b = jnp.exp(-t * jnp.maximum(cos_beta, 0.0))
    s1 = (1.0 - inv_a * inv_b) / (1.0 - inv_a + inv_b - inv_a * inv_b + TINY)
    b = jnp.exp(t * jnp.minimum(cos_beta, 0.0))
    s2 = (b - inv_a) / ((1.0 - inv_a) * (b + 1.0) + TINY)
    s = mask * s1 + (1.0 - mask) * s2

    a_b = 2.0 * np.pi / lambda_val * (jnp.exp(-lambda_val)
                                      - jnp.exp(-2.0 * lambda_val))
    a_u = 2.0 * np.pi / lambda_val * (1.0 - jnp.exp(-lambda_val))
    return a_b * (1.0 - s) + a_u * s


def integrate_rgb(normal, final_lobes, final_lambdas, final_mus):
    """Cosine-lobe SG integration:  sum over lobes of
    mu' * H(lam', <lobe', n>) - mu * alpha_cos * H(lam, <lobe, n>).
    ref:models/inverRender.py:264-283."""
    mu_cos = 32.7080
    lambda_cos = 0.0315
    alpha_cos = 31.7003
    lobe_p, lambda_p, mu_p = lambda_trick(normal, lambda_cos, mu_cos,
                                          final_lobes, final_lambdas, final_mus)
    dot1 = jnp.maximum(jnp.sum(lobe_p * normal, axis=-1, keepdims=True), 0.0)
    dot2 = jnp.maximum(jnp.sum(final_lobes * normal, axis=-1, keepdims=True), 0.0)
    rgb = (mu_p * hemisphere_int(lambda_p, dot1)
           - final_mus * alpha_cos * hemisphere_int(final_lambdas, dot2))
    rgb = jnp.sum(rgb, axis=-2)
    return jnp.clip(rgb, 0.0, 1.0)


def tangent_frame(axis: jnp.ndarray, x_ref_axis=0):
    """Orthonormal (U, V) spanning the plane orthogonal to `axis` [...,3].

    The reference builds U = norm(cross(e, axis)), V = norm(cross(axis, U))
    with e = x-axis for hemisphere sampling (ref:models/calLvis.py:302-313)
    and e = z-axis for SG-lobe sampling (ref:models/inverRender.py:139-144).
    """
    e = jnp.zeros_like(axis).at[..., x_ref_axis].set(1.0)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + TINY)
    u = jnp.cross(e, axis)
    u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + TINY)
    v = jnp.cross(axis, u)
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + TINY)
    return u, v


def sample_dirs(axis, r_theta, r_phi, x_ref_axis=0):
    """Directions at spherical offsets (theta around axis, phi from axis).

    axis [..., 1, 3] broadcast against r_theta/r_phi [..., S].
    Returns [..., S, 3].  ref:models/calLvis.py:302-320.
    """
    u, v = tangent_frame(axis, x_ref_axis)
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + TINY)
    st, ct = jnp.sin(r_theta)[..., None], jnp.cos(r_theta)[..., None]
    sp, cp = jnp.sin(r_phi)[..., None], jnp.cos(r_phi)[..., None]
    return u * ct * sp + v * st * sp + axis * cp


def query_sg_mixture(lgt_sgs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate per-point SG mixtures [N,L,7] at dirs [N,S,3] -> [N,S,3].
    ref:models/calLvis.py:323-336."""
    lobes = lgt_sgs[:, None, :, :3]
    lobes = lobes / jnp.linalg.norm(lobes, axis=-1, keepdims=True)
    lam = lgt_sgs[:, None, :, 3:4]
    mu = lgt_sgs[:, None, :, -3:]
    d = dirs[:, :, None, :]
    rad = mu * jnp.exp(lam * (jnp.sum(d * lobes, axis=-1, keepdims=True) - 1.0))
    return jnp.sum(rad, axis=2)
