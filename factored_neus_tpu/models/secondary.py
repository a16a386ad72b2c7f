"""Secondary-ray tracing against the frozen stage-1 SDF: ground-truth light
visibility (occlusion) and first-hit radiance for stage-2 distillation.

Behavior parity: ref:models/calLvis.py
  compute_weight       :93-150   NeuS alpha weights along a secondary ray
  cal_firHit_rgb       :153-204  first-hit surface radiance
  cal_indiLgt          :339-409  4 cosine-hemisphere rays per surface point
  compute_light_visibility :207-299  64 fibonacci lights (alternative path)
  sample_dirs / query_indir_illum :302-336  (in ops.sg)

TPU-first design: everything is evaluated for EVERY primary ray at static
shape (the reference gathers the surface-hit subset, a dynamic shape); callers
mask with the `sdf_mask` they computed at surface localization.  Secondary
SDF sweeps are chunked with lax.map to bound the activation working set.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling as S
from ..ops import sg as SG
from ..ops.chunk import chunked_apply, chunked_apply_tree

# secondary-ray sampling budget (matches ref:calLvis.py:340,364,378)
N_HEMI_DIRS = 4
N_COARSE = 512
N_FINE = 32
SECONDARY_SAMPLE_DIST = (1.0 - 0.1) / 32.0   # ref:calLvis.py:96,156


def _section_geometry(rays_o, rays_d, z_vals, sample_dist):
    """dists / mid_z / pts / dirs for a z ladder. ref:calLvis.py:96-109."""
    B, T = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((B, 1), sample_dist, z_vals.dtype)], -1)
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    return dists, mid_z, pts, dirs


def first_crossing(sdf: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Index of the first +→- sign change along the sample axis.

    Implements the reference's `min(sign(sdf) * arange(T, 0, -1))` trick
    (ref:renderer.py:290-292) as a vectorized argmin; returns
    (min_val [B], min_idx [B]).
    """
    B, T = sdf.shape
    ramp = jnp.arange(T, 0, -1, dtype=sdf.dtype)[None, :]
    tmp = jnp.sign(sdf) * ramp
    return jnp.min(tmp, axis=-1), jnp.argmin(tmp, axis=-1)


def surface_localize(mid_z: jnp.ndarray, sdf: jnp.ndarray,
                     rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     inside_mask: jnp.ndarray):
    """Linear SDF-root surface point per ray, static shape.

    Returns (pts_surf [B,3], z_surf [B,1], sdf_mask [B]).
    ref:renderer.py:588-604 (and the identical stage-3 block :658-674).
    """
    B, T = sdf.shape
    min_val, min_idx = first_crossing(sdf)
    sdf_mask = (min_val < 0.0) & (min_idx >= 1) & inside_mask
    idx = jnp.clip(min_idx, 1, T - 1)[:, None]
    z_lo = jnp.take_along_axis(mid_z, idx - 1, axis=-1)
    z_hi = jnp.take_along_axis(mid_z, idx, axis=-1)
    s_lo = jnp.take_along_axis(sdf, idx - 1, axis=-1)
    s_hi = jnp.take_along_axis(sdf, idx, axis=-1)
    z_surf = (s_lo * z_hi - s_hi * z_lo) / (s_lo - s_hi + 1e-10)
    pts_surf = rays_o + rays_d * z_surf
    return pts_surf, z_surf, sdf_mask


def compute_weight(sdf_fwd, sdf_grad, inv_s, rays_o, rays_d, z_vals,
                   chunk: int = 65536):
    """NeuS weights along secondary rays, fully detached.

    sdf_fwd: pts[N,3] -> sdf[N]; sdf_grad: pts[N,3] -> grad[N,3].
    Returns (weights [B,T], weights_inside [B,T]). ref:calLvis.py:93-150.
    The reference computes (and detaches) the SDF gradient here; the cosine it
    feeds is needed for the alpha estimate, so we keep it — but under
    stop_gradient the double-backprop the reference pays is gone for free.
    """
    B, T = z_vals.shape
    dists, mid_z, pts, dirs = _section_geometry(rays_o, rays_d, z_vals,
                                                SECONDARY_SAMPLE_DIST)
    pts_flat = pts.reshape(-1, 3)
    sdf = jax.lax.stop_gradient(
        chunked_apply(sdf_fwd, pts_flat, chunk)).reshape(B, T)
    grads = jax.lax.stop_gradient(
        chunked_apply(sdf_grad, pts_flat, chunk)).reshape(B, T, 3)

    alpha, _ = S.neus_alpha(sdf, jnp.sum(dirs * grads, -1), dists, inv_s)

    inside = (jnp.linalg.norm(pts, axis=-1) < 1.0).astype(z_vals.dtype)
    weights = S.alpha_to_weights(alpha)
    return weights, weights * inside


def cal_fir_hit_rgb(sdf_apply_full, sdf_grad, color_fn, rays_o, rays_d,
                    z_vals, chunk: int = 65536):
    """First-hit surface radiance per secondary ray (zeros when no hit).

    sdf_apply_full: pts -> [N, 1+F] (sdf|feature); color_fn(pts, n, dirs,
    feat) -> rgb.  Returns (rgb [B,3], hit_mask [B]).  ref:calLvis.py:153-204.
    """
    B, T = z_vals.shape
    dists, mid_z, pts, dirs = _section_geometry(rays_o, rays_d, z_vals,
                                                SECONDARY_SAMPLE_DIST)
    out = chunked_apply(sdf_apply_full, pts.reshape(-1, 3), chunk)
    sdf = out[:, 0].reshape(B, T)

    inside = (jnp.linalg.norm(pts, axis=-1) < 1.0)
    inside_mask = jnp.sum(inside, axis=-1) > 0

    pts_surf, _, hit_mask = surface_localize(mid_z, sdf, rays_o, rays_d,
                                             inside_mask)
    n_surf = sdf_grad(pts_surf)
    f_surf = sdf_apply_full(pts_surf)[:, 1:]
    rgb_surf = color_fn(pts_surf, n_surf, rays_d, f_surf)
    rgb = jnp.where(hit_mask[:, None], rgb_surf, 0.0)
    return rgb, hit_mask


def fine_sweep_targets(sdf_vgf, color_fn, inv_s, rays_o, rays_d, z_vals,
                       chunk: int = 65536):
    """Both stage-2 fine-sweep targets from ONE shared SDF sweep.

    ``compute_weight`` and ``cal_fir_hit_rgb`` evaluate the SDF at the SAME
    fine mid-points (2 forwards + 1 jax.grad ~= 4 MLP passes over the
    [B*T] points); this computes (sdf, grad) once through the vjp-shared
    forward (~2 passes) and reuses the values for both the NeuS occlusion
    weights (ref:calLvis.py:93-150) and the first-hit radiance
    (ref:calLvis.py:153-204) — identical formulas, one sweep.  The surface
    re-evaluation also collapses to one vjp call (grad+feature together).

    sdf_vgf: pts[N,3] -> (sdf[N], feat[N,F], grad[N,3]).  All outputs are
    stop_gradient'd (they are distillation targets).
    Returns (rgb [B,3], hit_mask [B], weights [B,T], weights_inside [B,T]).
    """
    B, T = z_vals.shape
    dists, mid_z, pts, dirs = _section_geometry(rays_o, rays_d, z_vals,
                                                SECONDARY_SAMPLE_DIST)
    pts_flat = pts.reshape(-1, 3)
    sdf_f, _, grads_f = jax.lax.stop_gradient(
        chunked_apply_tree(lambda p: sdf_vgf(p), pts_flat, chunk))
    sdf = sdf_f.reshape(B, T)
    grads = grads_f.reshape(B, T, 3)

    # --- NeuS weights along the secondary ray (compute_weight formulas) ---
    alpha, _ = S.neus_alpha(sdf, jnp.sum(dirs * grads, -1), dists, inv_s)
    inside = jnp.linalg.norm(pts, axis=-1) < 1.0
    weights = S.alpha_to_weights(alpha)
    weights_inside = weights * inside.astype(z_vals.dtype)

    # --- first-hit radiance (cal_fir_hit_rgb formulas) ---
    inside_mask = jnp.sum(inside, axis=-1) > 0
    pts_surf, _, hit_mask = surface_localize(mid_z, sdf, rays_o, rays_d,
                                             inside_mask)
    _, f_surf, n_surf = jax.lax.stop_gradient(sdf_vgf(pts_surf))
    rgb_surf = color_fn(pts_surf, n_surf, rays_d, f_surf)
    rgb = jnp.where(hit_mask[:, None], rgb_surf, 0.0)
    return (jax.lax.stop_gradient(rgb), hit_mask, weights, weights_inside)


def cal_indi_lgt(key, surf, normal, sdf_fwd, sdf_apply_full, sdf_grad,
                 inv_s, color_fn, lvis_fn, indirect_fn,
                 chunk: int = 131072,
                 sdf_fwd_coarse=None, sdf_vgf=None) -> Dict[str, jnp.ndarray]:
    """Distillation targets from M=4 cosine-hemisphere secondary rays per
    surface point. Returns gt/pre lvis [P,4] and trace radiance [P,4,3].
    ref:calLvis.py:339-409.

    sdf_fwd_coarse (optional) is used ONLY for the 512-sample coarse sweep
    that places the fine samples — a reduced-precision forward is safe
    there; the distillation targets themselves (compute_weight /
    cal_fir_hit_rgb) always go through sdf_fwd.

    sdf_vgf (optional): pts -> (sdf, feat, grad) single-sweep closure; when
    given, the two fine-sample passes (compute_weight + cal_fir_hit_rgb)
    collapse into one shared sweep via ``fine_sweep_targets``.
    """
    if sdf_fwd_coarse is None:
        sdf_fwd_coarse = sdf_fwd
    P = surf.shape[0]
    k1, k2 = jax.random.split(key)
    r_theta = jax.random.uniform(k1, (P, N_HEMI_DIRS)) * 2.0 * np.pi
    rand_z = jax.random.uniform(k2, (P, N_HEMI_DIRS)) * 0.95
    r_phi = jnp.arcsin(rand_z)
    dirs = SG.sample_dirs(normal[:, None, :], r_theta, r_phi, x_ref_axis=0)

    surf_flat = jnp.broadcast_to(surf[:, None, :],
                                 (P, N_HEMI_DIRS, 3)).reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)

    # coarse sweep on [0, 1] along the secondary ray (ref:calLvis.py:363-368;
    # the reference computes near/far from the unit sphere but never uses it)
    z_coarse = jnp.broadcast_to(jnp.linspace(0.0, 1.0, N_COARSE),
                                (P * N_HEMI_DIRS, N_COARSE))
    pts_coarse = (surf_flat[:, None, :]
                  + dirs_flat[:, None, :] * z_coarse[:, :, None])
    coarse_sdf = jax.lax.stop_gradient(
        chunked_apply(sdf_fwd_coarse, pts_coarse.reshape(-1, 3), chunk)
    ).reshape(P * N_HEMI_DIRS, N_COARSE)

    z_fine = S.up_sample(surf_flat, dirs_flat, z_coarse, coarse_sdf,
                         N_FINE, inv_s)

    if sdf_vgf is not None:
        trace_radiance, _, _, weights_inside = fine_sweep_targets(
            sdf_vgf, color_fn, inv_s, surf_flat, dirs_flat, z_fine, chunk)
    else:
        trace_radiance, _ = cal_fir_hit_rgb(sdf_apply_full, sdf_grad,
                                            color_fn, surf_flat, dirs_flat,
                                            z_fine, chunk)
        _, weights_inside = compute_weight(sdf_fwd, sdf_grad, inv_s,
                                           surf_flat, dirs_flat, z_fine,
                                           chunk)
    occu = jnp.sum(weights_inside, axis=-1)
    gt_lvis = jax.lax.stop_gradient(
        (1.0 - occu).reshape(P, N_HEMI_DIRS))
    gt_trace_radiance = jax.lax.stop_gradient(
        trace_radiance.reshape(P, N_HEMI_DIRS, 3))

    pre_lvis = lvis_fn(surf_flat, dirs_flat).reshape(P, N_HEMI_DIRS)
    pre_sgs = indirect_fn(surf)                              # [P, L, 7]
    pre_trace_radiance = SG.query_sg_mixture(pre_sgs, dirs)  # [P, 4, 3]

    return {
        "gt_lvis": gt_lvis,
        "pre_lvis": pre_lvis,
        "gt_trace_radiance": gt_trace_radiance,
        "pre_trace_radiance": pre_trace_radiance,
    }


def compute_light_visibility(key, surf, normal, sdf_fwd, sdf_apply_full,
                             sdf_grad, inv_s, color_fn, lvis_fn, indirect_fn,
                             n_lights: int = 64, chunk: int = 131072,
                             sdf_vgf=None) -> Dict[str, jnp.ndarray]:
    """Alternative stage-2 target: fixed fibonacci-sphere light directions.
    ref:calLvis.py:207-299 (the commented-out path at ref:renderer.py:608).

    Static-shape version: all P x n_lights pairs are traced; the reference's
    front-lit gather becomes a multiplicative mask.  Memory is bounded by the
    lax.map chunking inside the SDF sweeps.
    """
    P = surf.shape[0]
    lobes = jnp.asarray(SG.fibonacci_sphere(n_lights), dtype=surf.dtype)
    surf2l = jnp.broadcast_to(lobes[None], (P, n_lights, 3))
    surf2l = surf2l / jnp.linalg.norm(surf2l, axis=-1, keepdims=True)

    front_lit = jnp.einsum("ijk,ik->ij", surf2l, normal) > 0    # [P,L]

    surf_flat = jnp.broadcast_to(surf[:, None, :],
                                 (P, n_lights, 3)).reshape(-1, 3)
    dirs_flat = surf2l.reshape(-1, 3)

    z_coarse = jnp.broadcast_to(
        jnp.linspace(0.1, 0.9, N_COARSE), (P * n_lights, N_COARSE))
    pts_coarse = (surf_flat[:, None, :]
                  + dirs_flat[:, None, :] * z_coarse[:, :, None])
    coarse_sdf = jax.lax.stop_gradient(
        chunked_apply(sdf_fwd, pts_coarse.reshape(-1, 3), chunk)
    ).reshape(P * n_lights, N_COARSE)

    z_fine = S.up_sample(surf_flat, dirs_flat, z_coarse, coarse_sdf,
                         N_FINE, inv_s)
    if sdf_vgf is not None:
        surf_rgb, _, _, weights_inside = fine_sweep_targets(
            sdf_vgf, color_fn, inv_s, surf_flat, dirs_flat, z_fine, chunk)
    else:
        surf_rgb, _ = cal_fir_hit_rgb(sdf_apply_full, sdf_grad, color_fn,
                                      surf_flat, dirs_flat, z_fine, chunk)
        _, weights_inside = compute_weight(sdf_fwd, sdf_grad, inv_s,
                                           surf_flat, dirs_flat, z_fine,
                                           chunk)
    occu = jnp.sum(weights_inside, axis=-1).reshape(P, n_lights)

    fl = front_lit.astype(surf.dtype)
    gt_lvis = jnp.clip((1.0 - occu) * fl, 0.0, 1.0)
    gt_rgb = jnp.clip(surf_rgb.reshape(P, n_lights, 3) * fl[..., None], 0., 1.)

    pre_lvis = lvis_fn(surf_flat, dirs_flat).reshape(P, n_lights) * fl
    pre_rgb = SG.query_sg_mixture(indirect_fn(surf), surf2l)

    return {
        "gt_lvis": jax.lax.stop_gradient(gt_lvis),
        "pre_lvis": pre_lvis,
        "gt_trace_radiance": jax.lax.stop_gradient(gt_rgb),
        "pre_trace_radiance": pre_rgb,
    }
