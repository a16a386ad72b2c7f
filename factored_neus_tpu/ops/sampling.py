"""Ray-sampling primitives: inverse-CDF sampling and NeuS hierarchical
up-sampling, in fully static shapes (every step has a fixed sample count so
XLA compiles one program; there is no data-dependent control flow).

Behavior parity: ref:models/renderer.py:43-77 (sample_pdf),
ref:models/renderer.py:152-205 (up_sample / cat_z_vals),
ref:models/calLvis.py:25-90 (the secondary-ray copies — unified here; the
reference duplicates the code with identical formulas).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Inverse-CDF sampling of `n_samples` new positions per ray.

    bins:    [B, T]   sorted sample positions
    weights: [B, T-1] section weights
    key:     None -> deterministic mid-bin stratification (det=True in the
             reference); otherwise uniform random u.
    Returns [B, n_samples].
    """
    B, T = bins.shape
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B,T]

    if key is None:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, (B, n_samples))
    else:
        u = jax.random.uniform(key, (B, n_samples), dtype=bins.dtype)

    # searchsorted + gather, TPU-style. Data-dependent [B,n]-from-[B,T]
    # gathers cost 0.3-1.0 ms EACH at these shapes (they were 23% of the
    # stage-1 step and 3.3 ms of stage 2's). Two exact gather-free forms,
    # picked by T (both measured; each loses ~30% on the other's shape):
    if T <= 160:
        # one-hot matmuls: 0/1 weights at HIGHEST precision select exact
        # array elements; [B,n,T] one-hots are small enough that the MXU
        # dot wins (stage-1 ladder: 26.2k -> 34.6k rays/s)
        inds = jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1)
        below = jnp.maximum(inds - 1, 0)
        above = jnp.minimum(inds, T - 1)
        oh_b = jax.nn.one_hot(below, T, dtype=bins.dtype)       # [B, n, T]
        oh_a = jax.nn.one_hot(above, T, dtype=bins.dtype)
        hi = jax.lax.Precision.HIGHEST
        cdf_b = jnp.einsum("bnt,bt->bn", oh_b, cdf, precision=hi)
        cdf_a = jnp.einsum("bnt,bt->bn", oh_a, cdf, precision=hi)
        bins_b = jnp.einsum("bnt,bt->bn", oh_b, bins, precision=hi)
        bins_a = jnp.einsum("bnt,bt->bn", oh_a, bins, precision=hi)
    else:
        # masked reductions: cdf and bins are SORTED, so `cdf[t] <= u` is
        # a prefix mask and every gathered value is a fused masked max/min
        # over the compare tensor (below = prefix max; above = suffix min,
        # falling back to x[T-1] on all-true rows; #prefix >= 1 always
        # since cdf[0] = 0 <= u). Wins at the stage-2 secondary ladder's
        # T=513 (16.8k -> 22.4k rays/s) where the one-hot's HBM traffic
        # inverts the trade.
        mask = cdf[:, None, :] <= u[:, :, None]                 # [B, n, T]
        ninf = jnp.float32(-jnp.inf)
        pinf = jnp.float32(jnp.inf)
        cdf_b = jnp.max(jnp.where(mask, cdf[:, None, :], ninf), axis=-1)
        bins_b = jnp.max(jnp.where(mask, bins[:, None, :], ninf), axis=-1)
        cdf_a = jnp.min(jnp.where(mask, pinf, cdf[:, None, :]), axis=-1)
        bins_a = jnp.min(jnp.where(mask, pinf, bins[:, None, :]), axis=-1)
        full = jnp.all(mask, axis=-1)
        cdf_a = jnp.where(full, cdf[:, -1:], cdf_a)
        bins_a = jnp.where(full, bins[:, -1:], bins_a)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def neus_section_weights(z_vals: jnp.ndarray, sdf: jnp.ndarray,
                         pts_radius: jnp.ndarray, inv_s) -> jnp.ndarray:
    """Per-section NeuS weights used by hierarchical up-sampling.

    z_vals [B,T], sdf [B,T], pts_radius [B,T] (|o+td|), inv_s scalar.
    Returns weights [B, T-1].  ref:models/renderer.py:158-187.
    """
    B, T = z_vals.shape
    inside_sphere = (pts_radius[:, :-1] < 1.0) | (pts_radius[:, 1:] < 1.0)
    prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
    prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
    prev_cos = jnp.concatenate([jnp.zeros((B, 1), z_vals.dtype), cos_val[:, :-1]],
                               axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside_sphere

    dist = next_z - prev_z
    prev_esti = mid_sdf - cos_val * dist * 0.5
    next_esti = mid_sdf + cos_val * dist * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
    return alpha_to_weights(alpha)


def neus_alpha(sdf, true_cos, dists, inv_s,
               cos_anneal_ratio: float = 0.0) -> jnp.ndarray:
    """NeuS section alpha from the SDF and its directional derivative
    estimate: sigmoid-CDF ratio of section-endpoint SDF estimates
    (ref:models/renderer.py:248-268).  Secondary rays fix
    cos_anneal_ratio=0 (ref:models/calLvis.py:113-137).  Shape-agnostic:
    sdf/true_cos/dists broadcast together ([B,T] or flat [N,1]).
    Returns (alpha, prev_cdf) — prev_cdf feeds the cdf_fine statistic."""
    iter_cos = -(jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
                 + jax.nn.relu(-true_cos) * cos_anneal_ratio)
    est_next = sdf + iter_cos * dists * 0.5
    est_prev = sdf - iter_cos * dists * 0.5
    prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
    next_cdf = jax.nn.sigmoid(est_next * inv_s)
    alpha = jnp.clip((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5),
                     0.0, 1.0)
    return alpha, prev_cdf


def alpha_to_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """w_i = a_i * prod_{j<i}(1 - a_j + 1e-7).  ref:models/renderer.py:185-186."""
    B = alpha.shape[0]
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((B, 1), alpha.dtype), 1.0 - alpha + 1e-7],
                        axis=-1), axis=-1)[:, :-1]
    return alpha * trans


def up_sample(rays_o: jnp.ndarray, rays_d: jnp.ndarray, z_vals: jnp.ndarray,
              sdf: jnp.ndarray, n_importance: int, inv_s) -> jnp.ndarray:
    """One NeuS up-sampling step at fixed inv_s. Returns new z [B, n_importance]."""
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
    radius = jnp.linalg.norm(pts, axis=-1)
    weights = neus_section_weights(z_vals, sdf, radius, inv_s)
    return jax.lax.stop_gradient(sample_pdf(z_vals, weights, n_importance))


def cat_z_vals(sdf_fn, rays_o, rays_d, z_vals, new_z_vals, sdf,
               last: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge-sort new z positions in and (unless last) evaluate their SDF.

    sdf_fn: pts [N,3] -> sdf [N]  (already stop-gradiented by the caller)
    Returns (z_sorted [B, T+I], sdf_sorted [B, T+I] or input sdf when last).
    ref:models/renderer.py:191-205.
    """
    B, T = z_vals.shape
    I = new_z_vals.shape[1]
    z_cat = jnp.concatenate([z_vals, new_z_vals], axis=-1)
    if last:
        return jnp.sort(z_cat, axis=-1), sdf
    pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z_vals[..., :, None]
    new_sdf = sdf_fn(pts.reshape(-1, 3)).reshape(B, I)
    sdf_cat = jnp.concatenate([sdf, new_sdf], axis=-1)
    # multi-operand key/value sort instead of argsort + two take_along_axis
    # gathers: the gathers dominated the ladder on TPU (profile: ~3.6 ms of
    # a 18.3 ms step across the 4 rounds)
    z_sorted, sdf_sorted = jax.lax.sort((z_cat, sdf_cat), dimension=-1,
                                        is_stable=True, num_keys=1)
    return z_sorted, sdf_sorted


def hierarchical_z_vals(sdf_fn, rays_o, rays_d, z_vals, n_importance: int,
                        up_sample_steps: int, base_inv_s: float = 64.0,
                        inv_s_override=None) -> jnp.ndarray:
    """Full NeuS importance-sampling ladder: `up_sample_steps` rounds of
    n_importance//steps new samples at inv_s = base*2^i (or a fixed override,
    used by the secondary-ray tracer which passes the learned inv_s;
    ref:models/calLvis.py:370-379).

    The loop is unrolled at trace time — each round has a distinct static
    shape (64 -> 80 -> 96 -> 112 -> 128), which XLA compiles as straight-line
    fused code; no dynamic shapes, no retracing.
    """
    B = rays_o.shape[0]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., :, None]
    sdf = jax.lax.stop_gradient(sdf_fn(pts.reshape(-1, 3))).reshape(B, -1)
    per_step = n_importance // up_sample_steps
    for i in range(up_sample_steps):
        inv_s = base_inv_s * 2 ** i if inv_s_override is None else inv_s_override
        new_z = up_sample(rays_o, rays_d, z_vals, sdf, per_step, inv_s)
        z_vals, sdf = cat_z_vals(
            lambda p: jax.lax.stop_gradient(sdf_fn(p)),
            rays_o, rays_d, z_vals, new_z, sdf,
            last=(i + 1 == up_sample_steps))
    return z_vals
