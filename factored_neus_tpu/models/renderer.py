"""NeuS volume/surface renderer — the stage-1/2/3 per-ray compute graphs.

Behavior parity: ref:models/renderer.py
  render_core_outside :112-149   NeRF++ background compositing
  up_sample/cat_z_vals:152-205   (in ops.sampling)
  render_core         :208-389   SDF + radiance + surface reflection color
  render              :391-500   stage-1 entry
  lvis_mateIllu_render_util :503-564
  lvis_render         :567-627   stage-2 entry
  mateIllu_render     :630-726   stage-3 entry
  extract_fields/extract_geometry :14-40,729-734 (in meshing.extract)

TPU-first design decisions:
  * Static shapes end-to-end.  The reference's data-dependent surface branch
    (gather masked rays, run RefColor on 2*mask points,
    ref:renderer.py:296-343) is evaluated for every ray at fixed shape and
    blended with `where` — identical results, one compiled program.
  * Eikonal gradients come from one jax.grad VJP over the summed SDF instead
    of torch's create_graph autograd (ref:fields.py:100-111).
  * The dead `sigma` computation in the reference core
    (ref:renderer.py:265-266, value never consumed) is not reproduced.
  * All sub-networks are pure functions over a single `params` dict with keys
    {nerf, sdf, variance, color, ref_color, lvis, indirect, material}.
"""
from __future__ import annotations

import dataclasses
import os as _os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sampling as S
from . import fields as F
from . import secondary as SEC
from .materials import EnvmapMaterialConfig, envmap_material_apply


@dataclasses.dataclass(frozen=True)
class RendererConfig:
    n_samples: int = 64
    n_importance: int = 64
    n_outside: int = 0
    up_sample_steps: int = 4
    perturb: float = 1.0
    sdf: F.SDFConfig = F.SDFConfig()
    rendering: F.RenderingConfig = F.RenderingConfig()
    nerf: F.NeRFConfig = F.NeRFConfig()
    refcolor: F.RefColorConfig = F.RefColorConfig()
    lvis: F.LvisConfig = F.LvisConfig()
    indirect: F.IndirectLightConfig = F.IndirectLightConfig()
    material: EnvmapMaterialConfig = EnvmapMaterialConfig()
    secondary_chunk: int = 131072
    # rematerialize the per-sample network evaluations in the backward pass:
    # the eikonal double-backprop otherwise keeps O(20) copies of the
    # [B*T, 256] activations live (OOMs HBM beyond ~4k rays/chip).  None =
    # auto: the train-step factory enables it only for large per-chip
    # batches (>2048 rays), since at small batches it costs ~13% step time
    # for memory nothing needs (measured: 22.0k vs 19.6k rays/s at b512)
    remat: "bool | None" = None
    # route the no-grad SDF sweeps (importance-sampling ladder, secondary-ray
    # coarse sweeps) through the fused Pallas kernel (ops.pallas_sdf);
    # forward-only, so inputs are stop-gradiented at the call sites
    use_pallas_sampling: bool = False
    # store the no-grad sweep activations in bf16 (halves the HBM traffic of
    # the bandwidth-bound sweeps, BENCHMARKS.md roofline); the sdf values
    # only steer importance-sample placement, same deviation class as the
    # validated bf16 MXU default
    sweep_act_bf16: bool = True
    # share ONE vjp-based SDF sweep between the two stage-2 fine-sample
    # passes (NeuS occlusion weights + first-hit radiance evaluate the SAME
    # points; ~4 MLP passes -> ~2). Equivalence-tested vs the split path
    # (tests/test_renderer.py); flag kept for A/B ablation.
    fused_fine_sweep: bool = True
    # store the DIFFERENTIABLE core's activations + vjp residuals in bf16:
    # +8.7% stage-1 step, quality-validated at full architecture (2k-iter
    # sphere convergence: PSNR/chamfer statistically identical to f32 —
    # BENCHMARKS.md). FNEUS_CORE_ACT_BF16=0 restores f32 for ablations,
    # like FNEUS_MATMUL_PRECISION.
    core_act_bf16: bool = _os.environ.get("FNEUS_CORE_ACT_BF16", "1") == "1"
    # fused Pallas geometry core (ops.pallas_geometry): PE+SDF+input-grad
    # forward and the full custom-VJP backward run VMEM-resident (+10%
    # stage-1 step; quality-validated, BENCHMARKS.md) — equivalence-tested
    # vs the XLA path (tests/test_pallas_geometry.py). None = auto: on for
    # TPU backends, off elsewhere (interpret mode is slow);
    # FNEUS_PALLAS_GEOMETRY=0/1 overrides.
    use_pallas_geometry: "bool | None" = (
        None if _os.environ.get("FNEUS_PALLAS_GEOMETRY", "auto") == "auto"
        else _os.environ.get("FNEUS_PALLAS_GEOMETRY") == "1")

    @property
    def n_total(self) -> int:
        return self.n_samples + self.n_importance


# -- network closures over the params dict -----------------------------------

def _sdf_fwd_sampling(params, cfg, bf16_act: bool = False):
    """SDF forward for no-grad sampling sweeps: fused Pallas kernel when
    enabled (single-pass bf16 MXU; the ~1e-2 sdf error only nudges where
    importance samples land), bf16-activation XLA path where a call site
    requests it (halves the sweep's HBM traffic — measured +17% on the
    stage-2 step whose 1M-point coarse sweep dominates, but -6% on the
    stage-3 step and neutral on stage-1, so it is per-call-site), plain
    XLA otherwise."""
    if cfg.use_pallas_sampling:
        from ..ops.pallas_sdf import sdf_forward_pallas
        return lambda p: sdf_forward_pallas(
            params["sdf"], cfg.sdf, jax.lax.stop_gradient(p),
            bf16_matmul=True)
    if bf16_act and cfg.sweep_act_bf16:
        return lambda p: F.sdf_value_sweep(
            params["sdf"], cfg.sdf, jax.lax.stop_gradient(p),
            act_dtype=jnp.bfloat16)
    return lambda p: F.sdf_value_sweep(
        params["sdf"], cfg.sdf, jax.lax.stop_gradient(p))


def _sdf_full(params, cfg):
    return lambda p: F.sdf_apply(params["sdf"], cfg.sdf, p)


def _use_pallas_geometry(cfg) -> bool:
    use_pg = cfg.use_pallas_geometry
    if use_pg is None:                      # auto: TPU yes, CPU/other no
        from ..ops.pallas_sdf import on_tpu
        use_pg = on_tpu()
    return bool(use_pg)


def _sdf_grad(params, cfg):
    return lambda p: F.sdf_gradient(params["sdf"], cfg.sdf, p)


def _sdf_vgf(params, cfg):
    """pts -> (sdf, feature, grad) from one vjp-shared forward, for the
    merged stage-2 fine sweep (secondary.fine_sweep_targets)."""
    return lambda p: F.sdf_value_and_grad_feat(params["sdf"], cfg.sdf, p)


def _color_fn(params, cfg):
    return lambda pts, n, d, f: F.rendering_apply(
        params["color"], cfg.rendering, pts, n, d, f)


# ---------------------------------------------------------------------------
# Stage 1
# ---------------------------------------------------------------------------

def render_core_outside(params, cfg: RendererConfig, rays_o, rays_d, z_vals,
                        sample_dist, background_rgb=None) -> Dict[str, Any]:
    """NeRF++ inverted-sphere background. ref:renderer.py:112-149."""
    B, T = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((B, 1), sample_dist, z_vals.dtype)], -1)
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dis_to_center = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True),
                             1.0, 1e10)
    pts4 = jnp.concatenate([pts / dis_to_center, 1.0 / dis_to_center], -1)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (B, T, 3))

    # bf16 activation storage for the background NeRF measured SLOWER
    # (23.9k vs 24.6k rays/s): its f32 GEMMs already execute at bf16 MXU
    # rate under the default TPU matmul precision, so the converts are
    # pure overhead and the step is not HBM-bound (hbm_frac 0.87).
    # Default stays f32; toggle kept for the BENCHMARKS.md womask ledger.
    nerf_bf16 = (cfg.core_act_bf16
                 and _os.environ.get("FNEUS_NERF_ACT_BF16", "0") == "1")
    density, color = F.nerf_apply(params["nerf"], cfg.nerf,
                                  pts4.reshape(-1, 4), dirs.reshape(-1, 3),
                                  act_dtype=jnp.bfloat16 if nerf_bf16
                                  else None)
    sampled_color = jax.nn.sigmoid(color).reshape(B, T, 3)
    alpha = 1.0 - jnp.exp(-jax.nn.softplus(density.reshape(B, T)) * dists)
    weights = S.alpha_to_weights(alpha)
    color_out = jnp.sum(weights[:, :, None] * sampled_color, axis=1)
    if background_rgb is not None:
        color_out = color_out + background_rgb * (
            1.0 - jnp.sum(weights, -1, keepdims=True))
    return {"color": color_out, "sampled_color": sampled_color,
            "alpha": alpha, "weights": weights}


def render_core(params, cfg: RendererConfig, rays_o, rays_d, z_vals,
                sample_dist, background_alpha=None,
                background_sampled_color=None, background_rgb=None,
                cos_anneal_ratio: float = 0.0) -> Dict[str, Any]:
    """Fused SDF + radiance + surface-color core. ref:renderer.py:208-389."""
    B, T = z_vals.shape
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((B, 1), sample_dist, z_vals.dtype)], -1)
    mid_z = z_vals + dists * 0.5

    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)
    pts_flat = pts.reshape(-1, 3)
    dirs_flat = dirs.reshape(-1, 3)

    core_act = jnp.bfloat16 if cfg.core_act_bf16 else None

    use_pg = _use_pallas_geometry(cfg)
    if use_pg:
        from ..ops.pallas_geometry import sdf_value_grad_feat_pallas

        def geometry(sdf_params, x):
            s_val, feat, grad = sdf_value_grad_feat_pallas(
                sdf_params, cfg.sdf, x, bf16=cfg.core_act_bf16)
            return s_val[:, None], feat, grad
        # no jax.checkpoint: the custom-VJP backward recomputes in VMEM
    else:
        def geometry(sdf_params, x):
            # single shared forward for (sdf | feature) and the sdf gradient
            s_val, feat, grad = F.sdf_value_and_grad_feat(
                sdf_params, cfg.sdf, x, act_dtype=core_act)
            return s_val[:, None], feat, grad

        if bool(cfg.remat):
            geometry = jax.checkpoint(geometry)
    sdf, feature, gradients = geometry(params["sdf"], pts_flat)

    inv_s = jnp.clip(F.variance_inv_s(params["variance"]), 1e-6, 1e6)

    true_cos = jnp.sum(dirs_flat * gradients, -1, keepdims=True)
    alpha, prev_cdf = S.neus_alpha(sdf, true_cos, dists.reshape(-1, 1),
                                   inv_s, cos_anneal_ratio)
    alpha = alpha.reshape(B, T)

    pts_norm = jnp.linalg.norm(pts, axis=-1)                     # [B, T]
    inside_sphere = jax.lax.stop_gradient(
        (pts_norm < 1.0).astype(z_vals.dtype))
    relax_inside = jax.lax.stop_gradient(
        (pts_norm < 1.2).astype(z_vals.dtype))
    inside_sphere_mask = jnp.sum(inside_sphere, -1) > 0.0        # [B]

    # NOTE: a fused Pallas radiance kernel exists (ops.pallas_radiance,
    # equivalence-tested) but measured SLOWER in-step (20.1k vs 25.2k
    # rays/s): its HBM traffic is dominated by the unavoidable [N,256]
    # feature input + ct_feat output, so the fusion saves little while the
    # serialized in-kernel recompute loses XLA's overlapped backward.
    # Ledger: BENCHMARKS.md "measured but rejected".
    color_fn = lambda cp, *a: F.rendering_apply(cp, cfg.rendering, *a,
                                                act_dtype=core_act)
    if bool(cfg.remat):
        color_fn = jax.checkpoint(color_fn)
    sampled_color = color_fn(params["color"], pts_flat, gradients, dirs_flat,
                             feature).reshape(B, T, 3)

    # ---- surface branch: first SDF sign change, RefColor at the two
    # bracketing samples, NeuS-weight blend (ref:renderer.py:280-343) -------
    sdf_bt = sdf.reshape(B, T)
    min_val, min_idx = SEC.first_crossing(sdf_bt)
    sdf_mask = (min_val < 0.0) & (min_idx >= 1) & inside_sphere_mask
    idx = jnp.clip(min_idx, 1, T - 1)[:, None]                   # [B,1]

    def gather2(x_bt):  # [B,T,C] -> low/high [B,C]
        lo = jnp.take_along_axis(x_bt, (idx - 1)[..., None], axis=1)[:, 0]
        hi = jnp.take_along_axis(x_bt, idx[..., None], axis=1)[:, 0]
        return lo, hi

    pts_bt = pts
    grads_bt = gradients.reshape(B, T, 3)
    feat_bt = feature.reshape(B, T, -1)
    p_lo, p_hi = gather2(pts_bt)
    n_lo, n_hi = gather2(grads_bt)
    f_lo, f_hi = gather2(feat_bt)

    ref_in_pts = jnp.concatenate([p_lo, p_hi], 0)
    ref_in_n = jnp.concatenate([n_lo, n_hi], 0)
    # every sample along a ray shares the ray's direction, so gathering
    # lo/hi from the broadcast `dirs` is the identity — skip both gathers
    # (the reference gathers because it operates on a masked subset,
    # ref:renderer.py:300-307)
    ref_in_d = jnp.concatenate([rays_d, rays_d], 0)
    ref_in_f = jnp.concatenate([f_lo, f_hi], 0)
    ref = F.refcolor_apply(params["ref_color"], cfg.refcolor,
                           ref_in_pts, ref_in_f, ref_in_d, ref_in_n)

    alpha_inside = alpha * inside_sphere
    weights_inside = S.alpha_to_weights(alpha_inside)
    w_lo = jnp.take_along_axis(weights_inside, idx - 1, axis=1) + 1e-5
    w_hi = jnp.take_along_axis(weights_inside, idx, axis=1) + 1e-5
    w_sum = w_lo + w_hi

    def blend(v):  # [2B, 3] stacked low|high -> [B,3]
        v_lo, v_hi = v[:B], v[B:]
        return (v_lo * w_lo + v_hi * w_hi) / w_sum

    m = sdf_mask[:, None]
    surface_color = jnp.where(m, blend(ref["rgb"]), 1.0)
    specular_color = jnp.where(m, blend(ref["specular_rgb"]), 1.0)
    diffuse_color = jnp.where(m, blend(ref["diffuse_rgb"]), 1.0)

    # ---- background compositing (ref:renderer.py:350-356) ------------------
    if background_alpha is not None:
        alpha = (alpha * inside_sphere
                 + background_alpha[:, :T] * (1.0 - inside_sphere))
        alpha = jnp.concatenate([alpha, background_alpha[:, T:]], -1)
        sampled_color = (sampled_color * inside_sphere[:, :, None]
                         + background_sampled_color[:, :T]
                         * (1.0 - inside_sphere)[:, :, None])
        sampled_color = jnp.concatenate(
            [sampled_color, background_sampled_color[:, T:]], 1)

    weights = S.alpha_to_weights(alpha)
    weights_sum = jnp.sum(weights, -1, keepdims=True)
    color = jnp.sum(sampled_color * weights[:, :, None], axis=1)
    if background_rgb is not None:
        color = color + background_rgb * (1.0 - weights_sum)

    eik_sq = (jnp.linalg.norm(grads_bt, axis=-1) - 1.0) ** 2
    eik_num = jnp.sum(relax_inside * eik_sq)
    eik_den = jnp.sum(relax_inside)
    gradient_error = eik_num / (eik_den + 1e-5)

    return {
        "color": color,
        "surface_color": surface_color,
        "sdf_mask": sdf_mask,
        "sdf": sdf,
        "dists": dists,
        "gradients": grads_bt,
        "s_val": 1.0 / inv_s,
        "mid_z_vals": mid_z,
        "weights": weights,
        "cdf": prev_cdf.reshape(B, T),
        "gradient_error": gradient_error,
        "_eik_num": eik_num,
        "_eik_den": eik_den,
        "inside_sphere": inside_sphere,
        "specular_color": specular_color,
        "diffuse_color": diffuse_color,
    }


def render(params, cfg: RendererConfig, rays_o, rays_d, near, far,
           key: Optional[jax.Array] = None, background_rgb=None,
           cos_anneal_ratio: float = 0.0,
           perturb_overwrite: float = -1.0) -> Dict[str, Any]:
    """Stage-1 renderer. ref:renderer.py:391-500."""
    B = rays_o.shape[0]
    sample_dist = 2.0 / cfg.n_samples
    z_lin = jnp.linspace(0.0, 1.0, cfg.n_samples)
    z_vals = near + (far - near) * z_lin[None, :]                # [B, n]

    perturb = cfg.perturb if perturb_overwrite < 0 else perturb_overwrite
    z_vals_outside = None
    if cfg.n_outside > 0:
        z_out = jnp.linspace(1e-3, 1.0 - 1.0 / (cfg.n_outside + 1.0),
                             cfg.n_outside)
        z_vals_outside = jnp.broadcast_to(z_out, (B, cfg.n_outside))

    if perturb > 0 and key is not None:
        k1, k2 = jax.random.split(key)
        t_rand = jax.random.uniform(k1, (B, 1)) - 0.5
        z_vals = z_vals + t_rand * 2.0 / cfg.n_samples
        if cfg.n_outside > 0:
            mids = 0.5 * (z_out[1:] + z_out[:-1])
            upper = jnp.concatenate([mids, z_out[-1:]])
            lower = jnp.concatenate([z_out[:1], mids])
            t_rand = jax.random.uniform(k2, (B, cfg.n_outside))
            z_vals_outside = lower[None] + (upper - lower)[None] * t_rand

    if cfg.n_outside > 0:
        z_vals_outside = (far / jnp.flip(z_vals_outside, axis=-1)
                          + 1.0 / cfg.n_samples)

    if cfg.n_importance > 0:
        z_vals = S.hierarchical_z_vals(
            _sdf_fwd_sampling(params, cfg), rays_o, rays_d, z_vals,
            cfg.n_importance, cfg.up_sample_steps)

    background_alpha = None
    background_sampled_color = None
    if cfg.n_outside > 0:
        z_feed = jnp.sort(jnp.concatenate([z_vals, z_vals_outside], -1), -1)
        ret_out = render_core_outside(params, cfg, rays_o, rays_d, z_feed,
                                      sample_dist)
        background_sampled_color = ret_out["sampled_color"]
        background_alpha = ret_out["alpha"]

    ret = render_core(params, cfg, rays_o, rays_d, z_vals, sample_dist,
                      background_alpha=background_alpha,
                      background_sampled_color=background_sampled_color,
                      background_rgb=background_rgb,
                      cos_anneal_ratio=cos_anneal_ratio)

    n_total = cfg.n_total
    weights = ret["weights"]
    return {
        "color_fine": ret["color"],
        "surface_color": ret["surface_color"],
        "sdf_mask": ret["sdf_mask"],
        "s_val": jnp.mean(jnp.broadcast_to(ret["s_val"], (B, 1)), -1,
                          keepdims=True),
        "cdf_fine": ret["cdf"],
        "weight_sum": jnp.sum(weights, -1, keepdims=True),
        "weight_max": jnp.max(weights, -1, keepdims=True),
        "gradients": ret["gradients"],
        "weights": weights,
        "gradient_error": ret["gradient_error"],
        "_eik_num": ret["_eik_num"],
        "_eik_den": ret["_eik_den"],
        "inside_sphere": ret["inside_sphere"],
        "specular_color": ret["specular_color"],
        "diffuse_color": ret["diffuse_color"],
    }


# ---------------------------------------------------------------------------
# Stages 2 / 3 shared ray setup
# ---------------------------------------------------------------------------

def _stage23_util(params, cfg: RendererConfig, rays_o, rays_d, near, far):
    """Uniform + importance sampling and SDF sweep (no perturb).
    ref:renderer.py:503-564."""
    B = rays_o.shape[0]
    sample_dist = 2.0 / cfg.n_samples
    z_lin = jnp.linspace(0.0, 1.0, cfg.n_samples)
    z_vals = near + (far - near) * z_lin[None, :]
    if cfg.n_importance > 0:
        z_vals = S.hierarchical_z_vals(
            _sdf_fwd_sampling(params, cfg), rays_o, rays_d, z_vals,
            cfg.n_importance, cfg.up_sample_steps)
    T = z_vals.shape[1]
    dists = jnp.concatenate(
        [z_vals[..., 1:] - z_vals[..., :-1],
         jnp.full((B, 1), sample_dist, z_vals.dtype)], -1)
    mid_z = z_vals + dists * 0.5
    pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., :, None]
    # value-only narrowed sweep: this sdf only drives surface localization
    # (pts_surf is stop_gradient'd by both stage-2/3 callers)
    sdf = F.sdf_value_sweep(params["sdf"], cfg.sdf,
                            pts.reshape(-1, 3)).reshape(B, T)
    inside = (jnp.linalg.norm(pts, axis=-1) < 1.0)
    inside_mask = jnp.sum(inside, axis=-1) > 0.0
    return mid_z, sdf, inside_mask


def lvis_render(params, cfg: RendererConfig, rays_o, rays_d, near, far,
                key: jax.Array) -> Dict[str, Any]:
    """Stage-2: surface localization + secondary-ray distillation targets.
    Unhit rays carry the reference's `ones` fill. ref:renderer.py:567-627."""
    B = rays_o.shape[0]
    mid_z, sdf, inside_mask = _stage23_util(params, cfg, rays_o, rays_d,
                                            near, far)
    pts_surf, _, sdf_mask = SEC.surface_localize(mid_z, sdf, rays_o, rays_d,
                                                 inside_mask)
    # stages 2/3 freeze the geometry: cut the (double-)backprop through the
    # SDF here so jax.grad does not traverse it just for optax to zero it
    pts_surf = jax.lax.stop_gradient(pts_surf)
    n_surf = jax.lax.stop_gradient(
        F.sdf_gradient(params["sdf"], cfg.sdf, pts_surf))

    inv_s = jnp.clip(F.variance_inv_s(params["variance"]), 1e-6, 1e6)
    res = SEC.cal_indi_lgt(
        key, pts_surf, n_surf,
        _sdf_fwd_sampling(params, cfg), _sdf_full(params, cfg),
        _sdf_grad(params, cfg),
        inv_s, _color_fn(params, cfg),
        lambda p, d: F.lvis_apply(params["lvis"], cfg.lvis, p, d),
        lambda p: F.indirect_light_apply(params["indirect"], cfg.indirect, p),
        chunk=cfg.secondary_chunk,
        sdf_fwd_coarse=_sdf_fwd_sampling(params, cfg, bf16_act=True),
        sdf_vgf=(_sdf_vgf(params, cfg) if cfg.fused_fine_sweep else None))
    # NOTE: a fused (sdf+grad) Pallas forward for the weight sweep measured
    # SLOWER (15.6k vs 16.8k rays/s) and was removed; the XLA vjp-shared
    # fine sweep (fused_fine_sweep) replaced it; ledger: BENCHMARKS.md.

    m1 = sdf_mask[:, None]
    m2 = sdf_mask[:, None, None]
    return {
        "gt_lvis": jnp.where(m1, res["gt_lvis"], 1.0),
        "pre_lvis": jnp.where(m1, res["pre_lvis"], 1.0),
        "gt_trace_radiance": jnp.where(m2, res["gt_trace_radiance"], 1.0),
        "pre_trace_radiance": jnp.where(m2, res["pre_trace_radiance"], 1.0),
        "sdf_mask": sdf_mask,
    }


def mate_illu_render(params, cfg: RendererConfig, rays_o, rays_d, near, far,
                     key: jax.Array) -> Dict[str, Any]:
    """Stage-3: frozen geometry + RefColor supervision + SG PBR forward.
    ref:renderer.py:630-726."""
    B = rays_o.shape[0]
    mid_z, sdf, inside_mask = _stage23_util(params, cfg, rays_o, rays_d,
                                            near, far)
    pts_surf, _, sdf_mask = SEC.surface_localize(mid_z, sdf, rays_o, rays_d,
                                                 inside_mask)
    # frozen geometry + frozen RefColor supervision: stop gradients at the
    # stage boundary (the reference leaves requires_grad on and discards the
    # grads; we skip computing them)
    pts_surf = jax.lax.stop_gradient(pts_surf)
    n_surf = jax.lax.stop_gradient(
        F.sdf_gradient(params["sdf"], cfg.sdf, pts_surf))
    f_surf = jax.lax.stop_gradient(
        F.sdf_apply(params["sdf"], cfg.sdf, pts_surf)[:, 1:])

    from ..ops import math as U
    ref = jax.tree_util.tree_map(
        jax.lax.stop_gradient,
        F.refcolor_apply(params["ref_color"], cfg.refcolor, pts_surf,
                         f_surf, rays_d, n_surf))
    diffuse_srgb = ref["diffuse_rgb"]
    specular_srgb = ref["specular_rgb"]
    diffuse_linear = U.srgb_to_linear(diffuse_srgb)
    specular_linear = U.srgb_to_linear(specular_srgb)

    indi = F.indirect_light_apply(params["indirect"], cfg.indirect, pts_surf)
    out = envmap_material_apply(
        params["material"], cfg.material, key, pts_surf, rays_d, n_surf,
        specular_linear, indi, params["lvis"], cfg.lvis,
        hit_mask=sdf_mask)

    m = sdf_mask[:, None]
    def mask1(x):
        return jnp.where(m, x, 1.0)

    return {
        "rgb": mask1(out["rgb"]),
        "env_rgb": mask1(out["env_rgb"]),
        "indir_rgb": mask1(out["indir_rgb"]),
        "diffuse_albedo": mask1(out["diffuse_albedo"]),
        "specular_albedo": mask1(out["specular_albedo"]),
        "diffuse_rgb": mask1(out["diffuse_rgb"]),
        "specular_rgb": mask1(out["specular_rgb"]),
        "roughness": mask1(out["roughness"]),
        "lvis_mean": mask1(out["lvis_mean"]),
        "sdf_mask": sdf_mask,
        "diffuse_loss": out["diffuse_loss"],
        "specular_loss": out["specular_loss"],
        "encoder_loss": out["encoder_loss"],
        "smooth_loss": out["smooth_loss"],
        "gt_specular_linear": mask1(specular_linear),
        "gt_diffuse_srgb": mask1(diffuse_srgb),
        "n_out": jnp.where(m, n_surf, 1.0),
    }
