"""Stage-3 material + direct illumination model: spherical-Gaussian PBR.

Behavior parity: ref:models/inverRender.py:128-625
  get_diffuse_visibility / get_specular_visibility (MC queries of the frozen
  Lvis MLP), render_with_sg (GGX NDF as warped SG, Fresnel + Smith G,
  visibility-weighted light SGs), render_with_all_sg (direct + indirect), and
  EnvmapMaterialNetwork (learnable 128-SG envmap + BRDF auto-encoder +
  specular-albedo head).

TPU-first notes:
  * the reference's 100k-point python chunk loops (ref:inverRender.py:173-179,
    241-243) become one static-shaped batched evaluation; callers bound peak
    memory by choosing the number of visibility samples, not by host loops.
  * randomness is threaded through explicit jax.random keys.
  * tonemapping mode is a config value instead of a module-level global
    (ref:inverRender.py:13-18).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import math as U
from ..ops import mlp as M
from ..ops import sg as SG
from ..ops.embedder import positional_encoding
from . import fields as F
from .fields import LvisConfig, lvis_apply

TINY = 1e-6


def _tonemap(x, mode: str):
    return U.linear_to_srgb(x) if mode == "srgb" else x


# ---------------------------------------------------------------------------
# Monte-Carlo visibility queries against the frozen Lvis field
# ---------------------------------------------------------------------------

def get_diffuse_visibility(key, points, normals, lvis_params,
                           lvis_cfg: LvisConfig, lgt_sg_lobes, lgt_sg_lambdas,
                           nsamp: int = 8, act_dtype=None) -> jnp.ndarray:
    """SG-weighted mean visibility per (lobe, point): returns [M, P].
    ref:models/inverRender.py:128-192."""
    n_lobe = lgt_sg_lobes.shape[0]
    n_points = points.shape[0]
    light_dirs = jax.lax.stop_gradient(lgt_sg_lobes)[:, None, :]   # [M,1,3]
    lambdas = jax.lax.stop_gradient(lgt_sg_lambdas)[:, None, :]    # [M,1,1]

    sharpness = lambdas[:, :, 0]                                    # [M,1]
    sg_min = jnp.min(sharpness)
    r_phi_range = jnp.arccos(jnp.clip((-1.95 * sg_min) / sharpness + 1.0,
                                      -1.0, 1.0))                   # [M,1]
    k1, k2 = jax.random.split(key)
    r_theta = jax.random.uniform(k1, (n_lobe, nsamp)) * 2.0 * np.pi
    r_phi = jax.random.uniform(k2, (n_lobe, nsamp)) * r_phi_range

    sample_dir = SG.sample_dirs(light_dirs, r_theta, r_phi, x_ref_axis=2)
    sample_dir_flat = sample_dir.reshape(-1, 3)                     # [M*S,3]

    # factorized outer evaluation: every direction is shared by all points,
    # so PE + first layer run on the [M*S] and [P] factors instead of the
    # 2.1M-row product (see fields.lvis_apply_outer); the cosine mask is an
    # outer product too — no [P, M*S, 3] broadcasts materialize, and the
    # result lands directly in the [M,S,P] layout (no transpose)
    pred = F.lvis_apply_outer(lvis_params, lvis_cfg, points,
                              sample_dir_flat,
                              act_dtype=act_dtype)                  # [M*S,P]
    cos_term = jnp.dot(sample_dir_flat, normals.T) > TINY           # [M*S,P]
    vis = jnp.where(cos_term, pred, 0.0)
    vis = vis.reshape(n_lobe, nsamp, n_points)                      # [M,S,P]

    weight = jnp.exp(lambdas * (jnp.sum(sample_dir * light_dirs, -1,
                                        keepdims=True) - 1.0))      # [M,S,1]
    vis = jnp.sum(vis * weight, axis=1) / (jnp.sum(weight, axis=1) + TINY)
    return jax.lax.stop_gradient(vis)                               # [M,P]


def get_specular_visibility(key, points, normals, viewdirs, lvis_params,
                            lvis_cfg: LvisConfig, sg_lobes, sg_lambdas,
                            nsamp: int = 24) -> jnp.ndarray:
    """Per-point BRDF-lobe visibility [P]. ref:models/inverRender.py:195-261.
    (Kept for parity; the active stage-3 path uses diffuse visibility only,
    ref:inverRender.py:393-402.)"""
    n_points = points.shape[0]
    light_dirs = sg_lobes[:, None, :]                               # [P,1,3]
    lambdas = sg_lambdas[:, None, :]                                # [P,1,1]

    n_dot_v = jnp.maximum(U.dot(normals, viewdirs), 0.0)
    ref_dir = (-viewdirs + 2.0 * n_dot_v * normals)[:, None, :]     # [P,1,3]

    sharpness = jnp.clip(lambdas[:, :, 0], 0.1, 50.0)               # [P,1]
    sg_min = jnp.min(sharpness)
    r_phi_range = jnp.arccos(jnp.clip((-1.90 * sg_min) / sharpness + 1.0,
                                      -1.0, 1.0))
    k1, k2 = jax.random.split(key)
    r_theta = jax.random.uniform(k1, (n_points, nsamp)) * 2.0 * np.pi
    r_phi = jax.random.uniform(k2, (n_points, nsamp)) * r_phi_range

    sample_dir = SG.sample_dirs(ref_dir, r_theta, r_phi, x_ref_axis=2)  # [P,S,3]

    input_p = jnp.broadcast_to(points[:, None], (n_points, nsamp, 3))
    nrm = jnp.broadcast_to(normals[:, None], (n_points, nsamp, 3))
    cos_term = jnp.sum(nrm * sample_dir, axis=-1) > TINY
    pred = lvis_apply(lvis_params, lvis_cfg, input_p.reshape(-1, 3),
                      sample_dir.reshape(-1, 3)).reshape(n_points, nsamp)
    vis = jnp.where(cos_term, pred, 0.0)

    # log-weight is <= 0 by construction (cos <= 1), so it never overflows;
    # compute the degenerate-row fix there. The reference's inf-reset
    # (ref:inverRender.py:251-257) effectively keeps only the saturating
    # sample(s); we realize that as a one-hot at the best-aligned sample,
    # which also covers full underflow (all weights -> 0), where the
    # reference silently returns vis=0.
    logw = sharpness * (jnp.sum(sample_dir * light_dirs, -1) - 1.0)  # [P,S]
    weight = jnp.exp(logw)
    wsum = jnp.sum(weight, axis=-1)
    degenerate = ~jnp.isfinite(wsum) | (wsum <= TINY)
    onehot = jax.nn.one_hot(jnp.argmax(logw, axis=-1), logw.shape[-1],
                            dtype=weight.dtype)
    weight = jnp.where(degenerate[:, None], onehot, weight)
    vis = jnp.sum(vis * weight, axis=-1) / (jnp.sum(weight, axis=-1) + TINY)
    return jax.lax.stop_gradient(vis)


# ---------------------------------------------------------------------------
# SG rendering equation
# ---------------------------------------------------------------------------

def render_with_sg(points, normal, viewdirs, lgt_sgs, specular_reflectance,
                   specular_albedo, roughness, diffuse_albedo,
                   comp_vis: bool = True, lvis_params=None,
                   lvis_cfg: Optional[LvisConfig] = None, key=None,
                   vis_nsamp: int = 32, tonemap: str = "srgb",
                   vis_act_dtype=None) -> Dict[str, jnp.ndarray]:
    """SG PBR for one light mixture. lgt_sgs [P, M, 7] (per-point mixtures;
    broadcast the global envmap before calling). ref:models/inverRender.py:314-449."""
    P = normal.shape[0]
    Mn = lgt_sgs.shape[1]

    lobes = lgt_sgs[..., :3] / (jnp.linalg.norm(lgt_sgs[..., :3], axis=-1,
                                                keepdims=True) + TINY)
    lambdas = jnp.abs(lgt_sgs[..., 3:4])
    origin_mus = jnp.abs(lgt_sgs[..., -3:])

    normal_e = jnp.broadcast_to(normal[:, None, :], (P, Mn, 3))
    viewdirs_e = jax.lax.stop_gradient(
        jnp.broadcast_to(viewdirs[:, None, :], (P, Mn, 3)))

    # GGX NDF as an SG, then spherically warped about the view direction
    brdf_lobes = normal_e
    inv_r4 = 2.0 / (roughness ** 4)                                  # [P,1]
    brdf_lambdas = jnp.broadcast_to(inv_r4[:, None, :], (P, Mn, 1))
    mu_val = jnp.broadcast_to(inv_r4 / np.pi, (P, 3))
    brdf_mus = jnp.broadcast_to(mu_val[:, None, :], (P, Mn, 3))

    v_dot_lobe = jnp.maximum(jnp.sum(brdf_lobes * viewdirs_e, -1, keepdims=True), 0.0)
    warp_lobes = 2.0 * v_dot_lobe * brdf_lobes - viewdirs_e
    warp_lobes = warp_lobes / (jnp.linalg.norm(warp_lobes, axis=-1,
                                               keepdims=True) + TINY)
    warp_lambdas = brdf_lambdas / (4.0 * v_dot_lobe + TINY)

    new_half = warp_lobes + viewdirs_e
    new_half = new_half / (jnp.linalg.norm(new_half, axis=-1, keepdims=True) + TINY)
    v_dot_h = jnp.maximum(jnp.sum(viewdirs_e * new_half, -1, keepdims=True), 0.0)

    spec_refl = jnp.broadcast_to(specular_reflectance[:, None, :], (P, Mn, 3))
    fresnel = spec_refl + (1.0 - spec_refl) * jnp.power(
        2.0, -(5.55473 * v_dot_h + 6.8316) * v_dot_h)

    dot1 = jnp.maximum(jnp.sum(warp_lobes * normal_e, -1, keepdims=True), 0.0)
    dot2 = jnp.maximum(jnp.sum(viewdirs_e * normal_e, -1, keepdims=True), 0.0)
    k_g = ((roughness + 1.0) ** 2 / 8.0)[:, None, :]
    g1 = dot1 / (dot1 * (1.0 - k_g) + k_g + TINY)
    g2 = dot2 / (dot2 * (1.0 - k_g) + k_g + TINY)
    moi = fresnel * g1 * g2 / (4.0 * dot1 * dot2 + TINY)
    warp_mus = specular_albedo[:, None, :] * brdf_mus * moi

    vis_shadow = jnp.zeros((P, 3))
    if comp_vis:
        light_vis = get_diffuse_visibility(
            key, points, normal_e[:, 0, :], lvis_params, lvis_cfg,
            lobes[0], lambdas[0], nsamp=vis_nsamp,
            act_dtype=vis_act_dtype)                                 # [M,P]
        light_vis = jnp.broadcast_to(light_vis.T[:, :, None], (P, Mn, 3))
        lgt_mus = origin_mus * light_vis
        vis_shadow = jnp.mean(light_vis, axis=1)
    else:
        lgt_mus = origin_mus

    final_lobes, final_lambdas, final_mus = SG.lambda_trick(
        lobes, lambdas, lgt_mus, warp_lobes, warp_lambdas, warp_mus)
    specular_linear = SG.integrate_rgb(normal_e, final_lobes, final_lambdas,
                                       final_mus)

    diffuse = jnp.broadcast_to((diffuse_albedo / np.pi)[:, None, :], (P, Mn, 3))
    diffuse_linear = SG.integrate_rgb(normal_e, lobes, lambdas, lgt_mus * diffuse)

    rgb = jnp.clip(specular_linear + diffuse_linear, 0.0, 1.0)
    return {
        "specular_loss": jnp.asarray(0.0),
        "diffuse_loss": jnp.asarray(0.0),
        "env_rgb": rgb,
        "diffuse_rgb": jnp.clip(_tonemap(diffuse_linear, tonemap), 0.0, 1.0),
        "specular_rgb": jnp.clip(_tonemap(specular_linear, tonemap), 0.0, 1.0),
        "lvis_mean": vis_shadow,
    }


def render_with_all_sg(points, normal, viewdirs, lgt_sgs, specular_reflectance,
                       specular_albedo, roughness, diffuse_albedo,
                       lvis_params=None, lvis_cfg=None, indir_lgt_sgs=None,
                       key=None, vis_nsamp: int = 32, tonemap: str = "srgb",
                       vis_act_dtype=None) -> Dict[str, jnp.ndarray]:
    """Direct (learned envmap, with visibility) + indirect (per-point SGs)
    light. ref:models/inverRender.py:286-311."""
    Mn = lgt_sgs.shape[0]
    P = normal.shape[0]
    lgt = jnp.broadcast_to(lgt_sgs[None], (P, Mn, 7))
    ret = render_with_sg(points, normal, viewdirs, lgt, specular_reflectance,
                         specular_albedo, roughness, diffuse_albedo,
                         comp_vis=True, lvis_params=lvis_params,
                         lvis_cfg=lvis_cfg, key=key, vis_nsamp=vis_nsamp,
                         tonemap=tonemap, vis_act_dtype=vis_act_dtype)
    indir_rgb = jnp.zeros_like(points)
    if indir_lgt_sgs is not None:
        indir_rgb = render_with_sg(
            points, normal, viewdirs, indir_lgt_sgs, specular_reflectance,
            specular_albedo, roughness, diffuse_albedo, comp_vis=False,
            tonemap=tonemap)["env_rgb"]

    env_rgb = ret["env_rgb"]
    ret.update({
        "rgb": jnp.clip(_tonemap(env_rgb + indir_rgb, tonemap), 0.0, 1.0),
        "indir_rgb": jnp.clip(_tonemap(indir_rgb, tonemap), 0.0, 1.0),
        "env_rgb": jnp.clip(_tonemap(env_rgb, tonemap), 0.0, 1.0),
    })
    return ret


# ---------------------------------------------------------------------------
# EnvmapMaterialNetwork
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class EnvmapMaterialConfig:
    num_lgt_sgs: int = 128
    specular_albedo: float = 0.02        # fresnel F0 constant
    latent_dim: int = 32
    multires_pts: int = 10
    multires_view: int = 4
    kl_rho: float = 0.05
    kl_weight: float = 0.01
    tonemap: str = "srgb"                # 'srgb' for dtu, 'none' for synthetic
    vis_nsamp: int = 32
    # bf16 activations for the stop-gradient MC visibility sweeps — MEASURED
    # SLOWER on the stage-3 step (16.5k vs ~20k rays/s at batch 512: the
    # casts break XLA's PE+GEMM fusion on these wide-but-shallow queries);
    # kept as an ablation knob, default off (BENCHMARKS.md ledger)
    vis_act_bf16: bool = False

    @property
    def d_pts_enc(self) -> int:
        return 3 * (1 + 2 * self.multires_pts)

    @property
    def d_view_enc(self) -> int:
        return 3 * (1 + 2 * self.multires_view)


def envmap_material_init(key, cfg: EnvmapMaterialConfig = EnvmapMaterialConfig()):
    """ref:models/inverRender.py:451-528 (incl. the SG parameter init:
    white amplitudes, lambda >= 10, energy normalization, fibonacci lobes
    duplicated x2)."""
    k = jax.random.split(key, 4)
    sgs = jax.random.normal(k[0], (cfg.num_lgt_sgs, 7))
    sgs = sgs.at[:, -2:].set(jnp.broadcast_to(sgs[:, -3:-2], (cfg.num_lgt_sgs, 2)))
    sgs = sgs.at[:, 3:4].set(10.0 + jnp.abs(sgs[:, 3:4] * 20.0))
    energy = SG.compute_energy(sgs)
    sgs = sgs.at[:, 4:].set(jnp.abs(sgs[:, 4:])
                            / jnp.sum(energy, axis=0, keepdims=True)
                            * 2.0 * np.pi * 0.8)
    lobes = jnp.asarray(SG.fibonacci_sphere(cfg.num_lgt_sgs // 2),
                        dtype=jnp.float32)
    sgs = sgs.at[:cfg.num_lgt_sgs // 2, :3].set(lobes)
    sgs = sgs.at[cfg.num_lgt_sgs // 2:, :3].set(lobes)

    return {
        "lgtSGs": sgs,
        "brdf_encoder": M.mlp_init(k[1], [cfg.d_pts_enc, 512, 512, 512, 512,
                                          cfg.latent_dim]),
        "brdf_decoder": M.mlp_init(k[2], [cfg.latent_dim, 128, 128, 4]),
        "net_cs": M.mlp_init(k[3], [cfg.d_pts_enc + cfg.d_view_enc,
                                    256, 256, 256, 256, 1]),
    }


def _leaky_mlp(params, x, final_activation=None):
    n = len(params)
    for i, p in enumerate(params):
        x = M.dense_apply(p, x)
        if i < n - 1:
            x = M.leaky_relu(x, 0.2)
    if final_activation is not None:
        x = final_activation(x)
    return x


def kl_divergence(rho: float, raw_latent: jnp.ndarray,
                  mask=None) -> jnp.ndarray:
    """Sparsity KL on the mean sigmoid activation. ref:inverRender.py:609-612.

    `mask` [N] restricts the mean to surface-hit rays (the reference only
    ever evaluates the encoder on pts_surf[sdf_mask]); a zero-hit batch
    yields 0, matching the reference's skip (ref:mateIllu.py:161).
    """
    act = jax.nn.sigmoid(raw_latent)
    if mask is None:
        rho_hat = jnp.mean(act, axis=0)
        n_hit = jnp.asarray(1.0)
    else:
        m = mask.astype(act.dtype)[:, None]
        n_hit = jnp.sum(m)
        rho_hat = jnp.sum(act * m, axis=0) / jnp.maximum(n_hit, 1.0)
    # a saturated latent (sigmoid -> exactly 0/1 in f32) would log(0) -> inf
    rho_hat = jnp.clip(rho_hat, 1e-6, 1.0 - 1e-6)
    kl = jnp.mean(rho * jnp.log(rho / rho_hat)
                  + (1.0 - rho) * jnp.log((1.0 - rho) / (1.0 - rho_hat)))
    return jnp.where(n_hit > 0, kl, 0.0)


def envmap_material_apply(params, cfg: EnvmapMaterialConfig, key,
                          points, ray_dirs, n, gt_specular_linear,
                          indi_lgt_sgs, lvis_params, lvis_cfg: LvisConfig,
                          hit_mask=None) -> Dict[str, jnp.ndarray]:
    """Full stage-3 forward. ref:models/inverRender.py:530-598."""
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + TINY)
    ray_dirs = ray_dirs / (jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True) + TINY)
    view_dirs = -ray_dirs
    ref_dirs = U.reflect(view_dirs, n)

    pts_enc = positional_encoding(points, cfg.multires_pts)
    ref_enc = positional_encoding(ref_dirs, cfg.multires_view)

    raw_latent = _leaky_mlp(params["brdf_encoder"], pts_enc)
    brdf_lc = jax.nn.sigmoid(raw_latent)
    brdf = jax.nn.sigmoid(_leaky_mlp(params["brdf_decoder"], brdf_lc))
    roughness = brdf[..., 3:] * 0.9 + 0.09
    diffuse_albedo = brdf[..., :3]

    encoder_loss = cfg.kl_weight * kl_divergence(cfg.kl_rho, raw_latent,
                                                 mask=hit_mask)

    specular_albedo = _leaky_mlp(
        params["net_cs"], jnp.concatenate([pts_enc, ref_enc], -1),
        final_activation=jax.nn.sigmoid)
    specular_albedo = jnp.repeat(specular_albedo, 3, axis=-1)

    spec_refl = jnp.full((points.shape[0], 1), cfg.specular_albedo)
    spec_refl = jnp.broadcast_to(spec_refl, (points.shape[0], 3))

    ret = render_with_all_sg(points, n, view_dirs, params["lgtSGs"], spec_refl,
                             specular_albedo, roughness, diffuse_albedo,
                             lvis_params=lvis_params, lvis_cfg=lvis_cfg,
                             indir_lgt_sgs=indi_lgt_sgs, key=key,
                             vis_nsamp=cfg.vis_nsamp, tonemap=cfg.tonemap,
                             vis_act_dtype=(jnp.bfloat16 if cfg.vis_act_bf16
                                            else None))
    ret.update({
        "roughness": roughness,
        "diffuse_albedo": jnp.clip(_tonemap(diffuse_albedo, cfg.tonemap), 0., 1.),
        "specular_albedo": jnp.clip(_tonemap(specular_albedo, cfg.tonemap), 0., 1.),
        "encoder_loss": encoder_loss,
        "smooth_loss": jnp.asarray(0.0),
    })
    return ret


def get_light(params, H: int = 256, W: int = 512) -> jnp.ndarray:
    """Rasterize the learned envmap. ref:models/inverRender.py:600-607."""
    return SG.compute_envmap(params["lgtSGs"], H, W)
