"""Stage-1 (geometry + radiance) jitted train step, single-chip or sharded.

One compiled program per step does: device-side ray generation -> NeuS render
(hierarchical sampling + fused core) -> 4-term loss -> Adam update with the
warmup/cosine schedule.  The host only supplies the image index and a PRNG
key — there is no per-step host->device tensor traffic (the reference pays a
CPU gather + .cuda() copy every step, ref:models/dataset.py:133-151).

Sharded mode: ray batch split across the 'dp' mesh axis; loss normalizers
and gradients are globally reduced with psum inside the differentiated
function, so every chip applies an identical update to its replicated
parameters (see parallel.sharding).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..data import rays as RAYS
from ..models import renderer as R
from ..parallel import sharding as SH
from ..utils import schedule
from . import losses as L
from .common import TrainConfig, make_optimizer, multi_step_wrapper


def make_train_step(cfg: R.RendererConfig, tcfg: TrainConfig,
                    mesh: Optional[Mesh] = None,
                    convention: str = "c2w", mask_ones: bool = False,
                    roi_prob: float = 0.0, k_steps: int = 1):
    """Returns (init_opt_state, step_fn) where
    step_fn(params, opt_state, data, img_idx, key, step) ->
        (params, opt_state, metrics).

    data: dict(images, masks, intr_inv, poses [+ convention flags]) resident
    on device.

    k_steps > 1 compiles a MULTI-STEP program: one lax.scan over k_steps
    optimizer steps per device launch, amortizing the fixed per-program
    dispatch cost the device profile shows (~1.3 ms/step wall-vs-device gap
    on the tunneled v5e, BENCHMARKS.md round-3 profile).  The signature
    changes to step_fn(params, opt_state, data, img_idxs [k_steps], key,
    step0) and metrics leaves gain a leading [k_steps] axis (all per-step
    values still observable).  Sub-step i uses fold_in(key, step0 + i) on
    the UNFOLDED base key and step = step0 + i, so a K-step block follows
    the exact same parameter trajectory as K single steps whose caller
    folds the base key by absolute step (pinned by
    tests/test_train.py::test_multi_step_matches_singles); the optimizer's
    schedule advances per sub-step identically.
    """
    tx = make_optimizer(tcfg, stage=1)
    n_dev = 1 if mesh is None else mesh.devices.size
    local_batch = tcfg.batch_size // n_dev
    assert local_batch * n_dev == tcfg.batch_size, \
        f"batch {tcfg.batch_size} not divisible by {n_dev} devices"
    if cfg.remat is None:       # auto: remat only when memory needs it
        import dataclasses
        cfg = dataclasses.replace(cfg, remat=local_batch > 2048)

    def loss_fn(params, data, img_idx, key, step):
        key = SH.device_key(key, mesh)
        k_rays, k_render = jax.random.split(key)
        rays_o, rays_d, color, mask = RAYS.gen_random_rays(
            k_rays, data["images"], data["masks"], data["intr_inv"],
            data["poses"], img_idx, local_batch,
            convention=convention, mask_ones=mask_ones,
            roi_boxes=data.get("roi_boxes"), roi_prob=roi_prob)
        near, far = RAYS.near_far_from_sphere(rays_o, rays_d)

        background_rgb = jnp.ones((1, 3)) if tcfg.use_white_bkgd else None
        if tcfg.mask_weight > 0.0:
            mask = (mask > 0.5).astype(jnp.float32)
        else:
            mask = jnp.ones_like(mask)

        anneal = schedule.cos_anneal_ratio(step, tcfg.anneal_end)
        out = R.render(params, cfg, rays_o, rays_d, near, far, key=k_render,
                       background_rgb=background_rgb,
                       cos_anneal_ratio=anneal)
        reduce = lambda x: SH.psum(x, mesh)
        loss, metrics = L.stage1_losses(out, color, mask, tcfg, reduce)
        metrics["s_val"] = jnp.mean(out["s_val"])
        mask_sum = reduce(jnp.sum(mask)) + 1e-5
        metrics["cdf"] = reduce(jnp.sum(out["cdf_fine"][:, :1] * mask)) / mask_sum
        metrics["weight_max"] = reduce(jnp.sum(out["weight_max"] * mask)) / mask_sum
        return loss, metrics

    def step_fn(params, opt_state, data, img_idx, key, step):
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            params, data, img_idx, key, step)
        if mesh is not None:
            # each chip's backward only carries its own shard's contribution
            # (psum transposes to a per-device broadcast); sum them so every
            # chip applies the identical global update
            grads = jax.lax.psum(grads, SH.AXIS)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    if k_steps > 1:
        step_fn = multi_step_wrapper(step_fn, k_steps)

    if mesh is None:
        jitted = jax.jit(step_fn, donate_argnums=(0, 1))
        return tx.init, jitted

    sharded = jax.shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    jitted = jax.jit(sharded, donate_argnums=(0, 1))
    return tx.init, jitted


def make_render_fn(cfg: R.RendererConfig, tcfg: TrainConfig,
                   mesh: Optional[Mesh] = None):
    """Jitted full renderer for validation images (chunked by the caller).

    mesh: optional device mesh — shards each chunk over the ray axis
    (rays are embarrassingly parallel; scalar diagnostics are dropped from
    the sharded output, validation only consumes per-ray maps)."""

    def render_chunk(params, rays_o, rays_d, near, far, step):
        anneal = schedule.cos_anneal_ratio(step, tcfg.anneal_end)
        background_rgb = jnp.ones((1, 3)) if tcfg.use_white_bkgd else None
        return R.render(params, cfg, rays_o, rays_d, near, far, key=None,
                        background_rgb=background_rgb,
                        cos_anneal_ratio=anneal, perturb_overwrite=0.0)

    if mesh is None:
        return jax.jit(render_chunk)

    scalar_keys = ("gradient_error", "_eik_num", "_eik_den")

    def per_ray_chunk(params, rays_o, rays_d, near, far, step):
        out = render_chunk(params, rays_o, rays_d, near, far, step)
        return {k: v for k, v in out.items() if k not in scalar_keys}

    sharded = jax.shard_map(
        per_ray_chunk, mesh=mesh,
        in_specs=(P(), P(SH.AXIS), P(SH.AXIS), P(SH.AXIS), P(SH.AXIS), P()),
        out_specs=P(SH.AXIS), check_vma=False)
    return jax.jit(sharded)
