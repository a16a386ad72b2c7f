"""Stage-3 (materials + direct illumination) train step.

Trains only the EnvmapMaterial network with rgb-L1 + KL encoder loss against
frozen stages 1-2 (ref:mateIllu.py:91,135-203).
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
from . import losses as L
from .common import TrainConfig, make_optimizer, multi_step_wrapper


def make_train_step(cfg: R.RendererConfig, tcfg: TrainConfig,
                    mesh: Optional[Mesh] = None,
                    convention: str = "c2w", mask_ones: bool = False,
                    roi_prob: float = 0.0, k_steps: int = 1):
    """k_steps > 1: one lax.scan of k optimizer steps per device program
    (see stage1.make_train_step / common.multi_step_wrapper — same
    signature change and exact-trajectory semantics)."""
    tx = make_optimizer(tcfg, stage=3)
    n_dev = 1 if mesh is None else mesh.devices.size
    local_batch = tcfg.batch_size // n_dev
    assert local_batch * n_dev == tcfg.batch_size, \
        f"batch {tcfg.batch_size} not divisible by {n_dev} devices"

    def loss_fn(params, data, img_idx, key, step):
        key = SH.device_key(key, mesh)
        k_rays, k_render = jax.random.split(key)
        rays_o, rays_d, color, mask = RAYS.gen_random_rays(
            k_rays, data["images"], data["masks"], data["intr_inv"],
            data["poses"], img_idx, local_batch,
            convention=convention, mask_ones=mask_ones,
            roi_boxes=data.get("roi_boxes"), roi_prob=roi_prob)
        near, far = RAYS.near_far_from_sphere(rays_o, rays_d)
        if tcfg.mask_weight > 0.0:
            mask = (mask > 0.5).astype(jnp.float32)
        else:
            mask = jnp.ones_like(mask)
        out = R.mate_illu_render(params, cfg, rays_o, rays_d, near, far,
                                 k_render)
        return L.stage3_losses(out, color, mask, lambda x: SH.psum(x, mesh))

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
        return tx.init, jax.jit(step_fn, donate_argnums=(0, 1))
    sharded = jax.shard_map(step_fn, mesh=mesh,
                            in_specs=(P(),) * 6, out_specs=(P(),) * 3,
                            check_vma=False)
    return tx.init, jax.jit(sharded, donate_argnums=(0, 1))


def make_render_fn(cfg: R.RendererConfig, mesh: Optional[Mesh] = None):
    def render_chunk(params, rays_o, rays_d, near, far, key):
        return R.mate_illu_render(params, cfg, rays_o, rays_d, near, far, key)

    if mesh is None:
        return jax.jit(render_chunk)
    # per-ray maps shard over rays; the four scalar diagnostic losses are
    # dropped (validation panels never read them)
    scalar_keys = ("diffuse_loss", "specular_loss", "encoder_loss",
                   "smooth_loss")

    def local(params, rays_o, rays_d, near, far, key):
        out = render_chunk(params, rays_o, rays_d, near, far,
                           SH.device_key(key, mesh))
        return {k: v for k, v in out.items() if k not in scalar_keys}
    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(SH.AXIS), P(SH.AXIS), P(SH.AXIS), P(SH.AXIS), P()),
        out_specs=P(SH.AXIS), check_vma=False)
    return jax.jit(sharded)
