"""Stage losses as psum-compatible numerator/denominator sums.

Each loss is computed from cross-shard-reduced partial sums so the sharded
and single-chip paths produce bit-identical global losses (the reduction
happens inside the differentiated function; psum is linear so gradients
match the reference's full-batch formulas).

Behavior parity:
  stage 1: color L1/mask_sum + surface-color L1/mask_sdf_sum + eikonal +
           BCE(weight_sum, mask)         ref:exp_runner.py:162-177
  stage 2: L1(lvis)/4*n_mask + L1(trace radiance)/12*n_mask
                                         ref:lvis.py:163-170
  stage 3: masked rgb L1/sdf_mask_sum + encoder KL
                                         ref:mateIllu.py:164-172
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from ..train.common import psnr_from_mse


def stage1_losses(out: Dict, true_rgb, mask, tcfg, reduce: Callable):
    """out: render() dict; mask [B,1] already binarized/ones.
    reduce: cross-shard sum (psum or identity)."""
    mask_sum = reduce(jnp.sum(mask)) + 1e-5

    color_err = (out["color_fine"] - true_rgb) * mask
    color_loss = reduce(jnp.sum(jnp.abs(color_err))) / mask_sum

    mse = reduce(jnp.sum((out["color_fine"] - true_rgb) ** 2 * mask)) \
        / (mask_sum * 3.0)
    psnr = psnr_from_mse(mse)

    sm = out["sdf_mask"][:, None].astype(mask.dtype)
    mask_sdf_sum = reduce(jnp.sum(mask * sm)) + 1e-5
    surf_err = tcfg.surface_weight * (out["surface_color"] - true_rgb) \
        * mask * sm
    surface_loss = reduce(jnp.sum(jnp.abs(surf_err))) / mask_sdf_sum

    # eikonal: out["gradient_error"] is already sum/relax_sum per shard;
    # recompose globally from its pieces for exact parity
    eik_num = reduce(out["_eik_num"])
    eik_den = reduce(out["_eik_den"]) + 1e-5
    eikonal_loss = eik_num / eik_den

    w = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
    bce = -(mask * jnp.log(w) + (1.0 - mask) * jnp.log(1.0 - w))
    n_total = reduce(jnp.asarray(mask.shape[0], jnp.float32))
    mask_loss = reduce(jnp.sum(bce)) / n_total

    loss = (color_loss + surface_loss + eikonal_loss * tcfg.igr_weight
            + mask_loss * tcfg.mask_weight)
    return loss, {
        "loss": loss, "color_loss": color_loss,
        "surface_loss": surface_loss, "eikonal_loss": eikonal_loss,
        "mask_loss": mask_loss, "psnr": psnr,
    }


def stage2_losses(out: Dict, reduce: Callable):
    sm = out["sdf_mask"].astype(jnp.float32)
    lvis_err = out["gt_lvis"] - out["pre_lvis"]
    # the reference sums |err| over ALL rays but normalizes by the masked
    # count x 4 (ref:lvis.py:164-165); unhit rays contribute zero error since
    # both sides carry the `ones` fill
    n_lvis = reduce(jnp.sum(sm)) * out["gt_lvis"].shape[1] + 1e-6
    lvis_loss = reduce(jnp.sum(jnp.abs(lvis_err))) / n_lvis

    tr_err = (out["gt_trace_radiance"] - out["pre_trace_radiance"]) \
        * sm[:, None, None]
    n_tr = reduce(jnp.sum(sm)) * out["gt_trace_radiance"].shape[1] * 3 + 1e-6
    trace_loss = reduce(jnp.sum(jnp.abs(tr_err))) / n_tr

    loss = lvis_loss + trace_loss
    return loss, {"loss": loss, "lvis_loss": lvis_loss,
                  "trace_radiance_loss": trace_loss,
                  "n_hit": reduce(jnp.sum(sm))}


def stage3_losses(out: Dict, true_rgb, mask, reduce: Callable):
    sm = out["sdf_mask"][:, None].astype(mask.dtype)
    sdf_mask_sum = reduce(jnp.sum(mask * sm)) + 1e-5
    rgb_err = (out["rgb"] - true_rgb) * mask * sm
    rgb_loss = reduce(jnp.sum(jnp.abs(rgb_err))) / sdf_mask_sum

    mse = reduce(jnp.sum((out["rgb"] - true_rgb) ** 2 * mask * sm)) \
        / (sdf_mask_sum * 3.0)
    psnr = psnr_from_mse(mse)

    # KL encoder loss is a full-batch mean of per-latent stats; average the
    # per-shard values (equal shard sizes -> identical to global mean)
    n_shards = reduce(jnp.asarray(1.0))
    encoder_loss = reduce(out["encoder_loss"]) / n_shards

    loss = rgb_loss + encoder_loss
    return loss, {"loss": loss, "rgb_loss": rgb_loss,
                  "encoder_loss": encoder_loss, "psnr": psnr,
                  "n_hit": reduce(jnp.sum(sm))}
