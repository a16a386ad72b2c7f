#!/usr/bin/env python
"""Benchmark: stage-1 training-step throughput (rays/sec/chip).

This is the BASELINE.json primary metric.  The workload is the reference's
stage-1 DTU configuration (wmask: 64 uniform + 64 importance samples, 4
up-sample rounds, full 8x256 SDF + radiance + RefColor networks, 4-term loss,
Adam) at the reference's 512-ray batch, on one chip, with device-side ray
generation — i.e. the same per-iteration semantics as
`python exp_runner.py --mode train` in the PyTorch reference.

vs_baseline: ratio against BASELINE_RAYS_PER_SEC = 3000, a documented
estimate of the PyTorch reference's single-GPU throughput (NeuS-family
codebases train 300k x 512-ray iterations in ~13-16h on a V100/3090-class
GPU => ~2.7-3.3k rays/s; the reference adds the RefColor surface branch on
top of NeuS, so 3000 is a favorable-to-the-reference estimate).  The
north-star target is vs_baseline >= 5 (BASELINE.md).

Prints ONE JSON line.
"""
import json
import time

import jax

# persistent compile cache: repeat bench runs skip the (remote) compile
import os as _os
_CACHE = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                       ".jax_cache")
_os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 3000.0
BATCH = 512
WARMUP_STEPS = 3
MEASURE_STEPS = 30


def make_scene(n_views=4, H=128, W=128):
    """Synthetic DTU-like scene resident on device (no dataset files)."""
    rng = np.random.RandomState(0)
    focal = 1.2 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    intr = np.tile(np.eye(4, dtype=np.float32), (n_views, 1, 1))
    intr[:, :3, :3] = K
    poses = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        c = np.array([3 * np.sin(ang), 0.5, -3 * np.cos(ang)], np.float32)
        fwd = -c / np.linalg.norm(c)
        up = np.array([0, -1, 0], np.float32)
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = right, up2, fwd, c
        poses.append(pose)
    images = rng.rand(n_views, H, W, 3).astype(np.float32)
    masks = np.ones_like(images)
    return {
        "images": jnp.asarray(images),
        "masks": jnp.asarray(masks),
        "intr_inv": jnp.asarray(np.linalg.inv(intr)),
        "poses": jnp.asarray(np.stack(poses)),
    }


def main():
    from factored_neus_tpu.models.renderer import RendererConfig
    from factored_neus_tpu.train import stage1
    from factored_neus_tpu.train.common import TrainConfig, init_all_params

    cfg = RendererConfig(n_samples=64, n_importance=64, n_outside=0,
                         up_sample_steps=4)
    tcfg = TrainConfig(batch_size=BATCH, end_iter=300000, warm_up_end=5000,
                       anneal_end=0.0, mask_weight=0.1)
    params = init_all_params(jax.random.PRNGKey(0), cfg)
    opt_init, step_fn = stage1.make_train_step(cfg, tcfg, mesh=None)
    opt_state = opt_init(params)
    data = make_scene()
    key = jax.random.PRNGKey(1)

    # warmup (includes compile); the value fetch is the only reliable sync
    # point on tunneled PJRT backends (block_until_ready returns eagerly)
    for it in range(WARMUP_STEPS):
        params, opt_state, m = step_fn(params, opt_state, data,
                                       jnp.asarray(it % 4),
                                       jax.random.fold_in(key, it),
                                       jnp.asarray(it))
    float(m["loss"])

    t0 = time.perf_counter()
    for it in range(MEASURE_STEPS):
        params, opt_state, m = step_fn(params, opt_state, data,
                                       jnp.asarray(it % 4),
                                       jax.random.fold_in(key, 100 + it),
                                       jnp.asarray(WARMUP_STEPS + it))
    # steps chain through donated params; fetching the last loss forces all
    float(m["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = MEASURE_STEPS * BATCH / dt
    print(json.dumps({
        "metric": "stage1_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
