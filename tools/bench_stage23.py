#!/usr/bin/env python
"""Stage-2 / stage-3 step benchmarks with ablation knobs.

Usage: python tools/bench_stage23.py [stage2|stage3] [--pallas]
Prints one JSON line per run (same fetch-forced timing as bench.py).
"""
import json
import os
import sys
import time

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import make_scene

BATCH = 512
WARMUP = 3
STEPS = 15


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 \
        and not sys.argv[1].startswith("--") else "stage2"
    use_pallas = "--pallas" in sys.argv

    from factored_neus_tpu.models.renderer import RendererConfig
    from factored_neus_tpu.train import stage2, stage3
    from factored_neus_tpu.train.common import TrainConfig, init_all_params

    cfg = RendererConfig(n_samples=64, n_importance=64, n_outside=0,
                         up_sample_steps=4, use_pallas_sampling=use_pallas)
    tcfg = TrainConfig(batch_size=BATCH, end_iter=10000, warm_up_end=100,
                       anneal_end=0.0, mask_weight=0.1)
    params = init_all_params(jax.random.PRNGKey(0), cfg)
    mod = {"stage2": stage2, "stage3": stage3}[stage]
    opt_init, step_fn = mod.make_train_step(cfg, tcfg, mesh=None)
    opt_state = opt_init(params)
    data = make_scene()
    key = jax.random.PRNGKey(1)

    for it in range(WARMUP):
        params, opt_state, m = step_fn(params, opt_state, data,
                                       jnp.asarray(it % 4),
                                       jax.random.fold_in(key, it),
                                       jnp.asarray(it))
    float(m["loss"])
    t0 = time.perf_counter()
    for it in range(STEPS):
        params, opt_state, m = step_fn(params, opt_state, data,
                                       jnp.asarray(it % 4),
                                       jax.random.fold_in(key, 100 + it),
                                       jnp.asarray(WARMUP + it))
    float(m["loss"])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"{stage}_train_rays_per_sec_per_chip",
        "value": round(STEPS * BATCH / dt, 1), "unit": "rays/s",
        "step_ms": round(dt / STEPS * 1e3, 2), "pallas": use_pallas,
    }))


if __name__ == "__main__":
    main()
