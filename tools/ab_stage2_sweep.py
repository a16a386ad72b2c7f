#!/usr/bin/env python
"""In-process A/B of the round-3 sweep optimizations, immune to host-load
drift across runs: measures interleaved windows of (baseline, narrowed
value-only sweep, + fused fine sweep [stage2 only]) train steps.

Usage: python tools/ab_stage2_sweep.py [stage1|stage2|stage3]
"""
import dataclasses
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
STEPS = 20
ROUNDS = 3


def build(cfg, tcfg, params, data, narrowed: bool):
    """Build a jitted step; `narrowed=False` restores the full-width sweep
    by patching sdf_value_sweep back to the plain forward during trace."""
    from factored_neus_tpu.models import fields as F
    from factored_neus_tpu.train import stage1, stage2, stage3
    mod = {"stage1": stage1, "stage2": stage2, "stage3": stage3}[STAGE]
    orig = F.sdf_value_sweep
    if not narrowed:
        F.sdf_value_sweep = lambda p, c, x, act_dtype=None: F.sdf_apply(
            p, c, x, act_dtype=act_dtype)[:, 0]
    try:
        opt_init, step_fn = mod.make_train_step(cfg, tcfg, mesh=None)
        opt_state = opt_init(_copy(params))
        # trace+compile now, under the patch (steps DONATE params/opt_state
        # buffers: feed copies, keep the originals)
        p2, o2, m = _call(step_fn, _copy(params), _copy(opt_state), data, 0,
                          jax.random.PRNGKey(9))
        float(m["loss"])   # scalar fetch: the tunnel lies to block_until_ready
    finally:
        F.sdf_value_sweep = orig
    return step_fn, opt_state


def _copy(tree):
    return jax.tree_util.tree_map(jnp.copy, tree)


def _call(step_fn, params, opt_state, data, it, key):
    return step_fn(params, opt_state, data, jnp.asarray(it % 4), key,
                   jnp.asarray(it))


def window(step_fn, params, opt_state, data, tag):
    key = jax.random.PRNGKey(1)
    params, opt_state = _copy(params), _copy(opt_state)
    for it in range(WARMUP):
        params, opt_state, m = _call(step_fn, params, opt_state, data, it,
                                     key)
    float(m["loss"])   # scalar fetch: the tunnel lies to block_until_ready
    t0 = time.perf_counter()
    for it in range(STEPS):
        params, opt_state, m = _call(step_fn, params, opt_state, data, it,
                                     key)
    float(m["loss"])   # scalar fetch: the tunnel lies to block_until_ready
    dt = (time.perf_counter() - t0) / STEPS
    return dt


def main():
    global STAGE
    STAGE = sys.argv[1] if len(sys.argv) > 1 else "stage2"
    from factored_neus_tpu.models.renderer import RendererConfig
    from factored_neus_tpu.train.common import TrainConfig, init_all_params

    tcfg = TrainConfig(batch_size=BATCH, end_iter=10000, warm_up_end=100,
                       anneal_end=0.0, mask_weight=0.1)
    data = make_scene()

    variants = {}
    base = RendererConfig(n_samples=64, n_importance=64, n_outside=0,
                          up_sample_steps=4)
    params = init_all_params(jax.random.PRNGKey(0), base)
    variants["baseline"] = build(
        dataclasses.replace(base, fused_fine_sweep=False), tcfg, params,
        data, narrowed=False)
    variants["narrowed"] = build(
        dataclasses.replace(base, fused_fine_sweep=False), tcfg, params,
        data, narrowed=True)
    if STAGE == "stage2":
        variants["narrowed+fused"] = build(base, tcfg, params, data,
                                           narrowed=True)

    acc = {k: [] for k in variants}
    for r in range(ROUNDS):
        for k, (fn, opt_state) in variants.items():
            acc[k].append(window(fn, params, opt_state, data, k))
    for k, dts in acc.items():
        best = min(dts)
        print(json.dumps({"variant": k, "stage": STAGE,
                          "ms_per_step_best": round(best * 1e3, 2),
                          "rays_per_sec": round(BATCH / best, 1),
                          "windows_ms": [round(d * 1e3, 2) for d in dts]}))


if __name__ == "__main__":
    main()
