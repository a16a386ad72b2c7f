#!/usr/bin/env python
"""Microbenchmark: fused Pallas geometry kernel fwd / fwd+bwd at the
production stage-1 shape (65536 points, 8x256 SDF skip[4] multires 6).

Usage: python tools/bench_geom_kernel.py [--stacked 0|1] [--block N]
                                         [--n N] [--steps K]
Prints one JSON line with fwd_ms and fwdbwd_ms (fetch-forced timing).
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


def main():
    args = sys.argv[1:]

    def opt(name, default, cast):
        return cast(args[args.index(name) + 1]) if name in args else default

    stacked = bool(opt("--stacked", 1, int))
    block = opt("--block", 256, int)
    fwd_block = opt("--fwd-block", 0, int) or None
    stash = bool(opt("--stash", 0, int))
    n = opt("--n", 65536, int)
    steps = opt("--steps", 30, int)

    from factored_neus_tpu.models import fields as F
    from factored_neus_tpu.ops import pallas_geometry as PG

    cfg = F.SDFConfig(d_out=257, d_hidden=256, n_layers=8, skip_in=(4,),
                      multires=6)
    params = F.sdf_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.4

    @jax.jit
    def fwd(params, x):
        s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x,
                                                block_rows=block,
                                                stacked=stacked,
                                                fwd_block_rows=fwd_block,
                                                stash=stash)
        return s.sum() + f.sum() + g.sum()

    @jax.jit
    def fwdbwd(params, x):
        def loss(params, x):
            s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x,
                                                    block_rows=block,
                                                    stacked=stacked,
                                                    fwd_block_rows=fwd_block,
                                                    stash=stash)
            eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
            return jnp.mean(jnp.abs(s)) + jnp.mean(f ** 2) + eik
        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        return sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(gp)) \
            + gx.sum()

    out = {"stacked": stacked, "block": block, "n": n,
           **({"fwd_block": fwd_block} if fwd_block else {}),
           **({"stash": True} if stash else {})}
    for name, fn in (("fwd_ms", fwd), ("fwdbwd_ms", fwdbwd)):
        float(fn(params, x))                        # compile + warm
        float(fn(params, x))
        t0 = time.perf_counter()
        acc = None
        for _ in range(steps):
            acc = fn(params, x)
        float(acc)
        out[name] = round((time.perf_counter() - t0) / steps * 1e3, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
