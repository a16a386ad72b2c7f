#!/usr/bin/env python
"""Eval-protocol ablation for the fg-PSNR parity question.

The torch reference renders VALIDATION images with the per-ray training
jitter still on (ref:exp_runner.py:374-427 calls renderer.render with the
conf's perturb=1.0 — there is no eval-mode override), while this framework
renders validation deterministically (perturb_overwrite=0.0,
train/stage1.py make_render_fn).  The multi-seed parity tables therefore
compare a jittered-quadrature torch render against a midpoint-quadrature
jax render — a measurement-protocol difference, not a model-quality one.

This tool loads a trained stage-1 checkpoint from a parity workdir seed and
renders view 0 BOTH ways:
  - perturb=0 (this framework's protocol)
  - perturb=1, K independent jitter draws (the torch protocol, averaged so
    the draw noise is visible)
and prints full + foreground PSNR for each, isolating the protocol's
contribution to the cross-framework gap.

Usage: python tools/eval_perturb_ablation.py <workdir> --seed N [--draws K]
"""
import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from e2e_torch_parity import CASE, _psnr_curveless, _seed_conf  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--draws", type=int, default=8,
                    help="independent perturb=1 jitter draws to render")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (leave the TPU tunnel free)")
    args = ap.parse_args()
    workdir = os.path.abspath(args.workdir)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from factored_neus_tpu.data import rays as RAYS
    from factored_neus_tpu.models import renderer as R
    from factored_neus_tpu.train.common import chunked_render
    from factored_neus_tpu.train.runner1 import Runner

    conf_path = _seed_conf(workdir, args.seed)
    runner = Runner(conf_path, "validate", CASE, True, "dtu",
                    seed=0 if args.seed is None else int(args.seed))
    assert runner.iter_step > 0, "no checkpoint found — train first"

    level = 2
    rays_o, rays_d = runner.dataset.gen_rays_at(0, resolution_level=level)
    gt = runner.dataset.image_at(0, resolution_level=level)
    H, W = rays_o.shape[:2]
    mask = np.asarray(runner.dataset.masks[0])[::level, ::level, 0] > 0.5
    mask = mask[:H, :W]

    cfg, tcfg = runner.cfg, runner.tcfg

    @jax.jit
    def render_chunk(params, o, d, near, far, key, perturb):
        return R.render(params, cfg, o, d, near, far, key=key,
                        cos_anneal_ratio=1.0, perturb_overwrite=perturb)

    def render_full(perturb, key):
        def fn(o_c, d_c, i):
            near, far = RAYS.near_far_from_sphere(o_c, d_c)
            k = None if key is None else jax.random.fold_in(key, i)
            return render_chunk(runner.params, o_c, d_c, near, far, k,
                                jnp.asarray(perturb))

        res, h, w = chunked_render(fn, rays_o, rays_d,
                                   tcfg.batch_size, ("color_fine",))
        return (np.asarray(res["color_fine"]).reshape(h, w, 3) * 256
                ).clip(0, 255)

    out = {"workdir": workdir, "seed": args.seed,
           "iter_step": runner.iter_step}

    img0 = render_full(0.0, None)
    out["perturb0"] = {"psnr": _psnr_curveless(img0, gt),
                       "psnr_fg": _psnr_curveless(img0, gt, mask)}

    draws = []
    for k in range(args.draws):
        img = render_full(1.0, jax.random.PRNGKey(1000 + k))
        draws.append({"psnr": _psnr_curveless(img, gt),
                      "psnr_fg": _psnr_curveless(img, gt, mask)})
    out["perturb1_draws"] = draws
    fg = np.array([d["psnr_fg"] for d in draws])
    out["perturb1_fg_mean"] = float(fg.mean())
    out["perturb1_fg_sd"] = float(fg.std(ddof=1)) if len(fg) > 1 else 0.0
    out["protocol_delta_fg"] = float(fg.mean() - out["perturb0"]["psnr_fg"])

    path = os.path.join(workdir,
                        f"perturb_ablation_s{args.seed}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
