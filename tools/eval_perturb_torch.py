#!/usr/bin/env python
"""Torch-side eval-protocol ablation for the fg-PSNR parity question.

The reference validates with the training jitter ON (its render() takes the
conf's perturb=1.0 unless perturb_overwrite>=0 — ref:models/renderer.py:391-407
and exp_runner.py:374-427 never overwrite), while this framework validates
deterministically (perturb=0).  tools/e2e_torch_parity.py therefore scores
torch on a jittered-quadrature render and jax on a midpoint-quadrature one.

This tool loads a FINISHED torch parity seed checkpoint and renders view 0
BOTH ways, isolating the protocol's contribution on the torch side:
  - perturb_overwrite=0  (this framework's validation protocol)
  - reference protocol (perturb=1), K independent draws (per-draw PSNR +
    the PSNR of the draw-mean image)

Usage: python tools/eval_perturb_torch.py <workdir> --seed N [--draws K]
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(REPO, "tests"))

from e2e_torch_parity import CASE, _psnr_curveless, _seed_conf  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--draws", type=int, default=8)
    args = ap.parse_args()
    workdir = os.path.abspath(args.workdir)

    import ref_compat
    ref_compat.install()
    import torch

    os.chdir(workdir)
    sys.path.insert(0, "/root/reference")
    from exp_runner import Runner  # the reference

    conf_path = _seed_conf(workdir, args.seed)
    if args.seed is not None:
        torch.manual_seed(args.seed)
        np.random.seed(args.seed)
    runner = Runner(conf_path, "validate", CASE, True, "dtu")
    assert runner.iter_step > 0, "no torch checkpoint found — train first"

    level = 2
    rays_o, rays_d = runner.dataset.gen_rays_at(0, resolution_level=level)
    H, W, _ = rays_o.shape
    gt = runner.dataset.image_at(0, resolution_level=level)
    mask = np.asarray(
        runner.dataset.masks[0].cpu().numpy())[::level, ::level, 0] > 0.5
    mask = mask[:H, :W]

    def render(perturb_overwrite):
        out = []
        for o, d in zip(rays_o.reshape(-1, 3).split(runner.batch_size),
                        rays_d.reshape(-1, 3).split(runner.batch_size)):
            near, far = runner.dataset.near_far_from_sphere(o, d)
            r = runner.renderer.render(
                o, d, near, far, perturb_overwrite=perturb_overwrite,
                cos_anneal_ratio=runner.get_cos_anneal_ratio())
            out.append(r["color_fine"].detach().cpu().numpy())
        return (np.concatenate(out).reshape(H, W, 3) * 256).clip(0, 255)

    res = {"framework": "torch-reference", "seed": args.seed,
           "iter_step": runner.iter_step, "draws": args.draws}
    img0 = render(0.0)
    res["perturb0"] = {"psnr": _psnr_curveless(img0, gt),
                       "psnr_fg": _psnr_curveless(img0, gt, mask)}
    per_draw = []
    acc = np.zeros((H, W, 3), np.float64)
    for k in range(args.draws):
        torch.manual_seed(1000 + k)     # independent jitter draws
        img = render(-1)                # conf's perturb=1 (the ref protocol)
        acc += img
        per_draw.append({"psnr": _psnr_curveless(img, gt),
                         "psnr_fg": _psnr_curveless(img, gt, mask)})
    mean_img = acc / max(args.draws, 1)
    res["perturb1"] = {
        "per_draw": per_draw,
        "psnr_fg_mean_of_draws": float(np.mean([d["psnr_fg"]
                                                for d in per_draw])),
        "psnr_fg_sd_of_draws": float(np.std([d["psnr_fg"]
                                             for d in per_draw], ddof=1))
        if args.draws > 1 else 0.0,
        "psnr_fg_of_mean_img": _psnr_curveless(mean_img, gt, mask),
    }
    out_p = os.path.join(
        workdir, f"torch_perturb_ablation_s{args.seed}.json")
    with open(out_p, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "perturb1"}
                     | {"perturb1_fg_mean": res["perturb1"]
                        ["psnr_fg_mean_of_draws"]}))


if __name__ == "__main__":
    main()
