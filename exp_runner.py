#!/usr/bin/env python
"""Stage-1 CLI: geometry + radiance training / validation / meshing.

Same surface as the reference entry point (ref:exp_runner.py:637-682):
  --conf --mode {train, validate_mesh, validate_mesh_shiny,
  mesh_dtu_shpere2world, validate_image, interpolate_i_j}
  --case --type --is_continue --mcube_threshold --surface_weight --idx
The --gpu flag is accepted for drop-in compatibility but ignored (device
selection is JAX's job; multi-chip runs use --shard).
"""
import argparse

from factored_neus_tpu.train.runner1 import Runner
from factored_neus_tpu.utils.logging import (debug_nans,
                                             enable_compile_cache,
                                             profiler_trace,
                                             setup_logging)


def main():
    setup_logging()
    enable_compile_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, default="./confs/base.conf")
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--mcube_threshold", type=float, default=0.0)
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--gpu", type=int, default=0)   # compat, unused
    parser.add_argument("--case", type=str, default="")
    parser.add_argument("--type", type=str, default="dtu")
    parser.add_argument("--surface_weight", type=float, default=0.1)
    parser.add_argument("--idx", type=int, default=-1,
                        help="view index for validate_image (-1: default "
                             "view — 0 for dtu/sk3d, the reference's 57 "
                             "for synthetic/shiny)")
    parser.add_argument("--shard", default=False, action="store_true",
                        help="shard the ray batch over all local devices")
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="write a jax.profiler trace of the run to DIR")
    parser.add_argument("--debug_nans", default=False, action="store_true",
                        help="halt on the first NaN produced on device")
    parser.add_argument("--seed", type=int, default=0,
                        help="PRNG seed for init + ray sampling (framework "
                             "extension; the reference is unseeded)")
    args = parser.parse_args()

    with debug_nans(args.debug_nans), profiler_trace(args.profile):
        runner = Runner(args.conf, args.mode, args.case, args.is_continue,
                        args.type, args.surface_weight,
                        use_mesh_sharding=args.shard, seed=args.seed)

        if args.mode == "train":
            runner.train()
        elif args.mode == "validate_mesh":
            runner.validate_mesh(world_space=True, resolution=512,
                                 threshold=args.mcube_threshold)
        elif args.mode == "validate_mesh_shiny":
            runner.validate_mesh_shiny()
        elif args.mode == "mesh_dtu_shpere2world":
            runner.mesh_dtu_sphere2world(mesh_name="dtu122-300000")
        elif args.mode == "validate_image":
            if args.type in ("dtu", "sk3d"):
                runner.validate_image(resolution_level=1,
                                      idx=max(args.idx, 0))
            else:
                # reference hardcodes view 57 (ref:exp_runner.py:677);
                # honor an explicit --idx instead of silently ignoring it
                idx = args.idx if args.idx >= 0 else 57
                runner.validate_synthetic_img(idx=idx, resolution_level=1)
        elif args.mode.startswith("interpolate"):
            _, i0, i1 = args.mode.split("_")
            runner.interpolate_view(int(i0), int(i1))
        else:
            raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
