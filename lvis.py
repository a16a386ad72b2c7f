#!/usr/bin/env python
"""Stage-2 CLI: light-visibility + indirect-illumination distillation.

Same surface as the reference entry point (ref:lvis.py:415-447).
"""
import argparse

from factored_neus_tpu.train.runner2 import Runner
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
    parser.add_argument("--mcube_threshold", type=float,
                    default=0.0)  # compat, unused (matching
                                  # ref:lvis.py:427)
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--gpu", type=int, default=0)   # compat, unused
    parser.add_argument("--case", type=str, default="")
    parser.add_argument("--type", type=str, default="dtu")
    parser.add_argument("--shard", default=False, action="store_true")
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
                        args.type, use_mesh_sharding=args.shard,
                        seed=args.seed)
        if args.mode == "train":
            runner.train()
        elif args.mode == "validate_image":
            if args.type in ("dtu", "sk3d"):
                runner.validate_image(resolution_level=1)
            else:
                runner.validate_synthetic_img(resolution_level=1)
        else:
            raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
