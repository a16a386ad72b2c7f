#!/usr/bin/env python
"""Stage-3 CLI: material + direct illumination recovery.

Same surface as the reference entry point (ref:mateIllu.py:1103-1163):
modes train / validate_image / cal_psnr / relgt_img / relgt_video /
validate_video / validate_synthetic_video.
"""
import argparse

from factored_neus_tpu.train.runner3 import Runner
from factored_neus_tpu.utils.logging import setup_logging


def main():
    setup_logging()
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", type=str, default="./confs/base.conf")
    parser.add_argument("--mode", type=str, default="train")
    parser.add_argument("--is_continue", default=False, action="store_true")
    parser.add_argument("--gpu", type=int, default=0)   # compat, unused
    parser.add_argument("--case", type=str, default="")
    parser.add_argument("--type", type=str, default="dtu")
    parser.add_argument("--idx", type=int, default=0)
    parser.add_argument("--shard", default=False, action="store_true")
    args = parser.parse_args()

    runner = Runner(args.conf, args.mode, args.case, args.is_continue,
                    args.type, use_mesh_sharding=args.shard)
    if args.mode == "train":
        runner.train()
    elif args.mode == "validate_image":
        if args.type in ("dtu", "sk3d"):
            runner.validate_image(resolution_level=1, idx=args.idx)
        else:
            runner.validate_synthetic_img(resolution_level=1, idx=args.idx)
    elif args.mode == "cal_psnr":
        runner.cal_synthetic_psnr(idx=args.idx)
    elif args.mode == "relgt_img":
        runner.relgt_synthetic_img(idx=args.idx)
    elif args.mode == "relgt_video":
        runner.relgt_synthetic_video()
    elif args.mode == "validate_video":
        runner.validate_video()
    elif args.mode == "validate_synthetic_video":
        runner.validate_synthetic_video()
    else:
        raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
