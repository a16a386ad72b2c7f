#!/usr/bin/env python
"""Offline DTU mesh evaluation CLI (ref:eval_mesh.py:7-26): runs the DTU
Chamfer protocol on exp/.../meshes_clean/{suffix}.ply."""
import argparse
import os

from factored_neus_tpu.evaltools import dtu


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", type=int, required=True)
    parser.add_argument("--setting", type=str, default="womask/geometry")
    parser.add_argument("--suffix", default="00300000")
    parser.add_argument("--dataset_dir", type=str,
                        default="./public_data/dtu_eval")
    parser.add_argument("--exp_dir", type=str, default="./exp")
    parser.add_argument("--case", type=str, default=None,
                        help="experiment case name under exp_dir; defaults "
                             "to the reference's data_DTU/dtu_scan<scene> "
                             "layout")
    args = parser.parse_args()

    case = args.case if args.case is not None \
        else f"data_DTU/dtu_scan{args.scene}"
    exp = os.path.join(args.exp_dir, case, args.setting)
    mesh = os.path.join(exp, "meshes_clean", f"{args.suffix}.ply")
    d2s, s2d, overall = dtu.eval(mesh, args.scene, args.dataset_dir, exp)
    print(d2s, s2d, overall)


if __name__ == "__main__":
    main()
