#!/usr/bin/env python
"""Mask-based DTU mesh cleaning CLI (ref:clean_mesh_pose.py:9-73)."""
import argparse
import os
from glob import glob

from factored_neus_tpu.evaltools.clean_mesh import clean_mesh
from factored_neus_tpu.meshing.ply import read_ply_mesh, write_ply


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scene", type=str, required=True)
    parser.add_argument("--setting", type=str, required=True)
    parser.add_argument("--suffix", type=int, default=300000)
    parser.add_argument("--data_dir", type=str, default="./public_data/data_DTU")
    parser.add_argument("--exp_dir", type=str, default="./exp")
    parser.add_argument("--case", type=str, default=None,
                        help="experiment case name under exp_dir; defaults "
                             "to the reference's data_DTU/dtu_scan<scene> "
                             "layout (ref:clean_mesh_pose.py:49, "
                             "sh_dtu.sh --case data_DTU/dtu_scanN)")
    args = parser.parse_args()

    scan = int(args.scene)
    suffix = args.suffix
    case = args.case if args.case is not None else f"data_DTU/dtu_scan{scan}"
    old_dir = f"{args.exp_dir}/{case}/{args.setting}/meshes/"
    new_dir = f"{args.exp_dir}/{case}/{args.setting}/meshes_clean/"
    os.makedirs(new_dir, exist_ok=True)

    verts, faces = read_ply_mesh(os.path.join(old_dir, f"{suffix:08d}.ply"))
    cameras_npz = f"{args.data_dir}/dtu_scan{scan}/cameras_sphere.npz"
    mask_paths = sorted(glob(f"{args.data_dir}/dtu_scan{scan}/mask/*.png"))
    n_images = 49 if scan < 83 else 64
    new_verts, new_faces = clean_mesh(verts, faces, cameras_npz, mask_paths,
                                      n_images)
    write_ply(os.path.join(new_dir, f"{suffix:08d}.ply"), new_verts, new_faces)
    print(f"cleaned: {len(verts)} -> {len(new_verts)} vertices")


if __name__ == "__main__":
    main()
