#!/usr/bin/env python
"""Chamfer-vs-iteration curve over a training run's saved mesh snapshots
(VERDICT r4 item 2): evaluates every Nth saved mesh against the fabricated
scene's analytic GT sphere and emits one JSON line per mesh.

    python tools/mesh_curve.py <exp_geometry_dir> [--every 25000] [--out F]

Answers the stability question the womask-60k analysis raised: does the
masked wmask configuration stay geometrically stable over the full 300k
reference budget (ref:confs/womask.conf:21 end_iter=300000), where the
maskless womask run memorized views past 20k?  Protocol mirrors
ref:evaluation/dtu_eval.py:122-137 (bidirectional chamfer), GT here being
the analytic sphere the fabricated scene is built from.
"""
import argparse
import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)

from e2e_torch_parity import _chamfer_vs_sphere  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir", help=".../geometry dir containing meshes/")
    ap.add_argument("--every", type=int, default=25000,
                    help="evaluate meshes at iterations divisible by this")
    ap.add_argument("--out", default=None, help="also append JSONL here")
    args = ap.parse_args()

    meshes = sorted(glob.glob(os.path.join(args.exp_dir, "meshes", "*.ply")))
    if not meshes:
        raise SystemExit(f"no meshes under {args.exp_dir}")
    rows = []
    for m in meshes:
        it = int(re.search(r"(\d+)\.ply$", m).group(1))
        if it % args.every != 0:
            continue
        d2s, s2d = _chamfer_vs_sphere(m)
        row = {"iter": it, "chamfer_d2s": round(d2s, 6),
               "chamfer_s2d": round(s2d, 6),
               "mesh": os.path.basename(m)}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
