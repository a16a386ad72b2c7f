#!/usr/bin/env python
"""Summarize the multi-seed 20k-iter quality runs (tools/multiseed_quality.sh):
final-mesh chamfer vs the analytic GT sphere + tail train PSNR per seed,
with per-variant mean +- sample sd.  One JSON object to stdout."""
import glob
import json
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

from e2e_torch_parity import _chamfer_vs_sphere  # noqa: E402


def main():
    run = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else ".msq")
    out = {}
    for v in ("wmask", "womask"):
        rows = []
        for s in range(8):
            exp = os.path.join(run, f"exp_{v}_s{s}", "fake_scan", v,
                               "geometry")
            meshes = sorted(glob.glob(os.path.join(exp, "meshes", "*.ply")))
            log_p = os.path.join(run, f"{v}_s{s}.log")
            if not meshes or not os.path.exists(log_p):
                continue
            d2s, s2d = _chamfer_vs_sphere(meshes[-1])
            psnrs = [float(m) for m in re.findall(
                r"psnr=([0-9.]+)", open(log_p).read())]
            rows.append({"seed": s, "mesh": os.path.basename(meshes[-1]),
                         "chamfer_d2s": d2s, "chamfer_s2d": s2d,
                         "train_psnr_tail": float(np.mean(psnrs[-5:]))
                         if psnrs else None})
        if rows:
            arr = lambda k: np.array([r[k] for r in rows], np.float64)
            out[v] = {
                "seeds": rows,
                "chamfer_d2s_mean_sd": [float(arr("chamfer_d2s").mean()),
                                        float(arr("chamfer_d2s").std(ddof=1))
                                        if len(rows) > 1 else 0.0],
                "chamfer_s2d_mean_sd": [float(arr("chamfer_s2d").mean()),
                                        float(arr("chamfer_s2d").std(ddof=1))
                                        if len(rows) > 1 else 0.0],
                "train_psnr_tail_mean_sd": [
                    float(arr("train_psnr_tail").mean()),
                    float(arr("train_psnr_tail").std(ddof=1))
                    if len(rows) > 1 else 0.0],
            }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
