#!/usr/bin/env python
"""A/B the stage-1 train-step block size (train.block_steps: K optimizer
steps per device program, exact same trajectory — lax.scan).  The shipped
confs use 8; this sweeps K to check whether the ~1.3 ms tunnel dispatch
floor (BENCHMARKS.md kernel-ceiling section) leaves more to amortize.

    python tools/bench_ksteps.py [K ...]   (default: 8 16 32)

One JSON line per K, interleaved repeats to cancel tunnel drift.
"""
import json
import sys

HERE = __file__
sys.path.insert(0, HERE.rsplit("/", 2)[0])

from bench import measure  # noqa: E402


def main():
    ks = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    results = {k: [] for k in ks}
    for rep in range(2):
        for k in ks:
            r = measure(512, k_steps=k, with_mfu=False)
            results[k].append(round(r["rays_per_sec"], 1))
    for k in ks:
        print(json.dumps({"k_steps": k, "rays_per_s": results[k],
                          "best": max(results[k])}), flush=True)


if __name__ == "__main__":
    main()
