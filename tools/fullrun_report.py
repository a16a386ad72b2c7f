"""Extract full-budget-run evidence (VERDICT r3 item 2) from a training
run's TensorBoard logs: milestone table (loss / psnr / s_val / rays/s),
schedule-boundary continuity (womask anneal_end=50000, wmask LR tail), and
NaN/drift checks.  Usage:

    python tools/fullrun_report.py <exp_logs_dir> [--boundary 50000]

Prints a markdown table + a one-line verdict; pure host-side, no device.
"""
import argparse
import math
import os


def load_scalars(logdir):
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    ea = EventAccumulator(logdir, size_guidance={"scalars": 0})
    ea.Reload()
    # sort by step: a resumed/restarted run appends non-monotonic steps,
    # which would break at_or_before()'s early exit and the boundary stats
    return {t: sorted(((e.step, e.value) for e in ea.Scalars(t)),
                      key=lambda sv: sv[0])
            for t in ea.Tags()["scalars"]}


def at_or_before(series, step):
    best = None
    for s, v in series:
        if s <= step:
            best = (s, v)
        else:
            break
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--boundary", type=int, default=None,
                    help="schedule boundary to check continuity around")
    args = ap.parse_args()
    sc = load_scalars(args.logdir)
    loss = sc.get("Loss/loss", [])
    psnr = sc.get("Statistics/psnr", [])
    sval = sc.get("Statistics/s_val", [])
    rps = sc.get("Perf/rays_per_sec", [])
    if not loss:
        raise SystemExit(f"no Loss/loss scalars under {args.logdir}")
    last = loss[-1][0]
    n_nan = sum(1 for _, v in loss if math.isnan(v) or math.isinf(v))

    # milestone rows: 8-ish evenly spaced + the final step
    steps = sorted({loss[0][0], last,
                    *[last * k // 8 for k in range(1, 8)]})
    print("| iter | loss | psnr | s_val | rays/s |")
    print("|---|---|---|---|---|")
    for s in steps:
        row = [at_or_before(x, s) for x in (loss, psnr, sval, rps)]
        cells = [f"{p[1]:.4g}" if p else "-" for p in row]
        print(f"| {s} | " + " | ".join(cells) + " |")

    if args.boundary and last > args.boundary:
        b = args.boundary
        lo = [v for s, v in loss if b - 2500 <= s < b]
        hi = [v for s, v in loss if b < s <= b + 2500]
        if lo and hi:
            mlo, mhi = sum(lo) / len(lo), sum(hi) / len(hi)
            print(f"\nboundary {b}: mean loss {mlo:.5f} (before) -> "
                  f"{mhi:.5f} (after), ratio {mhi / max(mlo, 1e-12):.3f}")
    tail = [v for _, v in loss[-10:]]
    print(f"\nfinal step {last}; NaN/inf loss events: {n_nan}; "
          f"tail-10 loss mean {sum(tail) / len(tail):.5f}")


if __name__ == "__main__":
    main()
