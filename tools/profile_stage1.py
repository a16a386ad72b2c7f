#!/usr/bin/env python
"""Op-level device profile of a train step (default stage 1).

Captures a jax.profiler trace of N compiled steps on the real chip, parses
the chrome-trace export (*.trace.json.gz), and prints:

* total device time per step
* a markdown top-K table of ops by total device time, with per-step ms,
  % of device time, and occurrence counts

Usage:
  python tools/profile_stage1.py [stage1|stage2|stage3] [--steps N]
                                 [--batch B] [--topk K] [--keep DIR]

The trace parse keys on the device-lane events: lanes whose process/thread
names look like TPU device streams ("/device:TPU:*" or "TPU ... XLA Ops"),
falling back to the lane with the largest aggregate event time if the
naming differs (tunneled PJRT backends vary).  BENCHMARKS.md "device
profile" sections are produced by this tool.
"""
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from bench import make_scene


def build_step(stage: str, batch: int, n_outside: int = 0):
    from factored_neus_tpu.models.renderer import RendererConfig
    from factored_neus_tpu.train import stage1, stage2, stage3
    from factored_neus_tpu.train.common import TrainConfig, init_all_params

    cfg = RendererConfig(n_samples=64, n_importance=64, n_outside=n_outside,
                         up_sample_steps=4)
    # womask (n_outside>0) uses mask_weight=0 + anneal (confs/womask.conf)
    tcfg = TrainConfig(batch_size=batch, end_iter=300000, warm_up_end=5000,
                       anneal_end=50000.0 if n_outside else 0.0,
                       mask_weight=0.0 if n_outside else 0.1)
    params = init_all_params(jax.random.PRNGKey(0), cfg)
    mod = {"stage1": stage1, "stage2": stage2, "stage3": stage3}[stage]
    opt_init, step_fn = mod.make_train_step(cfg, tcfg, mesh=None)
    return params, opt_init(params), step_fn


def capture(stage: str, batch: int, steps: int, trace_dir: str,
            n_outside: int = 0) -> None:
    params, opt_state, step_fn = build_step(stage, batch, n_outside)
    data = make_scene()
    key = jax.random.PRNGKey(1)
    for it in range(3):                     # warmup incl. compile
        params, opt_state, m = step_fn(params, opt_state, data,
                                       jnp.asarray(it % 4),
                                       jax.random.fold_in(key, it),
                                       jnp.asarray(it))
    float(m["loss"])
    jax.profiler.start_trace(trace_dir)
    for it in range(steps):
        params, opt_state, m = step_fn(params, opt_state, data,
                                       jnp.asarray(it % 4),
                                       jax.random.fold_in(key, 100 + it),
                                       jnp.asarray(3 + it))
    float(m["loss"])                        # force completion inside trace
    jax.profiler.stop_trace()


def load_trace(trace_dir: str) -> dict:
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)


def device_lane_events(trace: dict):
    """Duration events from the device-execution lanes.

    Chrome-trace layout: metadata events name processes/threads; XLA op
    events carry 'dur' (us).  Select lanes by name when possible, else the
    (pid, tid) lane with the largest total duration."""
    proc_names, thread_names = {}, {}
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = \
                e.get("args", {}).get("name", "")

    def lane_is_device(pid, tid):
        pn = proc_names.get(pid, "").lower()
        tn = thread_names.get((pid, tid), "").lower()
        return (("tpu" in pn or "device" in pn) and "host" not in pn
                and ("xla op" in tn or "ops" in tn or tn == ""))

    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    dev = [e for e in events if lane_is_device(e.get("pid"),
                                               e.get("tid"))]
    if not dev:
        # fallback: heaviest lane by aggregate duration
        lane_tot = collections.Counter()
        for e in events:
            lane_tot[(e.get("pid"), e.get("tid"))] += e["dur"]
        if not lane_tot:
            return []
        pid, tid = lane_tot.most_common(1)[0][0]
        dev = [e for e in events
               if e.get("pid") == pid and e.get("tid") == tid]
    return dev


def _is_container(name: str) -> bool:
    """Control-flow span ops (while/call/conditional) whose child ops are
    ALSO emitted as separate events on the same lane — counting both
    double-counts the children (a lax.map sweep shows up as one big
    `while.N` span plus its per-chunk fusions)."""
    return name.split(".")[0] in ("while", "call", "conditional")


def summarize(dev_events, steps: int, topk: int):
    agg = collections.defaultdict(lambda: [0.0, 0])
    total_us = 0.0
    for e in dev_events:
        a = agg[e["name"]]
        a[0] += e["dur"]
        a[1] += 1
        if not _is_container(e["name"]):
            total_us += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:topk]
    if total_us <= 0.0:
        # every event in the lane was a control-flow span — still print the
        # table rather than discarding a minutes-long device capture
        print(f"warning: no non-span device events in the selected lane "
              f"({len(agg)} distinct ops, all [span]); percentages omitted")
        for name, (us, cnt) in rows:
            print(f"| `{name[:80]}` [span] | {us / steps / 1e3:.3f} | - "
                  f"| {cnt / steps:.1f} |")
        return 0.0
    print(f"device time: {total_us / steps / 1e3:.2f} ms/step "
          f"({len(agg)} distinct ops, {steps} steps; control-flow spans "
          f"excluded from the total, marked [span] below)")
    print("| op | ms/step | % dev | calls/step |")
    print("|---|---|---|---|")
    for name, (us, cnt) in rows:
        span = _is_container(name)
        # span rows are EXCLUDED from total_us (their children are what
        # count), so a percentage against it would read >100% — print '--'
        pct = "--" if span else f"{100.0 * us / total_us:.1f}%"
        tag = " [span]" if span else ""
        print(f"| `{name[:80]}`{tag} | {us / steps / 1e3:.3f} "
              f"| {pct} | {cnt / steps:.1f} |")
    return total_us


def main():
    args = sys.argv[1:]
    stage = args[0] if args and not args[0].startswith("--") else "stage1"

    def opt(name, default, cast):
        if name not in args:
            return default
        i = args.index(name) + 1
        if i >= len(args) or args[i].startswith("--"):
            raise SystemExit(f"{name} requires a value")
        return cast(args[i])

    steps = opt("--steps", 10, int)
    batch = opt("--batch", 512, int)
    topk = opt("--topk", 15, int)
    keep = opt("--keep", None, str)
    n_outside = opt("--n-outside", 0, int)   # 32 = womask configuration

    trace_dir = keep or tempfile.mkdtemp(prefix="fneus_prof_")
    t0 = time.time()
    capture(stage, batch, steps, trace_dir, n_outside)
    print(f"trace captured in {time.time() - t0:.1f}s -> {trace_dir}")
    trace = load_trace(trace_dir)
    dev = device_lane_events(trace)
    summarize(dev, steps, topk)
    if not keep:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
