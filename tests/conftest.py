"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding paths compile and run without TPU hardware (the TPU analog of a
fake backend — SURVEY.md §4).

Note: the environment pre-registers a TPU PJRT plugin and pins
JAX_PLATFORMS; plain env vars are overridden at plugin registration, so we
update the config after import (before any backend is initialized)."""
import os

# tolerance-based tests (torch parity at 1e-4, analytic renderer checks)
# pin the f32 core; the bf16-activation default is quality/perf-validated
# on TPU via BENCHMARKS.md's sphere-convergence runs
os.environ.setdefault("FNEUS_CORE_ACT_BF16", "0")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA's CPU collectives abort the process when a rendezvous straggler is
# >40 s late (rendezvous.cc terminate timeout).  On a 1-core host the 8
# virtual device threads time-share the core, so a heavy sharded step can
# legitimately stagger past that — raise the limits far beyond any real
# deadlock window.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    flags += (" --xla_cpu_collective_timeout_seconds=1200"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
