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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
