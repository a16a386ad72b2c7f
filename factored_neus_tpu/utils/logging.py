"""Observability: TensorBoard scalars, throughput meter, profiler hooks,
NaN debugging.

The reference logs loss/psnr/s_val/cdf/weight_max to TensorBoard
(ref:exp_runner.py:185-191) and has no profiling at all (SURVEY.md §5.1);
here a rays/sec meter is first-class (it is the BASELINE.json primary
metric) and `jax.profiler` traces can be toggled per run.  NaN checks
(SURVEY.md §5.2) are a config flag wrapping jax.debug_nans.
"""
from __future__ import annotations

import contextlib
import logging as _pylogging
import os
import time
from typing import Dict, Optional

import jax

try:
    from tensorboardX import SummaryWriter as _TBWriter
except Exception:                                   # pragma: no cover
    _TBWriter = None

log = _pylogging.getLogger("factored_neus_tpu")


def setup_logging(level=_pylogging.INFO):
    _pylogging.basicConfig(
        level=level,
        format="[%(filename)s:%(lineno)s - %(funcName)20s() ] %(message)s")


class MetricsWriter:
    """TensorBoard scalar writer (no-op when tensorboardX is absent)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._w = _TBWriter(log_dir) if _TBWriter is not None else None

    def scalar(self, tag: str, value, step: int):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def scalars(self, values: Dict[str, float], step: int):
        for k, v in values.items():
            self.scalar(k, v, step)

    def close(self):
        if self._w is not None:
            self._w.close()


class ThroughputMeter:
    """Rolling rays/sec (the primary benchmark metric)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._t0 = None
        self._count = 0
        self.rays_per_sec = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        self._count = 0

    def step(self, n_rays: int):
        if self._t0 is None:
            self.start()
            return
        self._count += n_rays
        if self._count >= self.window * n_rays:
            dt = time.perf_counter() - self._t0
            self.rays_per_sec = self._count / max(dt, 1e-9)
            self.start()


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at a durable directory.

    The production step programs take minutes to compile over the tunneled
    backend; caching them makes process restarts (is_continue resume, stage
    chaining, repeated validation CLIs) near-instant after the first run.
    Resolution order: explicit `path` arg, else $FNEUS_COMPILE_CACHE
    (set to "0"/"" to disable), else ~/.cache/factored_neus_tpu/xla.
    Returns the directory used, or None when disabled or unavailable.
    """
    if path is None:
        path = os.environ.get(
            "FNEUS_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache",
                         "factored_neus_tpu", "xla"))
    if not path or path == "0":
        return None
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:                          # pragma: no cover
        log.warning("persistent compile cache unavailable: %s", e)
        return None
    return path


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enabled: bool):
    if not enabled:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
