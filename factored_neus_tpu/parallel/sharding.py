"""Device-mesh data parallelism over the ray axis.

The reference is strictly single-GPU (SURVEY.md §2.5: no DDP/NCCL anywhere,
ref:exp_runner.py:661).  The TPU-native scaling story: rays are
embarrassingly parallel, so the ray batch is the data-parallel axis —
sharded over a 1-D `jax.sharding.Mesh` with `shard_map`; parameters are
replicated; the loss normalizers and gradient reductions ride ICI as `psum`
inside the differentiated function (so each chip computes the identical
global gradient and applies the identical optimizer update — no parameter
broadcast needed).

Per-chip RNG: the step key is `fold_in`-ed with the chip's mesh axis index,
giving independent ray jitter / hemisphere samples per shard.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "dp"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def ray_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AXIS))


def psum(x, mesh: Optional[Mesh]):
    """psum over the ray axis when running sharded, identity otherwise."""
    if mesh is None:
        return x
    return jax.lax.psum(x, AXIS)


def device_key(key, mesh: Optional[Mesh]):
    """Distinct PRNG stream per chip inside shard_map."""
    if mesh is None:
        return key
    return jax.random.fold_in(key, jax.lax.axis_index(AXIS))



