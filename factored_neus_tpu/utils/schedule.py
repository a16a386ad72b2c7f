"""Learning-rate schedule: linear warmup then cosine decay to an alpha floor.

Behavior parity: ref:exp_runner.py:229-238 (identical in lvis.py:207-216 and
mateIllu.py:214-223):
    iter < warmup:  factor = iter / warmup
    else:           p = (iter - warmup) / (end - warmup)
                    factor = (cos(pi p) + 1)/2 * (1 - alpha) + alpha
Implemented as a jnp function of the step so it lives inside the jitted
train step (optax inject_hyperparams-style), not a host-side mutation.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lr_factor(step, warm_up_end: float, end_iter: int, alpha: float):
    step = jnp.asarray(step, jnp.float32)
    warm = step / jnp.maximum(warm_up_end, 1.0)
    progress = (step - warm_up_end) / max(end_iter - warm_up_end, 1.0)
    cos = (jnp.cos(np.pi * progress) + 1.0) * 0.5 * (1.0 - alpha) + alpha
    if warm_up_end <= 0:
        return cos
    return jnp.where(step < warm_up_end, warm, cos)


def learning_rate(step, base_lr: float, warm_up_end: float, end_iter: int,
                  alpha: float):
    return base_lr * lr_factor(step, warm_up_end, end_iter, alpha)


def cos_anneal_ratio(step, anneal_end: float):
    """ref:exp_runner.py:223-227: 1.0 when anneal_end == 0 else min(1, it/end)."""
    if anneal_end == 0.0:
        return jnp.asarray(1.0, jnp.float32)
    return jnp.minimum(1.0, jnp.asarray(step, jnp.float32) / anneal_end)
