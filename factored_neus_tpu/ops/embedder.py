"""NeRF positional (frequency) encoding.

Behavior parity: ref:models/embedder.py:6-51.  Feature ordering matches the
reference exactly: ``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]``
with each block covering all input dims, log-spaced frequencies
``2^0 .. 2^(multires-1)``, include_input=True.

TPU note: instead of a Python list of per-frequency lambdas we broadcast to a
single ``[..., n_freq, d]`` tensor so XLA emits one fused sin + one fused cos
over a contiguous VMEM block, then a reshape (free, layout-only).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
import numpy as np


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """Encode last axis of `x` with `multires` octaves; returns [..., d*(1+2m)]."""
    if multires <= 0:
        return x
    freqs = jnp.asarray(2.0 ** np.arange(multires), dtype=x.dtype)  # [m]
    xb = x[..., None, :] * freqs[:, None]                           # [..., m, d]
    # interleave (sin_f, cos_f) per frequency to match torch ordering
    sc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)             # [..., m, 2, d]
    enc = sc.reshape(x.shape[:-1] + (2 * multires * x.shape[-1],))
    return jnp.concatenate([x, enc], axis=-1)


def get_embedder(multires: int, input_dims: int = 3
                 ) -> Tuple[Callable[[jnp.ndarray], jnp.ndarray], int]:
    """Mirror of ref:models/embedder.py:39-51 (include_input, log sampling)."""
    if multires <= 0:
        return (lambda x: x), input_dims
    out_dim = input_dims * (1 + 2 * multires)

    def embed(x: jnp.ndarray) -> jnp.ndarray:
        return positional_encoding(x, multires)

    return embed, out_dim
