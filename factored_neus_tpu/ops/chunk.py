"""Static-shape chunked evaluation.

Replaces the reference's host-side python chunk loops
(ref:models/calLvis.py:226-227 light chunks, ref:models/inverRender.py:173-179
100k-point visibility chunks, ref:models/renderer.py:14-29 mesh-grid blocks)
with a single ``lax.map`` over a fixed number of equally-sized chunks: one
compiled program, bounded VMEM/HBM working set, no host round trips.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def chunked_apply(fn: Callable, x: jnp.ndarray, chunk_size: int,
                  out_dim: int | None = None) -> jnp.ndarray:
    """Apply ``fn`` ([n, d] -> [n, out]) over rows of ``x`` in fixed chunks.

    Pads to a multiple of chunk_size (fn must tolerate padded rows — all our
    MLPs do), maps, and slices the padding back off.  When x already fits in
    one chunk, calls fn directly (no map overhead).
    """
    del out_dim                       # shape comes from fn itself
    return chunked_apply_tree(fn, x, chunk_size)


def chunked_apply_tree(fn: Callable, x: jnp.ndarray, chunk_size: int):
    """``chunked_apply`` for fns returning a pytree of arrays that share the
    leading row axis (e.g. the (sdf, feat, grad) triple of
    ``sdf_value_and_grad_feat``)."""
    n = x.shape[0]
    if n <= chunk_size:
        return fn(x)
    num_chunks = -(-n // chunk_size)
    pad = num_chunks * chunk_size - n
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
    xs = x.reshape((num_chunks, chunk_size) + x.shape[1:])
    ys = jax.lax.map(fn, xs)
    unchunk = lambda a: a.reshape((num_chunks * chunk_size,)
                                  + a.shape[2:])[:n]
    return jax.tree_util.tree_map(unchunk, ys)
