"""MLP building blocks as pure init/apply pairs over parameter pytrees.

Two layer flavors:
  * plain dense          params {'w': [in,out], 'b': [out]}
  * weight-normed dense  params {'v': [in,out], 'g': [out], 'b': [out]}
    with  W = g * v / ||v||_col  (norm over the input axis, i.e. per output
    unit — the same reparameterization torch's ``nn.utils.weight_norm``
    applies per output row; ref:models/fields.py:67-68).

Initializers mirror torch defaults (kaiming-uniform bound 1/sqrt(fan_in)) and
the NeuS geometric initialization (ref:models/fields.py:47-65) so that the
rebuilt fields match the reference's training dynamics.

Everything is f32 by default; matmuls take `preferred_element_type` f32 so the
MXU accumulates at full precision even when activations are bf16.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


# Matmul precision for field MLPs.  'default' = single-pass bf16 on the MXU
# with f32 accumulation (activations/params stay f32); 'highest' = 6-pass
# full-f32.  Measured on the synthetic-sphere convergence benchmark (2k
# stage-1 iters, v5e): bf16 reaches PSNR 54.8 / mesh radius 0.5999+/-0.033
# vs f32's 53.1 / 0.6035+/-0.035 — statistically identical quality at 1.5x
# the training throughput, so bf16 is the default; set
# FNEUS_MATMUL_PRECISION=highest (or call set_matmul_precision) for full-f32
# ablations.
import os as _os
MATMUL_PRECISION = _os.environ.get("FNEUS_MATMUL_PRECISION", "default")


def set_matmul_precision(p: str) -> None:
    global MATMUL_PRECISION
    MATMUL_PRECISION = p


def dense_init(key, d_in: int, d_out: int, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in)
    w = jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def dense_apply(p, x):
    return jnp.dot(x, p["w"], precision=MATMUL_PRECISION,
                   preferred_element_type=jnp.float32) + p["b"]


def dense_apply_act(p, x, act_dtype):
    """Dense layer with `act_dtype` activation storage: the [N,d] input is
    read from HBM at act_dtype (the convert fuses into the GEMM's operand
    load), accumulation stays f32, and the output is stored back at
    act_dtype. Halves activation HBM traffic at bf16 — the bottleneck for
    the big no-grad SDF sweeps (see BENCHMARKS.md roofline)."""
    w = p["w"].astype(act_dtype)
    y = jnp.dot(x.astype(act_dtype), w,
                preferred_element_type=jnp.float32) + p["b"]
    return y


def wn_dense_apply_act(p, x, act_dtype):
    """Weight-normed layer with act_dtype activation storage (see
    dense_apply_act); the g*v/||v|| weight materialization stays f32."""
    v, g = p["v"], p["g"]
    col_norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    w = (v * (g[None, :] / jnp.maximum(col_norm, 1e-12))).astype(act_dtype)
    y = jnp.dot(x.astype(act_dtype), w,
                preferred_element_type=jnp.float32) + p["b"]
    return y


def weight_norm_wrap(w: jnp.ndarray, b: jnp.ndarray):
    """Convert a materialized weight into weight-norm params (g = ||w|| cols)."""
    g = jnp.linalg.norm(w, axis=0)
    return {"v": w, "g": g, "b": b}


def wn_dense_apply(p, x):
    v, g = p["v"], p["g"]
    # per-output-unit norm over the input axis
    col_norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
    w = v * (g[None, :] / jnp.maximum(col_norm, 1e-12))
    return jnp.dot(x, w, precision=MATMUL_PRECISION,
                   preferred_element_type=jnp.float32) + p["b"]


def mlp_init(key, dims: Sequence[int], dtype=jnp.float32):
    """Stack of plain dense layers; dims = [d0, d1, ..., dn]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [dense_init(k, dims[i], dims[i + 1], dtype)
            for i, k in enumerate(keys)]


def mlp_apply(params, x, activation=jax.nn.relu, final_activation=None,
              act_dtype=None):
    """act_dtype (e.g. bf16) stores hidden activations at reduced width —
    for stop-gradient sweeps where HBM bandwidth dominates (see
    dense_apply_act)."""
    n = len(params)
    for i, p in enumerate(params):
        x = dense_apply(p, x) if act_dtype is None \
            else dense_apply_act(p, x, act_dtype)
        if i < n - 1:
            x = activation(x)
            if act_dtype is not None:
                x = x.astype(act_dtype)
    if final_activation is not None:
        x = final_activation(x)
    return x


def softplus_beta(x, beta: float = 100.0):
    """Numerically-stable softplus with beta (torch nn.Softplus(beta)).

    torch switches to identity above threshold*beta; logaddexp is stable for
    all x so no explicit threshold is needed.
    """
    return jnp.logaddexp(0.0, beta * x) / beta


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


# ---------------------------------------------------------------------------
# Geometric (sphere) initialization for the SDF MLP. ref:models/fields.py:39-70
# ---------------------------------------------------------------------------

def sdf_geometric_init(key, dims: Sequence[int], skip_in=(4,), d_in_raw: int = 3,
                       bias: float = 0.5, inside_outside: bool = False,
                       multires: int = 6, weight_norm: bool = True,
                       dtype=jnp.float32):
    """Initialize an SDF MLP whose layer-l weight is [dims[l], out_dim] with
    out_dim = dims[l+1] - dims[0] when (l+1) in skip_in.

    The init scheme reproduces the IGR/NeuS "sphere" initialization:
      * last layer: N(±sqrt(pi)/sqrt(fan_in), 1e-4), bias ∓bias
      * first layer with PE: raw-coord columns N(0, sqrt(2)/sqrt(out)),
        PE columns zero, bias 0
      * skip layers with PE: N(0, sqrt(2)/sqrt(out)) but the PE part of the
        concatenated input (last dims[0]-d_in_raw columns) zeroed
      * other layers: N(0, sqrt(2)/sqrt(out)), bias 0
    """
    n_layers = len(dims) - 1
    params = []
    keys = jax.random.split(key, n_layers)
    for l in range(n_layers):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in skip_in else dims[l + 1]
        in_dim = dims[l]
        k = keys[l]
        if l == n_layers - 1:
            mean = math.sqrt(math.pi) / math.sqrt(in_dim)
            if inside_outside:
                mean = -mean
            w = mean + 1e-4 * jax.random.normal(k, (in_dim, out_dim), dtype)
            b = jnp.full((out_dim,), (bias if inside_outside else -bias), dtype)
        elif multires > 0 and l == 0:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w_raw = std * jax.random.normal(k, (d_in_raw, out_dim), dtype)
            w = jnp.concatenate(
                [w_raw, jnp.zeros((in_dim - d_in_raw, out_dim), dtype)], axis=0)
            b = jnp.zeros((out_dim,), dtype)
        elif multires > 0 and l in skip_in:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = std * jax.random.normal(k, (in_dim, out_dim), dtype)
            n_pe = dims[0] - d_in_raw
            # zero the PE part of the skip-concatenated input (its last
            # n_pe rows; the concat is [hidden, embedded_input])
            w = w.at[-n_pe:, :].set(0.0)
            b = jnp.zeros((out_dim,), dtype)
        else:
            std = math.sqrt(2.0) / math.sqrt(out_dim)
            w = std * jax.random.normal(k, (in_dim, out_dim), dtype)
            b = jnp.zeros((out_dim,), dtype)
        if weight_norm:
            params.append(weight_norm_wrap(w, b))
        else:
            params.append({"w": w, "b": b})
    return params
