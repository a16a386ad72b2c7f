"""Fused Pallas TPU kernel: positional encoding + full SDF MLP forward.

Why: the inference-only SDF sweeps dominate sample counts — the hierarchical
up-sampling ladder (ref:renderer.py:425-448), the stage-2 secondary-ray
coarse sweeps (ref:calLvis.py:363-368, ~1M points/step), and the 512^3 mesh
grid fill (ref:renderer.py:14-29, 134M points).  At f32 each MLP layer reads
and writes its [N,256] activation through HBM (arithmetic intensity ~64
FLOP/byte, under the v5e ridge point), so XLA's layer-by-layer execution is
bandwidth-bound.  This kernel keeps the whole network resident in VMEM
(~2.3 MB), computes the frequency encoding in-register, and runs all layers
over a row-block without touching HBM in between — one read of the points,
one write of the outputs.

Scope: FORWARD ONLY (no VJP) — used where the reference runs under
torch.no_grad(); the differentiable path stays in XLA-land where
jax.grad composes (SURVEY.md §7.3 "hard parts").

The kernel is specialized at trace time to the SDFConfig (layer dims, skip
position, multires, scale) — pure-literal shapes, MXU-aligned padding.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from typing import TYPE_CHECKING

if TYPE_CHECKING:                      # avoid a circular import at runtime:
    from ..models.fields import SDFConfig  # cfg is duck-typed below

LANE = 128
BLOCK_ROWS = 1024


# ---------------------------------------------------------------------------
# Hand-counted FLOP accounting for the Pallas kernels.
#
# XLA's cost analysis reports 0 FLOPs for a pallas_call, so the driver bench
# needs an analytic model to keep MFU honest (VERDICT r2 item 1).  Every
# kernel wrapper in this module and ops.pallas_geometry logs
# `padded_rows * matmul_flops_per_row` here at TRACE time; bench.py brackets
# a `.lower()` of the train step with flop_log_start()/flop_log_stop() and
# adds the total to XLA's own count of the remainder.  The model counts MXU
# matmul FLOPs at the PADDED shapes the hardware executes (2 FLOPs/MAC);
# VPU elementwise/transcendental work (PE sin/cos, softplus, sigmoids) is
# excluded, so the total is a slight UNDER-count and MFU a lower bound.
# Valid only for programs whose pallas calls are not inside lax.scan/map
# bodies (trace-once, run-many would undercount) — true of the stage-1 train
# step, asserted by tests/test_pallas_geometry.py::test_flop_model.
_FLOP_LOG = None

# Companion hand-counted HBM byte accounting (VERDICT r3 item 7): XLA's
# "bytes accessed" is likewise 0 for a pallas_call, so bench.py's hbm_frac
# was a lower bound.  Each wrapper logs its analytic HBM traffic at trace
# time: row-streamed blocks count reads of every input block + writes of
# every output block at the PADDED shapes; constant-index blocks (weights,
# accumulated weight-grads) count ONCE per call — Mosaic keeps revisited
# blocks VMEM-resident across the sequential grid, fetching/spilling them a
# single time.  VMEM scratch never touches HBM and is not counted.
_BYTE_LOG = None


def flop_log_start():
    global _FLOP_LOG, _BYTE_LOG
    _FLOP_LOG = []
    _BYTE_LOG = []


def flop_log_stop() -> float:
    """Returns total logged Pallas FLOPs since flop_log_start, and stops."""
    global _FLOP_LOG
    total = float(sum(_FLOP_LOG)) if _FLOP_LOG else 0.0
    _FLOP_LOG = None
    return total


def byte_log_stop() -> float:
    """Returns total logged Pallas HBM bytes since flop_log_start, and
    stops (call after flop_log_stop or standalone)."""
    global _BYTE_LOG
    total = float(sum(_BYTE_LOG)) if _BYTE_LOG else 0.0
    _BYTE_LOG = None
    return total


def log_flops(n: float) -> None:
    if _FLOP_LOG is not None:
        _FLOP_LOG.append(float(n))


def log_bytes(n: float) -> None:
    if _BYTE_LOG is not None:
        _BYTE_LOG.append(float(n))


def on_tpu() -> bool:
    """True when the default backend is a TPU (incl. tunneled plugins)."""
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:                                  # pragma: no cover
        return False
    return "tpu" in plat or "axon" in plat


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def effective_weights(params, cfg: "SDFConfig"):
    """Materialize effective [in,out] weights (+biases) from weight-norm or
    plain layer params — tiny param-space ops done once per call."""
    ws, bs = [], []
    for p in params:
        if "v" in p:
            v, g = p["v"], p["g"]
            col = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            ws.append(v * (g[None, :] / jnp.maximum(col, 1e-12)))
        else:
            ws.append(p["w"])
        bs.append(p["b"])
    return ws, bs


def _pad2(w, rows: int, cols: int):
    return jnp.zeros((rows, cols), w.dtype).at[: w.shape[0], : w.shape[1]].set(w)


def _pad1(b, cols: int):
    return jnp.zeros((cols,), b.dtype).at[: b.shape[0]].set(b)


@functools.lru_cache(maxsize=None)
def _build_kernel(cfg: "SDFConfig", out_dim_padded: int, full_out: bool,
                  bf16_matmul: bool = False):
    """Kernel body closure, specialized to the config's static dims."""
    dims = cfg.dims                       # (d_embed, hidden..., d_out)
    n_layers = len(dims) - 1
    d_raw = cfg.d_in
    d_embed = cfg.d_embed
    d_embed_p = _round_up(d_embed, LANE)
    multires = cfg.multires
    skip_in = cfg.skip_in
    inv_sqrt2 = float(1.0 / np.sqrt(2.0))
    freqs = tuple(float(2.0 ** i) for i in range(multires))

    # per-layer padded in/out dims; note the geometric-init convention: the
    # layer BEFORE a skip outputs dims[l+1] - dims[0] so the concat with the
    # embedding lands exactly back at dims[l] (ref:fields.py:39-44,83-86)
    in_dims, out_dims = [], []
    for l in range(n_layers):
        in_dims.append(_round_up(dims[l], LANE))
        out_dims.append(_round_up(
            dims[l + 1] - (dims[0] if (l + 1) in skip_in else 0), LANE))

    def kernel(pts_ref, *refs):
        w_refs = refs[:n_layers]
        b_refs = refs[n_layers: 2 * n_layers]
        out_ref = refs[2 * n_layers]

        rows = pts_ref.shape[0]
        xyz = pts_ref[:, :d_raw] * cfg.scale            # [B, 3]
        # frequency encoding [x | sin f0 x | cos f0 x | ...], zero-padded to
        # the lane boundary; concatenation only (Pallas TPU has no scatter)
        parts = [xyz]
        for f in freqs:
            parts.append(jnp.sin(xyz * f))
            parts.append(jnp.cos(xyz * f))
        parts.append(jnp.zeros((rows, d_embed_p - d_embed), jnp.float32))
        enc = jnp.concatenate(parts, axis=-1)           # [B, d_embed_p]

        x = enc
        width = d_embed   # logical (unpadded) width of x
        for l in range(n_layers):
            if l in skip_in:
                pad = in_dims[l] - (width + d_embed)
                pieces = [x[:, :width], enc[:, :d_embed]]
                if pad:
                    pieces.append(jnp.zeros((rows, pad), jnp.float32))
                x = jnp.concatenate(pieces, axis=-1) * inv_sqrt2
                width = width + d_embed
            w_in = _round_up(width, LANE)
            if x.shape[1] < w_in:
                x = jnp.concatenate(
                    [x, jnp.zeros((rows, w_in - x.shape[1]), jnp.float32)],
                    axis=-1)
            xa = x[:, :w_in]
            wa = w_refs[l][:w_in, :]
            if bf16_matmul:
                # single-pass MXU: bf16 inputs, f32 accumulation — used for
                # the no-grad sampling sweeps where ~1e-2 sdf error only
                # nudges importance-sample placement
                xa = xa.astype(jnp.bfloat16)
                wa = wa.astype(jnp.bfloat16)
            y = jnp.dot(xa, wa,
                        preferred_element_type=jnp.float32) + b_refs[l][:]
            width_out = dims[l + 1] - (dims[0] if (l + 1) in skip_in else 0)
            if l < n_layers - 1:
                # softplus(beta=100): logaddexp(0, 100 x)/100, stable
                y = jnp.logaddexp(0.0, y * 100.0) * (1.0 / 100.0)
            x = y
            width = width_out
        # rescale the sdf channel (col 0) without scatter: multiply by a
        # per-column constant vector
        col = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1]), 1)
        scale_row = jnp.where(col == 0, 1.0 / cfg.scale, 1.0)
        x = x * scale_row
        if full_out:
            out_ref[:, :] = x[:, :out_dim_padded]
        else:
            out_ref[:, :] = x[:, :LANE]

    return kernel, in_dims, out_dims


def sdf_forward_pallas(params, cfg: "SDFConfig", pts: jnp.ndarray,
                       full_out: bool = False, bf16_matmul: bool = False,
                       block_rows: int = BLOCK_ROWS) -> jnp.ndarray:
    """Fused forward. pts [N,3] -> sdf [N] (full_out=False) or
    [N, d_out] (full_out=True).

    Gradient semantics: STOP-GRADIENT by construction — a custom zero-tangent
    JVP lets the kernel sit inside functions being differentiated (the
    no-grad sampling sweeps run inside jax.grad'd train steps; the reference
    wraps the same sweeps in torch.no_grad, ref:renderer.py:426).
    """
    N = pts.shape[0]
    n_pad = _round_up(max(N, 8), block_rows)
    pts_p = jnp.zeros((n_pad, LANE), jnp.float32).at[:N, :3].set(pts)

    out_dim_padded = _round_up(cfg.d_out, LANE)
    kernel, in_dims, out_dims = _build_kernel(cfg, out_dim_padded, full_out,
                                              bf16_matmul)

    ws, bs = effective_weights(params, cfg)
    ws_p = [_pad2(w, in_dims[l], out_dims[l]) for l, w in enumerate(ws)]
    bs_p = [_pad1(b, out_dims[l])[None, :] for l, b in enumerate(bs)]

    out_cols = out_dim_padded if full_out else LANE
    grid = (n_pad // block_rows,)

    in_specs = [pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for w in ws_p:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    for b in bs_p:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    def call_kernel(pts_in, ws_in, bs_in):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_rows, out_cols), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, out_cols), jnp.float32),
            # interpret off-TPU, like the pallas_geometry/radiance kernels:
            # use_pallas_sampling=True must run (slowly) on CPU/GPU hosts
            # rather than fail Mosaic lowering
            interpret=not on_tpu(),
        )(pts_in, *ws_in, *bs_in)

    # explicit stop-gradient semantics: zero tangents so the kernel is
    # traceable under jax.grad / jax.linearize
    wrapped = jax.custom_jvp(call_kernel)

    @wrapped.defjvp
    def _zero_jvp(primals, tangents):
        out = call_kernel(*primals)
        return out, jnp.zeros_like(out)

    # 2 FLOPs/MAC over the padded per-layer matmuls, all rows
    log_flops(n_pad * 2.0 * sum(i * o for i, o in zip(in_dims, out_dims)))
    # HBM bytes: read x block-stream, write out block-stream, params once
    log_bytes(4.0 * (n_pad * (LANE + out_cols)
                     + sum(i * o + o for i, o in zip(in_dims, out_dims))))
    out = wrapped(pts_p, tuple(ws_p), tuple(bs_p))

    if full_out:
        return out[:N, : cfg.d_out]
    return out[:N, 0]
