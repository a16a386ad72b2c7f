"""Fused Pallas TPU kernels for the differentiable geometry core.

The stage-1 hot loop evaluates, per sample point: PE -> SDF MLP ->
(sdf | feature) AND the input-gradient of the sdf (surface normals +
eikonal), then backpropagates through all of it (the reference pays a
forward plus an autograd double-backprop, ref:models/renderer.py:238-252).
The XLA version is HBM-bandwidth-bound: every layer's activations and vjp
residuals round-trip HBM (BENCHMARKS.md roofline: MFU pinned ~12-13%, HBM
frac ~1.0 at every batch size).

These kernels keep the entire computation VMEM-resident per row-block:

* fwd — one pass computing out=[sdf|feat] and grad=dsdf/dx. The gradient
  is an in-kernel reverse sweep (cotangent e1) over pre-activations held in
  VMEM scratch. HBM traffic: read x, write (out, grad).
* bwd — given cotangents (ct_out, ct_grad), recomputes the forward in VMEM
  (fused remat) plus a forward-mode tangent seeded with ct_grad, then
  reverse-sweeps BOTH chains. This is reverse-over-forward: the
  Hessian-vector term d/d{x,W}[grad . ct_grad] is the reverse of the JVP
  along ct_grad, because grad . ct_grad = D_{ct_grad}(sdf). Weight/bias
  gradients accumulate in the sequential grid's revisited output blocks.
  HBM traffic: read (x, ct_out, ct_grad), write ct_x + one [in,out] grad
  per layer.

The custom_vjp is defined over EFFECTIVE weights [in,out] (+biases); the
weight-norm (g, v) chain stays in XLA param-space ops so jax.grad composes
(ops.pallas_sdf.effective_weights). Math parity: fields.sdf_apply /
sdf_value_and_grad_feat (softplus beta=100, skip concat / sqrt(2), PE
ordering [x, sin f0 x, cos f0 x, ...], cfg.scale; ref:models/fields.py:
74-111). Equivalence is asserted by tests/test_pallas_geometry.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sdf import (LANE, _pad1, _pad2, _round_up, effective_weights,
                         log_bytes, log_flops, on_tpu)

import os as _os

# Backward (fwd+bwd pipeline) row block.  512 beats 256 by ~1.7% on the
# kernel microbench and ~2.3% end-to-end stage-1 (evidence/
# geom_kernel_sweep.jsonl, r5 rows) once the scoped-VMEM budget below makes
# it admissible; 1024 regresses (VMEM pressure crowds the double-buffer).
BLOCK_ROWS = int(_os.environ.get("FNEUS_PG_BLOCK", "512"))

# Mosaic scoped-VMEM budget (MiB) for these kernels.  The backend's default
# 16 MiB scoped-vmem limit rejects fwd row blocks >= 1024 at COMPILE time
# (evidence/geom_kernel_sweep.jsonl: "Scoped allocation ... exceeded scoped
# vmem limit") even though v5e has 128 MiB physical VMEM per core; raising
# the per-kernel limit makes larger blocks admissible so the block sweep
# measures hardware, not a compiler default.  0 = keep the backend default.
VMEM_LIMIT_MB = int(_os.environ.get("FNEUS_PG_VMEM_MB", "64"))


def _dims(cfg):
    dims = cfg.dims
    L = len(dims) - 1
    ins, outs = [], []
    for l in range(L):
        ins.append(dims[l])
        outs.append(dims[l + 1] - (dims[0] if (l + 1) in cfg.skip_in else 0))
    return dims, ins, outs, L


def _mm_fns(bf16: bool):
    mm = jnp.bfloat16 if bf16 else jnp.float32

    def dot(a, b):
        return jnp.dot(a.astype(mm), b.astype(mm),
                       preferred_element_type=jnp.float32)

    def dot_bt(a, b):   # a @ b.T
        return jax.lax.dot_general(
            a.astype(mm), b.astype(mm), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dot_at(a, b):   # a.T @ b
        return jax.lax.dot_general(
            a.astype(mm), b.astype(mm), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return dot, dot_bt, dot_at


@functools.lru_cache(maxsize=None)
def _specialize(cfg, bf16: bool):
    """Closure constants + the shared primal/tangent/reverse sweep pieces."""
    dims, ins, outs, L = _dims(cfg)
    d_embed, d_raw = cfg.d_embed, cfg.d_in
    EP = _round_up(d_embed, LANE)
    OP = _round_up(dims[-1], LANE)
    ins_p = tuple(_round_up(d, LANE) for d in ins)
    outs_p = tuple(_round_up(d, LANE) for d in outs)
    MAXW = max(outs_p)
    skip = frozenset(cfg.skip_in)
    freqs = tuple(float(2.0 ** i) for i in range(cfg.multires))
    inv_sqrt2 = float(1.0 / np.sqrt(2.0))
    scale = float(cfg.scale)
    dot, dot_bt, dot_at = _mm_fns(bf16)

    def encode(xyz, tangent_v=None):
        """PE of u (+ its tangent along v). Returns padded [B, EP]."""
        B = xyz.shape[0]
        zpad = jnp.zeros((B, EP - d_embed), jnp.float32)
        parts = [xyz]
        dparts = [tangent_v] if tangent_v is not None else None
        for f in freqs:
            us = xyz * f
            s, c = jnp.sin(us), jnp.cos(us)
            parts += [s, c]
            if dparts is not None:
                dparts += [c * (f * tangent_v), -s * (f * tangent_v)]
        enc = jnp.concatenate(parts + [zpad], -1)
        if dparts is None:
            return enc, None
        return enc, jnp.concatenate(dparts + [zpad], -1)

    def cat_skip(t, e, l, B):
        """Skip concat in the padded layout: [h | e | zero-pad] / sqrt(2)."""
        width = ins[l] - d_embed
        pieces = [t[:, :width], e[:, :d_embed]]
        pad = ins_p[l] - ins[l]
        if pad:
            pieces.append(jnp.zeros((B, pad), jnp.float32))
        return jnp.concatenate(pieces, -1) * inv_sqrt2

    def pe_backward(xyz, r_enc, r_denc=None, v=None):
        """Cotangent of u from cotangents of enc (and of its tangent)."""
        ct_u = r_enc[:, :d_raw]
        if r_denc is not None:
            ct_u = ct_u + 0.0 * r_denc[:, :d_raw]     # d(v)/du = 0
        off = d_raw
        for f in freqs:
            us = xyz * f
            s, c = jnp.sin(us), jnp.cos(us)
            ct_u = ct_u + f * (r_enc[:, off:off + d_raw] * c
                               - r_enc[:, off + d_raw:off + 2 * d_raw] * s)
            if r_denc is not None:
                fv = f * v
                # d/du [ f v cos(fu) ] = -f^2 v sin(fu); d/du [ -f v sin ] =
                # -f^2 v cos
                ct_u = ct_u - f * fv * (
                    r_denc[:, off:off + d_raw] * s
                    + r_denc[:, off + d_raw:off + 2 * d_raw] * c)
            off += 2 * d_raw
        return ct_u

    consts = dict(dims=dims, ins=ins, outs=outs, L=L, d_embed=d_embed,
                  d_raw=d_raw, EP=EP, OP=OP, ins_p=ins_p, outs_p=outs_p,
                  MAXW=MAXW, skip=skip, freqs=freqs, inv_sqrt2=inv_sqrt2,
                  scale=scale, dot=dot, dot_bt=dot_bt, dot_at=dot_at,
                  encode=encode, cat_skip=cat_skip, pe_backward=pe_backward)
    return consts


@functools.lru_cache(maxsize=None)
def _build_fwd_kernel(cfg, bf16: bool):
    C = _specialize(cfg, bf16)
    L, skip = C["L"], C["skip"]
    d_raw, d_embed = C["d_raw"], C["d_embed"]
    ins, outs, ins_p, outs_p = C["ins"], C["outs"], C["ins_p"], C["outs_p"]
    EP, OP, scale = C["EP"], C["OP"], C["scale"]
    dot, dot_bt = C["dot"], C["dot_bt"]
    encode, cat_skip, pe_backward = (C["encode"], C["cat_skip"],
                                     C["pe_backward"])

    def kernel(pts_ref, *refs):
        w_refs = refs[:L]
        b_refs = refs[L:2 * L]
        out_ref, grad_ref = refs[2 * L], refs[2 * L + 1]
        a_s = refs[2 * L + 2]                       # [L, B, MAXW]

        B = pts_ref.shape[0]
        xyz = pts_ref[:, :d_raw] * scale
        enc, _ = encode(xyz)

        # ---- forward, stashing pre-activations ---------------------------
        x = enc
        for l in range(L):
            if l in skip:
                x = cat_skip(x, enc, l, B)
            a = dot(x[:, :ins_p[l]], w_refs[l][:, :]) + b_refs[l][0, :]
            a_s[l, :, :outs_p[l]] = a
            x = jnp.logaddexp(0.0, a * 100.0) * 0.01 if l < L - 1 else a
        col = jax.lax.broadcasted_iota(jnp.int32, (B, OP), 1)
        out_ref[:, :] = x * jnp.where(col == 0, 1.0 / scale, 1.0)

        # ---- reverse sweep with cotangent e1/scale -> dsdf/dx ------------
        r = jnp.where(col == 0, 1.0 / scale, 0.0)   # [B, OP]
        r_enc = jnp.zeros((B, EP), jnp.float32)
        for l in range(L - 1, -1, -1):
            r_in = dot_bt(r[:, :outs_p[l]], w_refs[l][:, :])   # [B, ins_p]
            if l in skip:
                r_in = r_in * C["inv_sqrt2"]
                hw = ins[l] - d_embed
                r_enc = r_enc + jnp.concatenate(
                    [r_in[:, hw:ins[l]],
                     jnp.zeros((B, EP - d_embed), jnp.float32)], -1)
                colw = jax.lax.broadcasted_iota(jnp.int32, r_in.shape, 1)
                r_in = jnp.where(colw < hw, r_in, 0.0)
            if l == 0:
                r_enc = r_enc + r_in[:, :EP]
            else:
                sig = jax.nn.sigmoid(100.0 * a_s[l - 1, :, :outs_p[l - 1]])
                r = r_in[:, :outs_p[l - 1]] * sig
        ct_u = pe_backward(xyz, r_enc)
        g = ct_u * scale
        grad_ref[:, :] = jnp.concatenate(
            [g, jnp.zeros((B, LANE - d_raw), jnp.float32)], -1)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_fwd_kernel_stashing(cfg, bf16: bool):
    """Forward kernel that ALSO writes its pre-activations to HBM as bf16
    (one [B, L*MAXW] output), so the backward can skip the primal-forward
    recompute (VERDICT r4 experiment: trade 2S of the bwd's 12S matmul
    FLOPs for ~2 bytes/act of HBM traffic each way).  Math identical to
    _build_fwd_kernel; the stash is a side output."""
    C = _specialize(cfg, bf16)
    L, skip = C["L"], C["skip"]
    d_raw, d_embed = C["d_raw"], C["d_embed"]
    ins, outs, ins_p, outs_p = C["ins"], C["outs"], C["ins_p"], C["outs_p"]
    EP, OP, MAXW, scale = C["EP"], C["OP"], C["MAXW"], C["scale"]
    dot, dot_bt = C["dot"], C["dot_bt"]
    encode, cat_skip, pe_backward = (C["encode"], C["cat_skip"],
                                     C["pe_backward"])

    def kernel(pts_ref, *refs):
        w_refs = refs[:L]
        b_refs = refs[L:2 * L]
        out_ref, grad_ref, stash_ref = (refs[2 * L], refs[2 * L + 1],
                                        refs[2 * L + 2])
        a_s = refs[2 * L + 3]                       # [L, B, MAXW] scratch

        B = pts_ref.shape[0]
        xyz = pts_ref[:, :d_raw] * scale
        enc, _ = encode(xyz)

        x = enc
        for l in range(L):
            if l in skip:
                x = cat_skip(x, enc, l, B)
            a = dot(x[:, :ins_p[l]], w_refs[l][:, :]) + b_refs[l][0, :]
            a_s[l, :, :outs_p[l]] = a
            pad = MAXW - outs_p[l]
            row = a if not pad else jnp.concatenate(
                [a, jnp.zeros((B, pad), jnp.float32)], -1)
            stash_ref[:, l * MAXW:(l + 1) * MAXW] = row.astype(jnp.bfloat16)
            x = jnp.logaddexp(0.0, a * 100.0) * 0.01 if l < L - 1 else a
        col = jax.lax.broadcasted_iota(jnp.int32, (B, OP), 1)
        out_ref[:, :] = x * jnp.where(col == 0, 1.0 / scale, 1.0)

        r = jnp.where(col == 0, 1.0 / scale, 0.0)
        r_enc = jnp.zeros((B, EP), jnp.float32)
        for l in range(L - 1, -1, -1):
            r_in = dot_bt(r[:, :outs_p[l]], w_refs[l][:, :])
            if l in skip:
                r_in = r_in * C["inv_sqrt2"]
                hw = ins[l] - d_embed
                r_enc = r_enc + jnp.concatenate(
                    [r_in[:, hw:ins[l]],
                     jnp.zeros((B, EP - d_embed), jnp.float32)], -1)
                colw = jax.lax.broadcasted_iota(jnp.int32, r_in.shape, 1)
                r_in = jnp.where(colw < hw, r_in, 0.0)
            if l == 0:
                r_enc = r_enc + r_in[:, :EP]
            else:
                sig = jax.nn.sigmoid(100.0 * a_s[l - 1, :, :outs_p[l - 1]])
                r = r_in[:, :outs_p[l - 1]] * sig
        ct_u = pe_backward(xyz, r_enc)
        g = ct_u * scale
        grad_ref[:, :] = jnp.concatenate(
            [g, jnp.zeros((B, LANE - d_raw), jnp.float32)], -1)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_bwd_kernel_from_stash(cfg, bf16: bool):
    """Backward that reads the fwd's bf16 pre-activation stash instead of
    recomputing the primal forward: per layer, ONE tangent-forward dot
    (B rows) + the two stacked reverse dots (2B rows) => 10S FLOPs/row vs
    the full-remat stacked kernel's 12S.  Primal quantities (h, sigmoids)
    are reconstructed from the bf16 stash — the same deviation class as the
    core_act_bf16 residual default (bf16 rounding of pre-activations)."""
    C = _specialize(cfg, bf16)
    L, skip = C["L"], C["skip"]
    d_raw, d_embed = C["d_raw"], C["d_embed"]
    ins, outs, ins_p, outs_p = C["ins"], C["outs"], C["ins_p"], C["outs_p"]
    EP, OP, MAXW, scale = C["EP"], C["OP"], C["MAXW"], C["scale"]
    dot, dot_bt, dot_at = C["dot"], C["dot_bt"], C["dot_at"]
    encode, cat_skip, pe_backward = (C["encode"], C["cat_skip"],
                                     C["pe_backward"])
    inv_sqrt2 = C["inv_sqrt2"]

    def layer_input(l, h, enc, B):
        return cat_skip(h, enc, l, B) if l in skip else h

    def kernel(pts_ref, ct_out_ref, ct_g_ref, stash_ref, *refs):
        w_refs = refs[:L]
        b_refs = refs[L:2 * L]                      # noqa: F841 (unused:
        ctx_ref = refs[2 * L]                       # biases live in stash)
        ctw_refs = refs[2 * L + 1: 3 * L + 1]
        ctb_refs = refs[3 * L + 1: 4 * L + 1]
        ad_s = refs[4 * L + 1]                      # [L, B, MAXW] tangent

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for l in range(L):
                ctw_refs[l][:, :] = jnp.zeros_like(ctw_refs[l])
                ctb_refs[l][:, :] = jnp.zeros_like(ctb_refs[l])

        B = pts_ref.shape[0]
        xyz = pts_ref[:, :d_raw] * scale
        v = ct_g_ref[:, :d_raw] * scale
        enc, denc = encode(xyz, v)

        def stash_a(l):
            return stash_ref[:, l * MAXW: l * MAXW + outs_p[l]].astype(
                jnp.float32)

        # ---- tangent-only forward (primal comes from the stash) ----------
        xd = denc
        for l in range(L):
            if l in skip:
                xd = cat_skip(xd, denc, l, B)
            ad = dot(xd[:, :ins_p[l]], w_refs[l][:, :])
            ad_s[l, :, :outs_p[l]] = ad
            if l < L - 1:
                xd = jax.nn.sigmoid(100.0 * stash_a(l)) * ad

        # ---- reverse over (primal, tangent), stacked dots ----------------
        col = jax.lax.broadcasted_iota(jnp.int32, (B, OP), 1)
        colscale = jnp.where(col == 0, 1.0 / scale, 1.0)
        r = ct_out_ref[:, :] * colscale
        rd = jnp.where(col == 0, 1.0 / scale, 0.0)
        r_enc = jnp.zeros((B, EP), jnp.float32)
        r_denc = jnp.zeros((B, EP), jnp.float32)
        for l in range(L - 1, -1, -1):
            if l == 0:
                x_l, xd_l = enc, denc
            else:
                a_prev = stash_a(l - 1)
                sig_prev = jax.nn.sigmoid(100.0 * a_prev)
                h_prev = jnp.logaddexp(0.0, a_prev * 100.0) * 0.01
                hd_prev = sig_prev * ad_s[l - 1, :, :outs_p[l - 1]]
                x_l = layer_input(l, h_prev, enc, B)
                xd_l = layer_input(l, hd_prev, denc, B)
            X2 = jnp.concatenate([x_l[:, :ins_p[l]], xd_l[:, :ins_p[l]]], 0)
            R2 = jnp.concatenate([r[:, :outs_p[l]], rd[:, :outs_p[l]]], 0)
            ctw_refs[l][:, :] += dot_at(X2, R2)
            ctb_refs[l][:, :] += jnp.sum(r[:, :outs_p[l]], axis=0,
                                         keepdims=True)
            R_in = dot_bt(R2, w_refs[l][:, :])
            r_in, rd_in = R_in[:B], R_in[B:]
            if l in skip:
                r_in = r_in * inv_sqrt2
                rd_in = rd_in * inv_sqrt2
                hw = ins[l] - d_embed
                zp = jnp.zeros((B, EP - d_embed), jnp.float32)
                r_enc = r_enc + jnp.concatenate([r_in[:, hw:ins[l]], zp], -1)
                r_denc = r_denc + jnp.concatenate([rd_in[:, hw:ins[l]], zp],
                                                  -1)
                colw = jax.lax.broadcasted_iota(jnp.int32, r_in.shape, 1)
                r_in = jnp.where(colw < hw, r_in, 0.0)
                rd_in = jnp.where(colw < hw, rd_in, 0.0)
            if l == 0:
                r_enc = r_enc + r_in[:, :EP]
                r_denc = r_denc + rd_in[:, :EP]
            else:
                a_prev = stash_a(l - 1)
                ad_prev = ad_s[l - 1, :, :outs_p[l - 1]]
                sig = jax.nn.sigmoid(100.0 * a_prev)
                dsig = 100.0 * sig * (1.0 - sig)
                r_h = r_in[:, :outs_p[l - 1]]
                rd_h = rd_in[:, :outs_p[l - 1]]
                r = r_h * sig + rd_h * dsig * ad_prev
                rd = rd_h * sig
        ct_u = pe_backward(xyz, r_enc, r_denc, v)
        ct_x = ct_u * scale
        ctx_ref[:, :] = jnp.concatenate(
            [ct_x, jnp.zeros((B, LANE - d_raw), jnp.float32)], -1)

    return kernel


@functools.lru_cache(maxsize=None)
def _build_bwd_kernel_stacked(cfg, bf16: bool):
    """Backward kernel over ROW-STACKED (primal; tangent) tensors.

    Same math as _build_bwd_kernel, but every per-layer pair of matmuls
    (primal+tangent forward dots, the two weight-grad dot_at's, the two
    input-cotangent dot_bt's) collapses into ONE matmul over [2B, .]
    stacked rows — 3 MXU launches per layer instead of 6 at twice the rows,
    which pipelines better through the serialized layer chain (the
    BENCHMARKS.md-profiled limiter).  Only the activation nonlinearity and
    its backward mix the two halves, handled by static half-slices.

    Weight-grad identity: [X;Xd]^T @ [R;Rd] = X^T R + Xd^T Rd — the stacked
    dot_at IS the accumulated pair.
    """
    C = _specialize(cfg, bf16)
    L, skip = C["L"], C["skip"]
    d_raw, d_embed = C["d_raw"], C["d_embed"]
    ins, outs, ins_p, outs_p = C["ins"], C["outs"], C["ins_p"], C["outs_p"]
    EP, OP, scale = C["EP"], C["OP"], C["scale"]
    dot, dot_bt, dot_at = C["dot"], C["dot_bt"], C["dot_at"]
    encode, cat_skip, pe_backward = (C["encode"], C["cat_skip"],
                                     C["pe_backward"])
    inv_sqrt2 = C["inv_sqrt2"]

    def layer_input(l, h, enc2, B2):
        """Padded input of layer l given post-activation h; uniform on
        stacked rows (enc2 is the stacked [enc; denc])."""
        return cat_skip(h, enc2, l, B2) if l in skip else h

    def kernel(pts_ref, ct_out_ref, ct_g_ref, *refs):
        w_refs = refs[:L]
        b_refs = refs[L:2 * L]
        ctx_ref = refs[2 * L]
        ctw_refs = refs[2 * L + 1: 3 * L + 1]
        ctb_refs = refs[3 * L + 1: 4 * L + 1]
        A_s = refs[4 * L + 1]               # [L, 2B, MAXW] stacked a|ad

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for l in range(L):
                ctw_refs[l][:, :] = jnp.zeros_like(ctw_refs[l])
                ctb_refs[l][:, :] = jnp.zeros_like(ctb_refs[l])

        B = pts_ref.shape[0]
        B2 = 2 * B
        xyz = pts_ref[:, :d_raw] * scale
        v = ct_g_ref[:, :d_raw] * scale     # tangent of u = scale*x
        enc, denc = encode(xyz, v)
        enc2 = jnp.concatenate([enc, denc], 0)          # [2B, EP]

        # ---- forward: stacked primal|tangent, stash pre-activations ------
        X = enc2
        for l in range(L):
            if l in skip:
                X = cat_skip(X, enc2, l, B2)
            A = dot(X[:, :ins_p[l]], w_refs[l][:, :])
            A = A + b_refs[l][0, :] * _top_mask(B2, A.shape[1])
            A_s[l, :, :outs_p[l]] = A
            if l < L - 1:
                a, ad = A[:B], A[B:]
                sig = jax.nn.sigmoid(100.0 * a)
                X = jnp.concatenate(
                    [jnp.logaddexp(0.0, a * 100.0) * 0.01, sig * ad], 0)
            else:
                X = A

        # ---- reverse over the stacked chains -----------------------------
        col = jax.lax.broadcasted_iota(jnp.int32, (B, OP), 1)
        colscale = jnp.where(col == 0, 1.0 / scale, 1.0)
        R = jnp.concatenate(
            [ct_out_ref[:, :] * colscale,               # cot of a_{L-1}
             jnp.where(col == 0, 1.0 / scale, 0.0)], 0)  # cot of ad_{L-1}
        R_ENC = jnp.zeros((B2, EP), jnp.float32)
        for l in range(L - 1, -1, -1):
            # layer-l input (recomputed from stashed pre-activations)
            if l == 0:
                X_l = enc2
            else:
                A_prev = A_s[l - 1, :, :outs_p[l - 1]]
                a_prev, ad_prev = A_prev[:B], A_prev[B:]
                sig_prev = jax.nn.sigmoid(100.0 * a_prev)
                H = jnp.concatenate(
                    [jnp.logaddexp(0.0, a_prev * 100.0) * 0.01,
                     sig_prev * ad_prev], 0)
                X_l = layer_input(l, H, enc2, B2)
            # param grads: one stacked dot_at == dot_at(x,r)+dot_at(xd,rd)
            ctw_refs[l][:, :] += dot_at(X_l[:, :ins_p[l]], R[:, :outs_p[l]])
            ctb_refs[l][:, :] += jnp.sum(R[:B, :outs_p[l]], axis=0,
                                         keepdims=True)
            # input cotangents, both chains in one dot_bt
            R_in = dot_bt(R[:, :outs_p[l]], w_refs[l][:, :])
            if l in skip:
                R_in = R_in * inv_sqrt2
                hw = ins[l] - d_embed
                zp = jnp.zeros((B2, EP - d_embed), jnp.float32)
                R_ENC = R_ENC + jnp.concatenate([R_in[:, hw:ins[l]], zp], -1)
                colw = jax.lax.broadcasted_iota(jnp.int32, R_in.shape, 1)
                R_in = jnp.where(colw < hw, R_in, 0.0)
            if l == 0:
                R_ENC = R_ENC + R_in[:, :EP]
            else:
                A_prev = A_s[l - 1, :, :outs_p[l - 1]]
                a_prev, ad_prev = A_prev[:B], A_prev[B:]
                sig = jax.nn.sigmoid(100.0 * a_prev)
                dsig = 100.0 * sig * (1.0 - sig)
                r_h = R_in[:B, :outs_p[l - 1]]
                rd_h = R_in[B:, :outs_p[l - 1]]
                # h = sp(a): dh/da = sig ; hd = sig*ad:
                #   d(hd)/da = 100 sig (1-sig) ad, d(hd)/d(ad) = sig
                R = jnp.concatenate(
                    [r_h * sig + rd_h * dsig * ad_prev, rd_h * sig], 0)
        ct_u = pe_backward(xyz, R_ENC[:B], R_ENC[B:], v)
        ct_x = ct_u * scale
        ctx_ref[:, :] = jnp.concatenate(
            [ct_x, jnp.zeros((B, LANE - d_raw), jnp.float32)], -1)

    return kernel


def _top_mask(rows2, cols):
    """[2B, cols] mask: 1.0 on the top (primal) half rows, 0.0 below —
    biases apply to the primal forward only."""
    row = jax.lax.broadcasted_iota(jnp.int32, (rows2, cols), 0)
    return jnp.where(row < rows2 // 2, 1.0, 0.0)


@functools.lru_cache(maxsize=None)
def _build_bwd_kernel(cfg, bf16: bool):
    C = _specialize(cfg, bf16)
    L, skip = C["L"], C["skip"]
    d_raw, d_embed = C["d_raw"], C["d_embed"]
    ins, outs, ins_p, outs_p = C["ins"], C["outs"], C["ins_p"], C["outs_p"]
    EP, OP, scale = C["EP"], C["OP"], C["scale"]
    dot, dot_bt, dot_at = C["dot"], C["dot_bt"], C["dot_at"]
    encode, cat_skip, pe_backward = (C["encode"], C["cat_skip"],
                                     C["pe_backward"])
    inv_sqrt2 = C["inv_sqrt2"]

    def layer_input(l, h, enc, B):
        """Padded input of layer l given post-activation h of layer l-1."""
        return cat_skip(h, enc, l, B) if l in skip else h

    def kernel(pts_ref, ct_out_ref, ct_g_ref, *refs):
        w_refs = refs[:L]
        b_refs = refs[L:2 * L]
        ctx_ref = refs[2 * L]
        ctw_refs = refs[2 * L + 1: 3 * L + 1]
        ctb_refs = refs[3 * L + 1: 4 * L + 1]
        a_s = refs[4 * L + 1]                       # [L, B, MAXW] primal
        ad_s = refs[4 * L + 2]                      # [L, B, MAXW] tangent

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for l in range(L):
                ctw_refs[l][:, :] = jnp.zeros_like(ctw_refs[l])
                ctb_refs[l][:, :] = jnp.zeros_like(ctb_refs[l])

        B = pts_ref.shape[0]
        xyz = pts_ref[:, :d_raw] * scale
        v = ct_g_ref[:, :d_raw] * scale             # tangent of u = scale*x
        enc, denc = encode(xyz, v)

        # ---- forward: primal + tangent, stash pre-activations ------------
        x, xd = enc, denc
        for l in range(L):
            if l in skip:
                x = cat_skip(x, enc, l, B)
                xd = cat_skip(xd, denc, l, B)
            a = dot(x[:, :ins_p[l]], w_refs[l][:, :]) + b_refs[l][0, :]
            ad = dot(xd[:, :ins_p[l]], w_refs[l][:, :])
            a_s[l, :, :outs_p[l]] = a
            ad_s[l, :, :outs_p[l]] = ad
            if l < L - 1:
                sig = jax.nn.sigmoid(100.0 * a)
                x = jnp.logaddexp(0.0, a * 100.0) * 0.01
                xd = sig * ad
            else:
                x, xd = a, ad

        # ---- reverse over (primal, tangent) -------------------------------
        col = jax.lax.broadcasted_iota(jnp.int32, (B, OP), 1)
        colscale = jnp.where(col == 0, 1.0 / scale, 1.0)
        r = ct_out_ref[:, :] * colscale              # cot of a_{L-1}
        rd = jnp.where(col == 0, 1.0 / scale, 0.0)   # cot of ad_{L-1}
        r_enc = jnp.zeros((B, EP), jnp.float32)
        r_denc = jnp.zeros((B, EP), jnp.float32)
        for l in range(L - 1, -1, -1):
            # layer-l input (recomputed from stashed pre-activations)
            if l == 0:
                x_l, xd_l = enc, denc
            else:
                a_prev = a_s[l - 1, :, :outs_p[l - 1]]
                sig_prev = jax.nn.sigmoid(100.0 * a_prev)
                h_prev = jnp.logaddexp(0.0, a_prev * 100.0) * 0.01
                hd_prev = sig_prev * ad_s[l - 1, :, :outs_p[l - 1]]
                x_l = layer_input(l, h_prev, enc, B)
                xd_l = layer_input(l, hd_prev, denc, B)
            # param grads (padded-row garbage is sliced off outside)
            ctw_refs[l][:, :] += (dot_at(x_l[:, :ins_p[l]], r[:, :outs_p[l]])
                                  + dot_at(xd_l[:, :ins_p[l]],
                                           rd[:, :outs_p[l]]))
            ctb_refs[l][:, :] += jnp.sum(r[:, :outs_p[l]], axis=0,
                                         keepdims=True)
            # input cotangents
            r_in = dot_bt(r[:, :outs_p[l]], w_refs[l][:, :])
            rd_in = dot_bt(rd[:, :outs_p[l]], w_refs[l][:, :])
            if l in skip:
                r_in = r_in * inv_sqrt2
                rd_in = rd_in * inv_sqrt2
                hw = ins[l] - d_embed
                zp = jnp.zeros((B, EP - d_embed), jnp.float32)
                r_enc = r_enc + jnp.concatenate([r_in[:, hw:ins[l]], zp], -1)
                r_denc = r_denc + jnp.concatenate([rd_in[:, hw:ins[l]], zp],
                                                  -1)
                colw = jax.lax.broadcasted_iota(jnp.int32, r_in.shape, 1)
                r_in = jnp.where(colw < hw, r_in, 0.0)
                rd_in = jnp.where(colw < hw, rd_in, 0.0)
            if l == 0:
                r_enc = r_enc + r_in[:, :EP]
                r_denc = r_denc + rd_in[:, :EP]
            else:
                a_prev = a_s[l - 1, :, :outs_p[l - 1]]
                ad_prev = ad_s[l - 1, :, :outs_p[l - 1]]
                sig = jax.nn.sigmoid(100.0 * a_prev)
                dsig = 100.0 * sig * (1.0 - sig)
                r_h = r_in[:, :outs_p[l - 1]]
                rd_h = rd_in[:, :outs_p[l - 1]]
                # h = sp(a): dh/da = sig ; hd = sig*ad:
                #   d(hd)/da = 100 sig (1-sig) ad, d(hd)/d(ad) = sig
                r = r_h * sig + rd_h * dsig * ad_prev
                rd = rd_h * sig
        ct_u = pe_backward(xyz, r_enc, r_denc, v)
        ct_x = ct_u * scale
        ctx_ref[:, :] = jnp.concatenate(
            [ct_x, jnp.zeros((B, LANE - d_raw), jnp.float32)], -1)

    return kernel


# ---------------------------------------------------------------------------
# Host-side wrappers + custom VJP
# ---------------------------------------------------------------------------

def _interpret() -> bool:
    return not on_tpu()


def _compiler_params():
    """Per-kernel Mosaic params: raised scoped-VMEM budget (see
    VMEM_LIMIT_MB).  None in interpret mode / when disabled."""
    if _interpret() or VMEM_LIMIT_MB <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_MB * 2 ** 20)


@functools.lru_cache(maxsize=None)
def _make_geom(cfg, bf16: bool, block_rows: int, stacked: bool = True,
               fwd_block_rows: "int | None" = None, stash: bool = False):
    """Returns f(ws, bs, x) -> (out [N,d_out], grad [N,3]) with custom VJP.
    ws/bs are the UNPADDED effective per-layer weights/biases.

    fwd_block_rows decouples the forward kernel's row block from the
    backward's: the bwd VMEM budget (stacked [L,2B,MAXW] stash) caps B at
    256, but the fwd stash is half that, so the fwd can afford larger
    blocks (longer matmuls amortize the serialized layer chain's per-matmul
    pipeline latency — the measured limiter, BENCHMARKS.md).

    stash=True: the fwd writes its pre-activations to HBM (bf16) and the
    bwd reads them instead of recomputing the primal forward — 10S vs 12S
    bwd FLOPs at ~2x(2 bytes/act) extra HBM traffic (VERDICT r4 item 3
    experiment).  Implies fwd and bwd share block_rows (the stash array's
    row padding must line up)."""
    C = _specialize(cfg, bf16)
    L = C["L"]
    ins_p, outs_p, OP, MAXW = C["ins_p"], C["outs_p"], C["OP"], C["MAXW"]
    d_out = C["dims"][-1]
    if stash:
        fwd_block_rows = None           # shared row padding (see docstring)
        fwd_kernel = _build_fwd_kernel_stashing(cfg, bf16)
        bwd_kernel = _build_bwd_kernel_from_stash(cfg, bf16)
        bwd_scratch = [pltpu.VMEM((L, block_rows, MAXW), jnp.float32)]
    else:
        fwd_kernel = _build_fwd_kernel(cfg, bf16)
        bwd_kernel = (_build_bwd_kernel_stacked(cfg, bf16) if stacked
                      else _build_bwd_kernel(cfg, bf16))
        bwd_scratch = ([pltpu.VMEM((L, 2 * block_rows, MAXW), jnp.float32)]
                       if stacked else
                       [pltpu.VMEM((L, block_rows, MAXW), jnp.float32),
                        pltpu.VMEM((L, block_rows, MAXW), jnp.float32)])
    # hand-counted MXU matmul FLOPs per padded row (see pallas_sdf FLOP
    # accounting).  S = sum of per-layer padded MAC counts; the fwd kernel
    # runs 2 matmul sweeps/row (forward dot + reverse dot_bt => 4S FLOPs),
    # the bwd kernel 6 (primal+tangent dots, 2 weight-grad dot_at, 2
    # input-cotangent dot_bt => 12S FLOPs).
    S = sum(i * o for i, o in zip(ins_p, outs_p))
    FWD_FLOPS_PER_ROW = 4.0 * S
    BWD_FLOPS_PER_ROW = 12.0 * S
    # analytic HBM bytes (see pallas_sdf byte accounting): per-row streamed
    # blocks + the constant-index param/param-grad blocks once per call.
    # fwd: read x [LANE], write out [OP] + grad [LANE]; params read once.
    # bwd: read x [LANE] + ct_out [OP] + ct_grad [LANE], write ct_x [LANE];
    # params read once, weight/bias grads written once (accumulated in the
    # revisited VMEM blocks across the sequential grid).
    PARAM_BYTES = 4.0 * sum(i * o + o for i, o in zip(ins_p, outs_p))
    FWD_BYTES_PER_ROW = 4.0 * (2 * LANE + OP)
    BWD_BYTES_PER_ROW = 4.0 * (3 * LANE + OP)

    def pad_params(ws, bs):
        ws_p = [_pad2(w, ins_p[l], outs_p[l]) for l, w in enumerate(ws)]
        bs_p = [_pad1(b, outs_p[l])[None, :] for l, b in enumerate(bs)]
        return ws_p, bs_p

    def param_specs():
        specs = []
        for l in range(L):
            specs.append(pl.BlockSpec((ins_p[l], outs_p[l]),
                                      lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        for l in range(L):
            specs.append(pl.BlockSpec((1, outs_p[l]), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        return specs

    fwd_rows_cfg = int(fwd_block_rows or block_rows)

    def run_fwd(ws, bs, x):
        N = x.shape[0]
        # clamp the fwd block to the bwd-block-padded input size so small
        # inputs (render chunks, localization sweeps) don't pad up to the
        # large default block and waste 2-3x compute
        fwd_rows = min(fwd_rows_cfg, _round_up(max(N, 8), block_rows))
        n_pad = _round_up(max(N, 8), fwd_rows)
        x_p = jnp.zeros((n_pad, LANE), jnp.float32).at[:N, :3].set(x)
        ws_p, bs_p = pad_params(ws, bs)
        grid = (n_pad // fwd_rows,)
        log_flops(n_pad * FWD_FLOPS_PER_ROW)
        log_bytes(n_pad * FWD_BYTES_PER_ROW + PARAM_BYTES)
        out, grad = pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((fwd_rows, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + param_specs(),
            out_specs=[
                pl.BlockSpec((fwd_rows, OP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((fwd_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, OP), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
            ],
            scratch_shapes=[pltpu.VMEM((L, fwd_rows, MAXW), jnp.float32)],
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(x_p, *ws_p, *bs_p)
        return out[:N, :d_out], grad[:N, :3]

    STASH_COLS = L * MAXW

    def run_fwd_stash(ws, bs, x):
        N = x.shape[0]
        n_pad = _round_up(max(N, 8), block_rows)
        x_p = jnp.zeros((n_pad, LANE), jnp.float32).at[:N, :3].set(x)
        ws_p, bs_p = pad_params(ws, bs)
        grid = (n_pad // block_rows,)
        log_flops(n_pad * FWD_FLOPS_PER_ROW)
        log_bytes(n_pad * (FWD_BYTES_PER_ROW + 2.0 * STASH_COLS)
                  + PARAM_BYTES)
        out, grad, stash_arr = pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + param_specs(),
            out_specs=[
                pl.BlockSpec((block_rows, OP), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, STASH_COLS), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, OP), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
                jax.ShapeDtypeStruct((n_pad, STASH_COLS), jnp.bfloat16),
            ],
            scratch_shapes=[pltpu.VMEM((L, block_rows, MAXW), jnp.float32)],
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(x_p, *ws_p, *bs_p)
        return out[:N, :d_out], grad[:N, :3], stash_arr

    def run_bwd_stash(ws, bs, x, stash_arr, ct_out, ct_g):
        N = x.shape[0]
        n_pad = _round_up(max(N, 8), block_rows)
        x_p = jnp.zeros((n_pad, LANE), jnp.float32).at[:N, :3].set(x)
        cto_p = jnp.zeros((n_pad, OP), jnp.float32).at[:N, :d_out].set(ct_out)
        ctg_p = jnp.zeros((n_pad, LANE), jnp.float32).at[:N, :3].set(ct_g)
        ws_p, bs_p = pad_params(ws, bs)
        grid = (n_pad // block_rows,)
        log_flops(n_pad * (BWD_FLOPS_PER_ROW - 2.0 * S))
        log_bytes(n_pad * (BWD_BYTES_PER_ROW + 2.0 * STASH_COLS)
                  + 2.0 * PARAM_BYTES)
        out_specs = [pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32)]
        for l in range(L):          # accumulated across the sequential grid
            out_specs.append(pl.BlockSpec((ins_p[l], outs_p[l]),
                                          lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((ins_p[l], outs_p[l]), jnp.float32))
        for l in range(L):
            out_specs.append(pl.BlockSpec((1, outs_p[l]), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((1, outs_p[l]), jnp.float32))
        res = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=(
                [pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block_rows, OP), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block_rows, STASH_COLS), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] + param_specs()),
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=bwd_scratch,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(x_p, cto_p, ctg_p, stash_arr, *ws_p, *bs_p)
        ct_x = res[0][:N, :3]
        ct_ws = tuple(res[1 + l][: ws[l].shape[0], : ws[l].shape[1]]
                      for l in range(L))
        ct_bs = tuple(res[1 + L + l][0, : bs[l].shape[0]] for l in range(L))
        return ct_ws, ct_bs, ct_x

    def run_bwd(ws, bs, x, ct_out, ct_g):
        N = x.shape[0]
        n_pad = _round_up(max(N, 8), block_rows)
        x_p = jnp.zeros((n_pad, LANE), jnp.float32).at[:N, :3].set(x)
        cto_p = jnp.zeros((n_pad, OP), jnp.float32).at[:N, :d_out].set(ct_out)
        ctg_p = jnp.zeros((n_pad, LANE), jnp.float32).at[:N, :3].set(ct_g)
        ws_p, bs_p = pad_params(ws, bs)
        grid = (n_pad // block_rows,)
        log_flops(n_pad * BWD_FLOPS_PER_ROW)
        log_bytes(n_pad * BWD_BYTES_PER_ROW + 2.0 * PARAM_BYTES)
        out_specs = [pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32)]
        for l in range(L):          # accumulated across the sequential grid
            out_specs.append(pl.BlockSpec((ins_p[l], outs_p[l]),
                                          lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((ins_p[l], outs_p[l]), jnp.float32))
        for l in range(L):
            out_specs.append(pl.BlockSpec((1, outs_p[l]), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(
                jax.ShapeDtypeStruct((1, outs_p[l]), jnp.float32))
        res = pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=(
                [pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block_rows, OP), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] + param_specs()),
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=bwd_scratch,
            compiler_params=_compiler_params(),
            interpret=_interpret(),
        )(x_p, cto_p, ctg_p, *ws_p, *bs_p)
        ct_x = res[0][:N, :3]
        ct_ws = tuple(res[1 + l][: ws[l].shape[0], : ws[l].shape[1]]
                      for l in range(L))
        ct_bs = tuple(res[1 + L + l][0, : bs[l].shape[0]] for l in range(L))
        return ct_ws, ct_bs, ct_x

    @jax.custom_vjp
    def geom(ws, bs, x):
        if stash:
            out, grad, _ = run_fwd_stash(ws, bs, x)
            return out, grad
        return run_fwd(ws, bs, x)

    def geom_fwd(ws, bs, x):
        if stash:
            out, grad, stash_arr = run_fwd_stash(ws, bs, x)
            return (out, grad), (ws, bs, x, stash_arr)
        return run_fwd(ws, bs, x), (ws, bs, x, None)

    def geom_bwd(res, cts):
        ws, bs, x, stash_arr = res
        ct_out, ct_g = cts
        if stash:
            return run_bwd_stash(ws, bs, x, stash_arr, ct_out, ct_g)
        return run_bwd(ws, bs, x, ct_out, ct_g)

    geom.defvjp(geom_fwd, geom_bwd)
    return geom


# stacked backward (3 matmuls/layer at 2x rows) is the default; =0 restores
# the 6-matmul split-chain variant for A/B measurement (BENCHMARKS.md)
STACKED_BWD = _os.environ.get("FNEUS_PG_STACKED", "1") == "1"
# forward-kernel row block, decoupled from the backward's (see _make_geom);
# 0/unset = same as FNEUS_PG_BLOCK
# fwd kernel default row block: 512 (measured 3.88 -> 3.58 ms at the
# production 65536-row shape — longer matmuls amortize the serialized
# layer chain's per-matmul latency; 1024 exceeds the 16 MB scoped-VMEM
# limit, .fullrun/geom_kernel_sweep.jsonl).  The bwd keeps BLOCK_ROWS=256:
# its stacked [L,2B,MAXW] stash caps B.  0 = share the bwd block.
FWD_BLOCK_ROWS = int(_os.environ.get("FNEUS_PG_BLOCK_FWD", "512")) or None
# HBM-stash variant (fwd writes bf16 pre-activations, bwd skips the primal
# recompute — see _make_geom); A/B measurement knob
STASH_BWD = _os.environ.get("FNEUS_PG_HBM_STASH", "0") == "1"


def sdf_value_grad_feat_pallas(params, cfg, x: jnp.ndarray,
                               bf16: bool = True,
                               block_rows: int = BLOCK_ROWS,
                               stacked: "bool | None" = None,
                               fwd_block_rows: "int | None" = None,
                               stash: "bool | None" = None,
                               ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                          jnp.ndarray]:
    """Drop-in fused replacement for fields.sdf_value_and_grad_feat:
    (sdf [N], feature [N, d_out-1], grad [N,3]), differentiable w.r.t.
    params (incl. weight-norm) and x."""
    ws, bs = effective_weights(params, cfg)
    fb = fwd_block_rows if fwd_block_rows is not None else FWD_BLOCK_ROWS
    geom = _make_geom(cfg, bool(bf16), int(block_rows),
                      STACKED_BWD if stacked is None else bool(stacked),
                      None if fb is None else int(fb),
                      STASH_BWD if stash is None else bool(stash))
    out, grad = geom(tuple(ws), tuple(bs), x)
    return out[:, 0], out[:, 1:], grad
