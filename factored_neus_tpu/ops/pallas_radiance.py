"""Fused Pallas TPU kernels for the IDR radiance MLP (RenderingNetwork).

Companion to ops/pallas_geometry.py: the radiance network is the second-
largest HBM consumer in the stage-1 core (65k points x 4x256 ReLU layers,
forward + backward). These kernels keep it VMEM-resident per row-block:

* fwd — PE(view_dirs) + concat([pts, enc, normals, feat]) + MLP + sigmoid
  in one pass. HBM: read (pts/dirs/normals packed, feat), write rgb.
* bwd (custom VJP) — fused remat: recompute the forward (pre-activations
  in VMEM scratch), reverse-sweep, accumulate weight/bias grads across the
  sequential grid, emit input cotangents (pts, normals, dirs via the PE
  jacobian, feat).

Math parity: fields.rendering_apply, mode='idr', squeeze_out=True
(ref:models/fields.py:114-175). Equivalence: tests/test_pallas_geometry.py.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_geometry import BLOCK_ROWS, _mm_fns
from .pallas_sdf import LANE, _pad1, _pad2, _round_up, effective_weights, on_tpu


def _interpret() -> bool:
    return not on_tpu()


@functools.lru_cache(maxsize=None)
def _spec(cfg, bf16: bool):
    dims = cfg.dims                       # (d0, hidden..., d_out)
    L = len(dims) - 1
    d_feat = cfg.d_feature
    m = cfg.multires_view
    d_view = 3 * (1 + 2 * m) if m > 0 else 3
    freqs = tuple(float(2.0 ** i) for i in range(m))
    # concat layout: [pts(3) | enc_dirs(d_view) | normals(3) | feat]
    off_enc, off_n, off_f = 3, 3 + d_view, 6 + d_view
    assert dims[0] == off_f + d_feat
    ins_p = tuple(_round_up(d, LANE) for d in dims[:-1])
    outs_p = tuple(_round_up(d, LANE) for d in dims[1:])
    MAXW = max(outs_p)
    FP = _round_up(d_feat, LANE)
    dot, dot_bt, dot_at = _mm_fns(bf16)
    return dict(dims=dims, L=L, d_feat=d_feat, freqs=freqs, d_view=d_view,
                off_enc=off_enc, off_n=off_n, off_f=off_f, ins_p=ins_p,
                outs_p=outs_p, MAXW=MAXW, FP=FP, dot=dot, dot_bt=dot_bt,
                dot_at=dot_at, squeeze=cfg.squeeze_out)


def _encode_dirs(dirs, freqs, B):
    parts = [dirs]
    for f in freqs:
        us = dirs * f
        parts += [jnp.sin(us), jnp.cos(us)]
    return jnp.concatenate(parts, -1)


def _build_x0(small_ref, feat_ref, C, B):
    pts = small_ref[:, 0:3]
    dirs = small_ref[:, 3:6]
    normals = small_ref[:, 6:9]
    enc = _encode_dirs(dirs, C["freqs"], B)
    pad = C["ins_p"][0] - C["dims"][0]
    pieces = [pts, enc, normals, feat_ref[:, :C["d_feat"]]]
    if pad:
        pieces.append(jnp.zeros((B, pad), jnp.float32))
    return dirs, jnp.concatenate(pieces, -1)


@functools.lru_cache(maxsize=None)
def _build_fwd_kernel(cfg, bf16: bool):
    C = _spec(cfg, bf16)
    L, dot = C["L"], C["dot"]
    ins_p, outs_p = C["ins_p"], C["outs_p"]

    def kernel(small_ref, feat_ref, *refs):
        w_refs, b_refs = refs[:L], refs[L:2 * L]
        out_ref = refs[2 * L]
        B = small_ref.shape[0]
        _, x = _build_x0(small_ref, feat_ref, C, B)
        for l in range(L):
            x = dot(x[:, :ins_p[l]], w_refs[l][:, :]) + b_refs[l][0, :]
            if l < L - 1:
                x = jnp.maximum(x, 0.0)
        out_ref[:, :] = jax.nn.sigmoid(x) if C["squeeze"] else x

    return kernel


@functools.lru_cache(maxsize=None)
def _build_bwd_kernel(cfg, bf16: bool):
    C = _spec(cfg, bf16)
    L = C["L"]
    ins_p, outs_p, MAXW = C["ins_p"], C["outs_p"], C["MAXW"]
    dot, dot_bt, dot_at = C["dot"], C["dot_bt"], C["dot_at"]
    freqs, d_feat = C["freqs"], C["d_feat"]
    off_enc, off_n, off_f = C["off_enc"], C["off_n"], C["off_f"]

    def kernel(small_ref, feat_ref, ct_rgb_ref, *refs):
        w_refs, b_refs = refs[:L], refs[L:2 * L]
        ct_small_ref = refs[2 * L]
        ct_feat_ref = refs[2 * L + 1]
        ctw_refs = refs[2 * L + 2: 3 * L + 2]
        ctb_refs = refs[3 * L + 2: 4 * L + 2]
        a_s = refs[4 * L + 2]                     # [L, B, MAXW]

        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for l in range(L):
                ctw_refs[l][:, :] = jnp.zeros_like(ctw_refs[l])
                ctb_refs[l][:, :] = jnp.zeros_like(ctb_refs[l])

        B = small_ref.shape[0]
        dirs, x0 = _build_x0(small_ref, feat_ref, C, B)
        x = x0
        for l in range(L):
            a = dot(x[:, :ins_p[l]], w_refs[l][:, :]) + b_refs[l][0, :]
            a_s[l, :, :outs_p[l]] = a
            x = jnp.maximum(a, 0.0) if l < L - 1 else a

        # output cotangent through the sigmoid (padded ct cols are zero)
        if C["squeeze"]:
            y = jax.nn.sigmoid(a_s[L - 1, :, :outs_p[L - 1]])
            r = ct_rgb_ref[:, :] * y * (1.0 - y)
        else:
            r = ct_rgb_ref[:, :]

        for l in range(L - 1, -1, -1):
            if l == 0:
                x_l = x0
            else:
                x_l = jnp.maximum(a_s[l - 1, :, :outs_p[l - 1]], 0.0)
            ctw_refs[l][:, :] += dot_at(x_l[:, :ins_p[l]], r[:, :outs_p[l]])
            ctb_refs[l][:, :] += jnp.sum(r[:, :outs_p[l]], axis=0,
                                         keepdims=True)
            r_in = dot_bt(r[:, :outs_p[l]], w_refs[l][:, :])
            if l == 0:
                ct_x0 = r_in
                break
            relu_mask = (a_s[l - 1, :, :outs_p[l - 1]] > 0.0)
            r = jnp.where(relu_mask, r_in[:, :outs_p[l - 1]], 0.0)

        # split the x0 cotangent back to (pts, dirs via PE, normals, feat)
        ct_pts = ct_x0[:, :3]
        ct_enc = ct_x0[:, off_enc:off_n]
        ct_normals = ct_x0[:, off_n:off_f]
        ct_feat = ct_x0[:, off_f:off_f + d_feat]
        ct_dirs = ct_enc[:, :3]
        off = 3
        for f in freqs:
            us = dirs * f
            ct_dirs = ct_dirs + f * (ct_enc[:, off:off + 3] * jnp.cos(us)
                                     - ct_enc[:, off + 3:off + 6]
                                     * jnp.sin(us))
            off += 6
        zs = jnp.zeros((B, LANE - 9), jnp.float32)
        ct_small_ref[:, :] = jnp.concatenate(
            [ct_pts, ct_dirs, ct_normals, zs], -1)
        fpad = C["FP"] - d_feat
        ct_feat_ref[:, :] = (jnp.concatenate(
            [ct_feat, jnp.zeros((B, fpad), jnp.float32)], -1)
            if fpad else ct_feat)

    return kernel


@functools.lru_cache(maxsize=None)
def _make_radiance(cfg, bf16: bool, block_rows: int):
    C = _spec(cfg, bf16)
    L = C["L"]
    ins_p, outs_p, MAXW, FP = C["ins_p"], C["outs_p"], C["MAXW"], C["FP"]
    d_out = C["dims"][-1]
    OP = outs_p[-1]
    fwd_kernel = _build_fwd_kernel(cfg, bf16)
    bwd_kernel = _build_bwd_kernel(cfg, bf16)

    def pad_params(ws, bs):
        ws_p = [_pad2(w, ins_p[l], outs_p[l]) for l, w in enumerate(ws)]
        bs_p = [_pad1(b, outs_p[l])[None, :] for l, b in enumerate(bs)]
        return ws_p, bs_p

    def param_specs():
        specs = [pl.BlockSpec((ins_p[l], outs_p[l]), lambda i: (0, 0),
                              memory_space=pltpu.VMEM) for l in range(L)]
        specs += [pl.BlockSpec((1, outs_p[l]), lambda i: (0, 0),
                               memory_space=pltpu.VMEM) for l in range(L)]
        return specs

    def pack_inputs(pts, normals, dirs, feat):
        N = pts.shape[0]
        n_pad = _round_up(max(N, 8), block_rows)
        small = jnp.zeros((n_pad, LANE), jnp.float32)
        small = small.at[:N, 0:3].set(pts).at[:N, 3:6].set(dirs) \
                     .at[:N, 6:9].set(normals)
        feat_p = jnp.zeros((n_pad, FP), jnp.float32).at[
            :N, :feat.shape[1]].set(feat)
        return small, feat_p, n_pad

    def run_fwd(ws, bs, pts, normals, dirs, feat):
        N = pts.shape[0]
        small, feat_p, n_pad = pack_inputs(pts, normals, dirs, feat)
        ws_p, bs_p = pad_params(ws, bs)
        out = pl.pallas_call(
            fwd_kernel,
            grid=(n_pad // block_rows,),
            in_specs=[pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((block_rows, FP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + param_specs(),
            out_specs=pl.BlockSpec((block_rows, OP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pad, OP), jnp.float32),
            interpret=_interpret(),
        )(small, feat_p, *ws_p, *bs_p)
        return out[:N, :d_out]

    def run_bwd(ws, bs, pts, normals, dirs, feat, ct_rgb):
        N = pts.shape[0]
        small, feat_p, n_pad = pack_inputs(pts, normals, dirs, feat)
        ct_p = jnp.zeros((n_pad, OP), jnp.float32).at[:N, :d_out].set(ct_rgb)
        ws_p, bs_p = pad_params(ws, bs)
        out_specs = [
            pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, FP), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((n_pad, LANE), jnp.float32),
                      jax.ShapeDtypeStruct((n_pad, FP), jnp.float32)]
        for l in range(L):
            out_specs.append(pl.BlockSpec((ins_p[l], outs_p[l]),
                                          lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((ins_p[l], outs_p[l]),
                                                   jnp.float32))
        for l in range(L):
            out_specs.append(pl.BlockSpec((1, outs_p[l]), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((1, outs_p[l]),
                                                   jnp.float32))
        res = pl.pallas_call(
            bwd_kernel,
            grid=(n_pad // block_rows,),
            in_specs=[pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((block_rows, FP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((block_rows, OP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + param_specs(),
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=[pltpu.VMEM((L, block_rows, MAXW), jnp.float32)],
            interpret=_interpret(),
        )(small, feat_p, ct_p, *ws_p, *bs_p)
        ct_small, ct_feat_p = res[0], res[1]
        ct_ws = tuple(res[2 + l][: ws[l].shape[0], : ws[l].shape[1]]
                      for l in range(L))
        ct_bs = tuple(res[2 + L + l][0, : bs[l].shape[0]] for l in range(L))
        ct_pts = ct_small[:N, 0:3]
        ct_dirs = ct_small[:N, 3:6]
        ct_normals = ct_small[:N, 6:9]
        ct_feat = ct_feat_p[:N, :feat.shape[1]]
        return ct_ws, ct_bs, ct_pts, ct_normals, ct_dirs, ct_feat

    @jax.custom_vjp
    def radiance(ws, bs, pts, normals, dirs, feat):
        return run_fwd(ws, bs, pts, normals, dirs, feat)

    def radiance_fwd(ws, bs, pts, normals, dirs, feat):
        return (run_fwd(ws, bs, pts, normals, dirs, feat),
                (ws, bs, pts, normals, dirs, feat))

    def radiance_bwd(res, ct):
        return run_bwd(*res, ct)

    radiance.defvjp(radiance_fwd, radiance_bwd)
    return radiance


def rendering_apply_pallas(params, cfg, pts, normals, dirs, feat,
                           bf16: bool = True,
                           block_rows: int = BLOCK_ROWS) -> jnp.ndarray:
    """Drop-in fused replacement for fields.rendering_apply (mode='idr'),
    differentiable w.r.t. params (incl. weight-norm) and every input."""
    assert cfg.mode == "idr", "fused radiance kernel supports idr mode"
    ws, bs = effective_weights(params, cfg)
    fn = _make_radiance(cfg, bool(bf16), int(block_rows))
    return fn(tuple(ws), tuple(bs), pts, normals, dirs, feat)
