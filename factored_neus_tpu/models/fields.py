"""Neural fields as pure init/apply pairs over parameter pytrees.

Architecture parity (weight-for-weight shapes) with ref:models/fields.py:
  SDFNetwork            ref:fields.py:9-111
  RenderingNetwork      ref:fields.py:114-175
  NeRF (background)     ref:fields.py:178-259
  SingleVarianceNetwork ref:fields.py:262-268
  RefColor              ref:fields.py:271-335
  Lvis                  ref:fields.py:338-369
  IndirectLight         ref:fields.py:372-412

TPU-first deviations from the torch code (documented, not silent):
  * torch ``LazyLinear`` input dims are computed statically (they are fully
    determined by the positional-encoding dims).
  * ``SDFNetwork.gradient`` (autograd double-backprop, ref:fields.py:100-111)
    becomes ``jax.grad`` of the summed SDF — one VJP, differentiable again for
    the eikonal term.
  * ``IndirectLight.forward`` mutates its output in place
    (ref:fields.py:408-409, an autograd hazard); we build the tensor
    functionally with identical math.
  * ``RefColor`` constructs an IDE encoder it never calls
    (ref:fields.py:275); we do not instantiate dead code.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mlp as M
from ..ops.embedder import get_embedder, positional_encoding
from ..ops import math as U


# ---------------------------------------------------------------------------
# SDF network
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SDFConfig:
    d_in: int = 3
    d_out: int = 257
    d_hidden: int = 256
    n_layers: int = 8
    skip_in: Tuple[int, ...] = (4,)
    multires: int = 6
    bias: float = 0.5
    scale: float = 1.0
    geometric_init: bool = True
    weight_norm: bool = True
    inside_outside: bool = False

    @property
    def d_embed(self) -> int:
        return self.d_in * (1 + 2 * self.multires) if self.multires > 0 else self.d_in

    @property
    def dims(self) -> Tuple[int, ...]:
        return (self.d_embed,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def sdf_init(key, cfg: SDFConfig):
    dims = list(cfg.dims)
    if cfg.geometric_init:
        return M.sdf_geometric_init(
            key, dims, skip_in=cfg.skip_in, d_in_raw=cfg.d_in, bias=cfg.bias,
            inside_outside=cfg.inside_outside, multires=cfg.multires,
            weight_norm=cfg.weight_norm)
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for l, k in enumerate(keys):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        p = M.dense_init(k, dims[l], out_dim)
        layers.append(M.weight_norm_wrap(p["w"], p["b"]) if cfg.weight_norm
                      else p)
    return layers


def sdf_apply(params, cfg: SDFConfig, inputs: jnp.ndarray,
              act_dtype=None) -> jnp.ndarray:
    """inputs [N,3] -> [N, d_out] = [sdf | feature]. ref:fields.py:74-91.

    act_dtype (e.g. bf16) stores the hidden activations at reduced
    precision — used for the no-grad sampling sweeps where the sdf only
    steers importance-sample placement; the PE input and the output stay
    f32."""
    if act_dtype is None:
        apply = M.wn_dense_apply if cfg.weight_norm else M.dense_apply
    else:
        wrap = M.wn_dense_apply_act if cfg.weight_norm else M.dense_apply_act
        apply = lambda p, x: wrap(p, x, act_dtype)
    inputs = inputs * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    x = inputs
    n_layers = len(params)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for l in range(n_layers):
        if l in cfg.skip_in:
            x = jnp.concatenate([x.astype(inputs.dtype), inputs],
                                axis=-1) * inv_sqrt2
        x = apply(params[l], x)
        if l < n_layers - 1:
            x = M.softplus_beta(x, 100.0)
            if act_dtype is not None:
                # materialize hidden activations at act_dtype so the HBM
                # round-trip between layers runs at half width
                x = x.astype(act_dtype)
    return jnp.concatenate([x[:, :1] / cfg.scale, x[:, 1:]], axis=-1)


def sdf_value(params, cfg: SDFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """[N,3] -> sdf [N]. ref:fields.py:93-95 (returns [N,1] there)."""
    return sdf_apply(params, cfg, x)[:, 0]


def _sdf_params_value_only(params):
    """Last layer narrowed to the sdf column (output 0).

    The no-grad sampling sweeps discard the feature columns, so slicing the
    final [256,257] matmul to [256,1] removes the sweep's last-layer MXU
    work exactly: weight-norm normalizes per OUTPUT column, so the sliced
    column computes mathematically identical sdf values (the narrower dot
    may reassociate the accumulation — a last-ulp effect only).
    """
    last = params[-1]
    sliced = {k: (a[:, :1] if a.ndim == 2 else a[:1])
              for k, a in last.items()}
    return list(params[:-1]) + [sliced]


def sdf_value_sweep(params, cfg: SDFConfig, x: jnp.ndarray,
                    act_dtype=None) -> jnp.ndarray:
    """sdf-only forward for sampling sweeps: same math as ``sdf_value`` with
    the last layer narrowed to the sdf column (exact up to dot reassociation,
    ~1/8 fewer sweep FLOPs at the reference widths).  XLA does not push the
    output slice through the concat+dot on its own (measured)."""
    return sdf_apply(_sdf_params_value_only(params), cfg, x,
                     act_dtype=act_dtype)[:, 0]


def sdf_gradient(params, cfg: SDFConfig, x: jnp.ndarray) -> jnp.ndarray:
    """∂sdf/∂x, [N,3].  Differentiable (double backprop for eikonal works
    through jax.grad-of-jax.grad).  ref:fields.py:100-111."""
    return jax.grad(lambda p: jnp.sum(sdf_value(params, cfg, p)))(x)


def sdf_value_and_grad_feat(params, cfg: SDFConfig, x: jnp.ndarray,
                            act_dtype=None):
    """(sdf [N], feature [N,256], grad [N,3]) from ONE forward pass.

    jax.vjp shares the forward between the (sdf|feature) outputs and the
    input-gradient of the sdf channel — the reference pays two forwards
    (ref:renderer.py:238-242 calls forward then .gradient()).  The vjp
    closure stays differentiable, so the eikonal double-backprop works.
    act_dtype=bf16 stores the forward residuals at half width (the backward
    reads them back; accumulation stays f32).
    """
    out, vjp_fn = jax.vjp(
        lambda p: sdf_apply(params, cfg, p, act_dtype=act_dtype), x)
    ct = jnp.zeros_like(out).at[:, 0].set(1.0)
    (grad,) = vjp_fn(ct)
    return out[:, 0], out[:, 1:], grad


# ---------------------------------------------------------------------------
# Rendering (radiance) network — IDR-style
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RenderingConfig:
    d_feature: int = 256
    mode: str = "idr"
    d_in: int = 9
    d_out: int = 3
    d_hidden: int = 256
    n_layers: int = 4
    weight_norm: bool = True
    multires_view: int = 4
    squeeze_out: bool = True

    @property
    def d_view(self) -> int:
        return 3 * (1 + 2 * self.multires_view) if self.multires_view > 0 else 3

    @property
    def dims(self) -> Tuple[int, ...]:
        d0 = self.d_in + self.d_feature
        if self.multires_view > 0:
            d0 += self.d_view - 3
        return (d0,) + (self.d_hidden,) * self.n_layers + (self.d_out,)


def rendering_init(key, cfg: RenderingConfig):
    dims = cfg.dims
    keys = jax.random.split(key, len(dims) - 1)
    layers = []
    for l, k in enumerate(keys):
        p = M.dense_init(k, dims[l], dims[l + 1])
        layers.append(M.weight_norm_wrap(p["w"], p["b"]) if cfg.weight_norm
                      else p)
    return layers


def rendering_apply(params, cfg: RenderingConfig, points, normals, view_dirs,
                    feature_vectors, act_dtype=None) -> jnp.ndarray:
    """ref:fields.py:150-175. act_dtype=bf16 stores hidden activations (and
    vjp residuals) at half width; in/out stay f32."""
    if act_dtype is None:
        apply = M.wn_dense_apply if cfg.weight_norm else M.dense_apply
    else:
        wrap = M.wn_dense_apply_act if cfg.weight_norm else M.dense_apply_act
        apply = lambda p, x: wrap(p, x, act_dtype)
    if cfg.multires_view > 0:
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)
    if cfg.mode == "idr":
        x = jnp.concatenate([points, view_dirs, normals, feature_vectors], -1)
    elif cfg.mode == "no_view_dir":
        x = jnp.concatenate([points, normals, feature_vectors], -1)
    elif cfg.mode == "no_normal":
        x = jnp.concatenate([points, view_dirs, feature_vectors], -1)
    else:
        raise ValueError(cfg.mode)
    n = len(params)
    for l in range(n):
        x = apply(params[l], x)
        if l < n - 1:
            x = jax.nn.relu(x)
            if act_dtype is not None:
                x = x.astype(act_dtype)
    return jax.nn.sigmoid(x) if cfg.squeeze_out else x


# ---------------------------------------------------------------------------
# Background NeRF (NeRF++ outer model)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    D: int = 8
    W: int = 256
    d_in: int = 4
    d_in_view: int = 3
    multires: int = 10
    multires_view: int = 4
    output_ch: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True

    @property
    def input_ch(self) -> int:
        # multires=0 means identity encoding, so the layer takes d_in
        # channels. (The reference hardcodes 3 here, ref:fields.py:195 —
        # self-consistent there only because its d_in defaults to 3; with
        # our d_in=4 inverted-sphere default the d_in fallback is the one
        # that matches nerf_apply's identity path.)
        return self.d_in * (1 + 2 * self.multires) if self.multires > 0 \
            else self.d_in

    @property
    def input_ch_view(self) -> int:
        return (self.d_in_view * (1 + 2 * self.multires_view)
                if self.multires_view > 0 else self.d_in_view)


def nerf_init(key, cfg: NeRFConfig):
    ks = jax.random.split(key, cfg.D + 4)
    pts_linears = [M.dense_init(ks[0], cfg.input_ch, cfg.W)]
    for i in range(cfg.D - 1):
        d_in = cfg.W + cfg.input_ch if i in cfg.skips else cfg.W
        pts_linears.append(M.dense_init(ks[1 + i], d_in, cfg.W))
    views_linear = M.dense_init(ks[cfg.D], cfg.input_ch_view + cfg.W, cfg.W // 2)
    feature_linear = M.dense_init(ks[cfg.D + 1], cfg.W, cfg.W)
    alpha_linear = M.dense_init(ks[cfg.D + 2], cfg.W, 1)
    rgb_linear = M.dense_init(ks[cfg.D + 3], cfg.W // 2, 3)
    return {"pts_linears": pts_linears, "views_linear": views_linear,
            "feature_linear": feature_linear, "alpha_linear": alpha_linear,
            "rgb_linear": rgb_linear}


def nerf_apply(params, cfg: NeRFConfig, input_pts, input_views,
               act_dtype=None):
    """(pts4, dirs) -> (density [N,1], rgb [N,3]). ref:fields.py:233-257.

    Skip wiring matches the reference NeRF: relu first, then concat
    [embedded_pts, h] after layer i in skips.  act_dtype=bf16 stores the
    hidden activations (and their vjp residuals) at half width; inputs,
    encodings, and the density/rgb heads stay f32 — same contract as
    rendering_apply/sdf_apply.
    """
    if act_dtype is None:
        apply = M.dense_apply
    else:
        apply = lambda p, x: M.dense_apply_act(p, x, act_dtype)
    pts_e = positional_encoding(input_pts, cfg.multires)
    views_e = positional_encoding(input_views, cfg.multires_view)
    h = pts_e
    for i, lin in enumerate(params["pts_linears"]):
        h = jax.nn.relu(apply(lin, h))
        if act_dtype is not None:
            h = h.astype(act_dtype)
        if i in cfg.skips:
            h = jnp.concatenate([pts_e.astype(h.dtype), h], axis=-1)
    alpha = M.dense_apply(params["alpha_linear"],
                          h.astype(jnp.float32) if act_dtype else h)
    feature = apply(params["feature_linear"], h)
    h = jnp.concatenate([feature, views_e.astype(feature.dtype)], axis=-1)
    h = jax.nn.relu(apply(params["views_linear"], h))
    if act_dtype is not None:
        h = h.astype(act_dtype)
    rgb = M.dense_apply(params["rgb_linear"],
                        h.astype(jnp.float32) if act_dtype else h)
    return alpha, rgb


# ---------------------------------------------------------------------------
# Single-variance (NeuS s) network
# ---------------------------------------------------------------------------

def variance_init(init_val: float = 0.3):
    return {"variance": jnp.asarray(init_val, jnp.float32)}


def variance_inv_s(params) -> jnp.ndarray:
    """inv_s = exp(10 * variance), scalar. ref:fields.py:262-268."""
    return jnp.exp(params["variance"] * 10.0)


# ---------------------------------------------------------------------------
# RefColor — surface reflection color head (diffuse + specular split)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class RefColorConfig:
    d_feature: int = 256
    multires_view: int = 4

    @property
    def d_view_enc(self) -> int:
        return 3 * (1 + 2 * self.multires_view)

    @property
    def d_cd_in(self) -> int:       # [pts(3), PE(n)(27), feat(256)]
        return 3 + self.d_view_enc + self.d_feature

    @property
    def d_cs_in(self) -> int:       # [n(3), pts(3), PE(ref)(27), feat(256)]
        return 6 + self.d_view_enc + self.d_feature


def refcolor_init(key, cfg: RefColorConfig = RefColorConfig()):
    k = jax.random.split(key, 3)
    net_cd = M.mlp_init(k[0], [cfg.d_cd_in, 256, 256, 256, 256, 3])
    viewdir_mlp = M.mlp_init(k[1], [cfg.d_cs_in, 256, 256, 256, 256])
    net_cs = M.mlp_init(k[2], [256, 1])
    return {"net_cd": net_cd, "viewdir_mlp": viewdir_mlp, "net_cs": net_cs}


def refcolor_apply(params, cfg: RefColorConfig, pts, feat, dirs, n
                   ) -> Dict[str, jnp.ndarray]:
    """(pts, feat, dirs=ray dirs, n=normals) -> {rgb, specular_rgb,
    diffuse_rgb} in sRGB, clipped. ref:fields.py:303-335.

    Note the reference's `viewdir_mlp` re-concat branch (`i % 4 == 0 and
    i > 0`, ref:fields.py:317-318) never fires with 4 layers; we implement the
    effective straight 4-layer ReLU stack.
    """
    normals = U.l2_normalize(n)
    n_enc = positional_encoding(n, cfg.multires_view)
    ref_dirs = U.reflect(-dirs, normals)
    ref_enc = positional_encoding(ref_dirs, cfg.multires_view)

    diffuse_linear = M.mlp_apply(
        params["net_cd"], jnp.concatenate([pts, n_enc, feat], -1),
        final_activation=jax.nn.sigmoid)

    x = jnp.concatenate([n, pts, ref_enc, feat], -1)
    for layer in params["viewdir_mlp"]:
        x = jax.nn.relu(M.dense_apply(layer, x))
    specular_linear = jax.nn.sigmoid(M.dense_apply(params["net_cs"][0], x))
    specular_linear = jnp.repeat(specular_linear, 3, axis=-1)

    brdf = specular_linear + diffuse_linear
    return {
        "rgb": jnp.clip(U.linear_to_srgb(brdf), 0.0, 1.0),
        "specular_rgb": jnp.clip(U.linear_to_srgb(specular_linear), 0.0, 1.0),
        "diffuse_rgb": jnp.clip(U.linear_to_srgb(diffuse_linear), 0.0, 1.0),
    }


# ---------------------------------------------------------------------------
# Lvis — learned light-visibility field
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LvisConfig:
    multires_pts: int = 10
    multires_view: int = 4

    @property
    def d_in(self) -> int:
        return 3 * (1 + 2 * self.multires_pts) + 3 * (1 + 2 * self.multires_view)


def lvis_init(key, cfg: LvisConfig = LvisConfig()):
    return M.mlp_init(key, [cfg.d_in, 256, 256, 256, 256, 1])


def lvis_apply(params, cfg: LvisConfig, pts, view,
               act_dtype=None) -> jnp.ndarray:
    """(pts, dir) -> visibility [N,1]. ref:fields.py:361-369.
    act_dtype=bf16 for the big stop-gradient MC visibility sweeps."""
    x = jnp.concatenate([positional_encoding(pts, cfg.multires_pts),
                         positional_encoding(view, cfg.multires_view)], -1)
    return M.mlp_apply(params, x, final_activation=jax.nn.sigmoid,
                       act_dtype=act_dtype)


def lvis_apply_outer(params, cfg: LvisConfig, pts, dirs,
                     act_dtype=None) -> jnp.ndarray:
    """Visibility for EVERY (dir, point) pair: [D, P].

    Factorized evaluation for the stage-3 MC visibility sweeps, where each
    of D directions is shared by all P points (materials.py
    get_diffuse_visibility: D = n_lobe*nsamp = 4096, P = 512 => 2.1M
    pairs). The flat path pays PE sin/cos and the first dense layer on
    all D*P rows (the profiled 6.1 ms of `multiply_sine` fusions,
    BENCHMARKS.md round-3 stage-3 profile) plus materialized [D*P,3]
    input broadcasts; here PE and the split first-layer matmuls run on
    the two SMALL factors and combine by a broadcast add — layers 2..n
    see the same [D*P, H] tensor either way. Same math up to f32
    summation order of the two first-layer partial products
    (tests/test_fields.py pins agreement with the flat path)."""
    pe_p = positional_encoding(pts, cfg.multires_pts)       # [P, dp]
    pe_d = positional_encoding(dirs, cfg.multires_view)     # [D, dd]
    dp = pe_p.shape[-1]
    w1, b1 = params[0]["w"], params[0]["b"]
    a_p = jnp.dot(pe_p, w1[:dp], precision=M.MATMUL_PRECISION,
                  preferred_element_type=jnp.float32)       # [P, H]
    a_d = jnp.dot(pe_d, w1[dp:], precision=M.MATMUL_PRECISION,
                  preferred_element_type=jnp.float32)       # [D, H]
    x = jax.nn.relu(a_d[:, None, :] + a_p[None, :, :] + b1)  # [D, P, H]
    if act_dtype is not None:
        x = x.astype(act_dtype)
    x = x.reshape(-1, x.shape[-1])                          # free: row-major
    n = len(params)
    for i in range(1, n):
        p = params[i]
        x = M.dense_apply(p, x) if act_dtype is None \
            else M.dense_apply_act(p, x, act_dtype)
        if i < n - 1:
            x = jax.nn.relu(x)
            if act_dtype is not None:
                x = x.astype(act_dtype)
    return jax.nn.sigmoid(x).reshape(pe_d.shape[0], pts.shape[0])


# ---------------------------------------------------------------------------
# IndirectLight — per-point SG mixture field
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class IndirectLightConfig:
    num_lgt_sgs: int = 24
    multires_pts: int = 10

    @property
    def d_in(self) -> int:
        return 3 * (1 + 2 * self.multires_pts)


def indirect_light_init(key, cfg: IndirectLightConfig = IndirectLightConfig()):
    return M.mlp_init(key, [cfg.d_in, 512, 512, 512, 512, cfg.num_lgt_sgs * 6])


def indirect_light_apply(params, cfg: IndirectLightConfig, pts) -> jnp.ndarray:
    """pts [N,3] -> SGs [N, L, 7] (axis 3, sharpness 1, amplitude 3).
    ref:fields.py:397-412 (functional form of the in-place ops there)."""
    out = M.mlp_apply(params, positional_encoding(pts, cfg.multires_pts))
    out = out.reshape(-1, cfg.num_lgt_sgs, 6)
    lobes = jax.nn.sigmoid(out[..., :2])
    theta = lobes[..., 0:1] * 2.0 * np.pi
    phi = lobes[..., 1:2] * 2.0 * np.pi
    axis = jnp.concatenate([jnp.cos(theta) * jnp.sin(phi),
                            jnp.sin(theta) * jnp.sin(phi),
                            jnp.cos(phi)], axis=-1)
    sharpness = jax.nn.sigmoid(out[..., 2:3]) * 30.0 + 0.1
    amplitude = jax.nn.relu(out[..., 3:6])
    return jnp.concatenate([axis, sharpness, amplitude], axis=-1)
