"""Cross-framework numerical parity against the torch reference.

The reference implementation (/root/reference, CUDA/torch) is importable on
CPU in this image; these tests instantiate its actual networks/renderer,
inject IDENTICAL weights into both frameworks, and assert outputs agree —
parity proven by execution, not re-derivation.

Ref anchors: models/fields.py:9-412, models/renderer.py:43-500,
exp_runner.py:162-177.
"""
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(REF):
    pytest.skip("reference checkout not mounted", allow_module_level=True)

# The reference imports CUDA-era deps that are absent here; stub the ones
# touched at import time (never exercised by these tests).
for _name, _attrs in (("mcubes", {"marching_cubes": None}),
                      ("icecream", {"ic": lambda *a, **k: a[0] if a else None})):
    if _name not in sys.modules:
        _m = types.ModuleType(_name)
        for k, v in _attrs.items():
            setattr(_m, k, v)
        sys.modules[_name] = _m

sys.path.insert(0, REF)
# the reference's math_utils uses the numpy<2.0 `np.math` alias
if not hasattr(np, "math"):
    import math as _math
    np.math = _math
torch.manual_seed(0)

from models import fields as TF              # noqa: E402  (reference)
from models import renderer as TR            # noqa: E402  (reference)

from factored_neus_tpu.models import fields as JF          # noqa: E402
from factored_neus_tpu.models import renderer as JR        # noqa: E402
from factored_neus_tpu.train import losses as JL           # noqa: E402
from factored_neus_tpu.train.common import TrainConfig     # noqa: E402

ATOL = 1e-4


# ---------------------------------------------------------------------------
# torch -> jax weight conversion
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().cpu().numpy()


def t2j_dense(lin):
    """nn.Linear -> {'w': [in,out], 'b': [out]} (torch stores [out,in])."""
    return {"w": jnp.asarray(_np(lin.weight).T),
            "b": jnp.asarray(_np(lin.bias))}


def t2j_wn(lin):
    """weight-normed nn.Linear -> {'v': [in,out], 'g': [out], 'b': [out]}.

    torch's weight_norm keeps g with shape [out,1] and norms over the input
    axis of the [out,in] weight — i.e. per output unit, same as ours.
    """
    if hasattr(lin, "weight_g"):
        g, v = _np(lin.weight_g), _np(lin.weight_v)
    else:                                   # parametrize-based weight_norm
        p = lin.parametrizations.weight
        g, v = _np(p.original0), _np(p.original1)
    return {"v": jnp.asarray(v.T), "g": jnp.asarray(g.reshape(-1)),
            "b": jnp.asarray(_np(lin.bias))}


def t2j_sdf(net):
    return [t2j_wn(getattr(net, f"lin{l}")) for l in range(net.num_layers - 1)]


def t2j_rendering(net):
    return [t2j_wn(getattr(net, f"lin{l}")) for l in range(net.num_layers - 1)]


def t2j_nerf(net):
    return {
        "pts_linears": [t2j_dense(l) for l in net.pts_linears],
        "views_linear": t2j_dense(net.views_linears[0]),
        "feature_linear": t2j_dense(net.feature_linear),
        "alpha_linear": t2j_dense(net.alpha_linear),
        "rgb_linear": t2j_dense(net.rgb_linear),
    }


def t2j_refcolor(net):
    # net_cd is Sequential(Linear, ReLU)*4 + Linear + Sigmoid -> indices 0,2,4,6,8
    return {
        "net_cd": [t2j_dense(net.net_cd[i]) for i in (0, 2, 4, 6, 8)],
        "viewdir_mlp": [t2j_dense(l) for l in net.viewdir_mlp],
        "net_cs": [t2j_dense(net.net_cs[0])],
    }


def t2j_lvis(net):
    return [t2j_dense(net.lvis[i]) for i in (0, 2, 4, 6, 8)]


def t2j_indirect(net):
    return [t2j_dense(net.indi[i]) for i in (0, 2, 4, 6, 8)]


def _rand(*shape, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (scale * rng.randn(*shape)).astype(np.float32)


# ---------------------------------------------------------------------------
# Field-level parity
# ---------------------------------------------------------------------------

def test_sdf_network_parity():
    tnet = TF.SDFNetwork(d_in=3, d_out=65, d_hidden=64, n_layers=4,
                         skip_in=(2,), multires=6, scale=1.0)
    jcfg = JF.SDFConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=(2,),
                        multires=6)
    jp = t2j_sdf(tnet)
    x = _rand(32, 3, seed=1, scale=0.5)
    t_out = _np(tnet(torch.from_numpy(x)))
    j_out = np.asarray(JF.sdf_apply(jp, jcfg, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=ATOL)

    with torch.enable_grad():
        t_grad = _np(tnet.gradient(torch.from_numpy(x.copy())).squeeze(1))
    j_grad = np.asarray(JF.sdf_gradient(jp, jcfg, jnp.asarray(x)))
    np.testing.assert_allclose(j_grad, t_grad, atol=ATOL)

    # fused value+grad path used by the hot renderer core
    s, feat, g = JF.sdf_value_and_grad_feat(jp, jcfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s), t_out[:, 0], atol=ATOL)
    np.testing.assert_allclose(np.asarray(g), t_grad, atol=ATOL)


def test_sdf_network_parity_scaled():
    """cfg.scale rescales inputs and the sdf channel (ref:fields.py:76,91)."""
    tnet = TF.SDFNetwork(d_in=3, d_out=33, d_hidden=32, n_layers=2,
                         skip_in=(), multires=4, scale=3.0)
    jcfg = JF.SDFConfig(d_out=33, d_hidden=32, n_layers=2, skip_in=(),
                        multires=4, scale=3.0)
    jp = t2j_sdf(tnet)
    x = _rand(16, 3, seed=2, scale=0.3)
    np.testing.assert_allclose(
        np.asarray(JF.sdf_apply(jp, jcfg, jnp.asarray(x))),
        _np(tnet(torch.from_numpy(x))), atol=ATOL)


def test_rendering_network_parity():
    tnet = TF.RenderingNetwork(d_feature=64, mode="idr", d_in=9, d_out=3,
                               d_hidden=64, n_layers=4, weight_norm=True,
                               multires_view=4, squeeze_out=True)
    jcfg = JF.RenderingConfig(d_feature=64, d_hidden=64, n_layers=4,
                              multires_view=4)
    jp = t2j_rendering(tnet)
    pts, n, d = _rand(32, 3, seed=3), _rand(32, 3, seed=4), _rand(32, 3, seed=5)
    feat = _rand(32, 64, seed=6)
    t_out = _np(tnet(torch.from_numpy(pts), torch.from_numpy(n),
                     torch.from_numpy(d), torch.from_numpy(feat)))
    j_out = np.asarray(JF.rendering_apply(jp, jcfg, jnp.asarray(pts),
                                          jnp.asarray(n), jnp.asarray(d),
                                          jnp.asarray(feat)))
    np.testing.assert_allclose(j_out, t_out, atol=ATOL)


def test_nerf_parity():
    tnet = TF.NeRF(D=4, W=64, d_in=4, d_in_view=3, multires=6,
                   multires_view=4, skips=[2], use_viewdirs=True)
    jcfg = JF.NeRFConfig(D=4, W=64, multires=6, multires_view=4, skips=(2,))
    jp = t2j_nerf(tnet)
    pts4 = _rand(32, 4, seed=7, scale=0.5)
    views = _rand(32, 3, seed=8)
    t_alpha, t_rgb = tnet(torch.from_numpy(pts4), torch.from_numpy(views))
    j_alpha, j_rgb = JF.nerf_apply(jp, jcfg, jnp.asarray(pts4),
                                   jnp.asarray(views))
    np.testing.assert_allclose(np.asarray(j_alpha), _np(t_alpha), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_rgb), _np(t_rgb), atol=ATOL)


def test_refcolor_parity():
    tnet = TF.RefColor()
    pts, n, d = _rand(16, 3, seed=9), _rand(16, 3, seed=10), _rand(16, 3, seed=11)
    feat = _rand(16, 256, seed=12)
    args = [torch.from_numpy(a) for a in (pts, feat, d, n)]
    t_out = tnet(*args)                      # materializes the LazyLinears
    jp = t2j_refcolor(tnet)
    jcfg = JF.RefColorConfig(d_feature=256)
    j_out = JF.refcolor_apply(jp, jcfg, jnp.asarray(pts), jnp.asarray(feat),
                              jnp.asarray(d), jnp.asarray(n))
    for k in ("rgb", "specular_rgb", "diffuse_rgb"):
        np.testing.assert_allclose(np.asarray(j_out[k]), _np(t_out[k]),
                                   atol=ATOL, err_msg=k)


def test_lvis_parity():
    tnet = TF.Lvis()
    pts, view = _rand(16, 3, seed=13), _rand(16, 3, seed=14)
    t_out = _np(tnet(torch.from_numpy(pts), torch.from_numpy(view)))
    jp = t2j_lvis(tnet)
    j_out = np.asarray(JF.lvis_apply(jp, JF.LvisConfig(), jnp.asarray(pts),
                                     jnp.asarray(view)))
    np.testing.assert_allclose(j_out, t_out, atol=ATOL)


def test_indirect_light_parity():
    tnet = TF.IndirectLight(num_lgt_sgs=24)
    pts = _rand(16, 3, seed=15, scale=0.4)
    t_out = _np(tnet(torch.from_numpy(pts)))
    jp = t2j_indirect(tnet)
    j_out = np.asarray(JF.indirect_light_apply(
        jp, JF.IndirectLightConfig(), jnp.asarray(pts)))
    np.testing.assert_allclose(j_out, t_out, atol=ATOL)


def test_variance_parity():
    tnet = TF.SingleVarianceNetwork(0.3)
    t_inv_s = _np(tnet(torch.zeros(4, 3)))[0, 0]
    j_inv_s = float(JF.variance_inv_s(JF.variance_init(0.3)))
    np.testing.assert_allclose(j_inv_s, t_inv_s, rtol=1e-6)


# ---------------------------------------------------------------------------
# Renderer-level parity: identical weights, identical rays, perturb=0
# ---------------------------------------------------------------------------

def _build_pair():
    """Small NeuS stack in both frameworks with shared weights."""
    # the reference render_core hardcodes feature width 256
    # (ref:renderer.py:290,300), so the pair must use d_out=257
    t_sdf = TF.SDFNetwork(d_in=3, d_out=257, d_hidden=64, n_layers=4,
                          skip_in=(2,), multires=6, scale=1.0)
    t_dev = TF.SingleVarianceNetwork(0.3)
    t_color = TF.RenderingNetwork(d_feature=256, mode="idr", d_in=9, d_out=3,
                                  d_hidden=64, n_layers=4, weight_norm=True,
                                  multires_view=4, squeeze_out=True)
    t_nerf = TF.NeRF(D=4, W=64, d_in=4, d_in_view=3, multires=6,
                     multires_view=4, skips=[2], use_viewdirs=True)
    t_ref = TF.RefColor()
    # materialize RefColor's LazyLinears with feature width 64
    t_ref(torch.zeros(2, 3), torch.zeros(2, 256), torch.zeros(2, 3),
          torch.ones(2, 3))

    t_renderer = TR.NeuSRenderer(
        n_samples=16, n_importance=8, n_outside=8, up_sample_steps=2,
        perturb=0.0, nerf=t_nerf, sdf_network=t_sdf,
        deviation_network=t_dev, color_network=t_color,
        refColor_network=t_ref)

    jcfg = JR.RendererConfig(
        n_samples=16, n_importance=8, n_outside=8, up_sample_steps=2,
        perturb=0.0,
        sdf=JF.SDFConfig(d_out=257, d_hidden=64, n_layers=4, skip_in=(2,),
                         multires=6),
        rendering=JF.RenderingConfig(d_feature=256, d_hidden=64, n_layers=4),
        nerf=JF.NeRFConfig(D=4, W=64, multires=6, multires_view=4,
                           skips=(2,)),
        refcolor=JF.RefColorConfig(d_feature=256))
    jparams = {
        "sdf": t2j_sdf(t_sdf),
        "variance": {"variance": jnp.asarray(float(_np(t_dev.variance)))},
        "color": t2j_rendering(t_color),
        "nerf": t2j_nerf(t_nerf),
        "ref_color": t2j_refcolor(t_ref),
    }
    return t_renderer, jcfg, jparams


def _rays(B=24):
    rng = np.random.RandomState(42)
    rays_o = np.tile(np.array([[0.0, 0.0, -2.5]], np.float32), (B, 1))
    ang = np.linspace(-0.35, 0.35, B).astype(np.float32)
    rays_d = np.stack([np.sin(ang), 0.08 * rng.randn(B).astype(np.float32),
                       np.cos(ang)], -1)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    a = np.sum(rays_d ** 2, -1, keepdims=True)
    b = 2.0 * np.sum(rays_o * rays_d, -1, keepdims=True)
    mid = 0.5 * (-b) / a
    return rays_o, rays_d.astype(np.float32), mid - 1.0, mid + 1.0


def test_render_parity_full():
    """Full render(): up-sample ladder, background NeRF, core compositing,
    surface-color branch — same weights, same rays, perturb=0."""
    t_renderer, jcfg, jparams = _build_pair()
    rays_o, rays_d, near, far = _rays()

    t_out = t_renderer.render(torch.from_numpy(rays_o),
                              torch.from_numpy(rays_d),
                              torch.from_numpy(near), torch.from_numpy(far),
                              perturb_overwrite=0, cos_anneal_ratio=0.37)
    j_out = JR.render(jparams, jcfg, jnp.asarray(rays_o), jnp.asarray(rays_d),
                      jnp.asarray(near), jnp.asarray(far), key=None,
                      cos_anneal_ratio=0.37, perturb_overwrite=0.0)

    np.testing.assert_array_equal(np.asarray(j_out["sdf_mask"]),
                                  _np(t_out["sdf_mask"]).astype(bool))
    for k, tol in (("color_fine", 2e-4), ("weight_sum", 2e-4),
                   ("weight_max", 2e-4), ("s_val", 1e-4)):
        np.testing.assert_allclose(np.asarray(j_out[k]), _np(t_out[k]),
                                   atol=tol, err_msg=k)
    np.testing.assert_allclose(float(j_out["gradient_error"]),
                               float(_np(t_out["gradient_error"])), atol=2e-4)
    # surface color only meaningful on masked rays (reference leaves ones
    # elsewhere; so do we)
    m = _np(t_out["sdf_mask"]).astype(bool)
    np.testing.assert_allclose(np.asarray(j_out["surface_color"])[m],
                               _np(t_out["surface_color"])[m], atol=3e-4)


def test_stage1_loss_parity():
    """The 4-term stage-1 loss computed by both frameworks on the same
    render outputs agrees (ref:exp_runner.py:162-177)."""
    t_renderer, jcfg, jparams = _build_pair()
    rays_o, rays_d, near, far = _rays()
    rng = np.random.RandomState(7)
    true_rgb = rng.rand(rays_o.shape[0], 3).astype(np.float32)
    mask = (rng.rand(rays_o.shape[0], 1) > 0.3).astype(np.float32)

    tcfg = TrainConfig(igr_weight=0.1, mask_weight=0.1, surface_weight=0.1)

    # --- torch side, transcribing exp_runner.py:160-177 ---
    t_out = t_renderer.render(torch.from_numpy(rays_o),
                              torch.from_numpy(rays_d),
                              torch.from_numpy(near), torch.from_numpy(far),
                              perturb_overwrite=0, cos_anneal_ratio=0.37)
    F = torch.nn.functional
    t_rgb = torch.from_numpy(true_rgb)
    t_mask = torch.from_numpy(mask)
    mask_sum = t_mask.sum() + 1e-5
    sdf_mask = t_out["sdf_mask"]
    mask_sdf_sum = t_mask[sdf_mask].sum() + 1e-5
    color_error = (t_out["color_fine"] - t_rgb) * t_mask
    color_loss = F.l1_loss(color_error, torch.zeros_like(color_error),
                           reduction="sum") / mask_sum
    surf_err = tcfg.surface_weight * (t_out["surface_color"][sdf_mask]
                                      - t_rgb[sdf_mask]) * t_mask[sdf_mask]
    surface_loss = F.l1_loss(surf_err, torch.zeros_like(surf_err),
                             reduction="sum") / mask_sdf_sum
    eik = t_out["gradient_error"]
    mask_loss = F.binary_cross_entropy(
        t_out["weight_sum"].clip(1e-3, 1.0 - 1e-3), t_mask)
    t_loss = (color_loss + surface_loss + eik * tcfg.igr_weight
              + mask_loss * tcfg.mask_weight)

    # --- jax side through the framework's own loss ---
    j_out = JR.render(jparams, jcfg, jnp.asarray(rays_o), jnp.asarray(rays_d),
                      jnp.asarray(near), jnp.asarray(far), key=None,
                      cos_anneal_ratio=0.37, perturb_overwrite=0.0)
    j_loss, j_metrics = JL.stage1_losses(j_out, jnp.asarray(true_rgb),
                                         jnp.asarray(mask), tcfg,
                                         reduce=lambda x: x)
    np.testing.assert_allclose(float(j_metrics["color_loss"]),
                               float(color_loss), atol=2e-4)
    np.testing.assert_allclose(float(j_metrics["surface_loss"]),
                               float(surface_loss), atol=2e-4)
    np.testing.assert_allclose(float(j_metrics["eikonal_loss"]), float(eik),
                               atol=2e-4)
    np.testing.assert_allclose(float(j_metrics["mask_loss"]),
                               float(mask_loss), atol=2e-4)
    np.testing.assert_allclose(float(j_loss), float(t_loss), atol=5e-4)


def _grad_wn(lin):
    """Parameter grads of a weight-normed nn.Linear, mapped to our layout
    (same (g, v) parametrization both sides, so grads compare elementwise)."""
    if hasattr(lin, "weight_g"):
        g, v = _np(lin.weight_g.grad), _np(lin.weight_v.grad)
    else:
        p = lin.parametrizations.weight
        g, v = _np(p.original0.grad), _np(p.original1.grad)
    return {"v": v.T, "g": g.reshape(-1), "b": _np(lin.bias.grad)}


def _grad_dense(lin):
    return {"w": _np(lin.weight.grad).T, "b": _np(lin.bias.grad)}


def _assert_grads_close(j, t, name, abs_tol=3e-4, rel_tol=2e-3):
    if isinstance(t, dict):
        # key-set equality BEFORE recursing: an extra / misnamed leaf on
        # the jax side must fail loudly, not be silently skipped
        assert set(j) == set(t), (
            f"{name}: grad-tree keys differ — jax-only "
            f"{sorted(set(j) - set(t))}, torch-only {sorted(set(t) - set(j))}")
        for k in t:
            _assert_grads_close(j[k], t[k], f"{name}.{k}", abs_tol, rel_tol)
        return
    if isinstance(t, (list, tuple)):
        assert len(j) == len(t), (
            f"{name}: grad-tree lengths differ — jax {len(j)} vs "
            f"torch {len(t)}")
        for i, ti in enumerate(t):
            _assert_grads_close(j[i], ti, f"{name}[{i}]", abs_tol, rel_tol)
        return
    j = np.asarray(j, np.float64)
    t = np.asarray(t, np.float64)
    tol = abs_tol + rel_tol * max(np.max(np.abs(t)), 1e-8)
    d = np.max(np.abs(j.reshape(-1) - t.reshape(-1)))
    assert d <= tol, f"{name}: max|jax-torch|={d:.3e} > tol={tol:.3e}"


def test_stage1_param_grad_parity():
    """END-TO-END PARAMETER-GRADIENT parity: d(total stage-1 loss)/d(params)
    through the full render — up-sample ladder (detached both sides),
    background NeRF, core compositing incl. the eikonal double-backward, the
    surface-color branch, and all 4 loss terms — matches the torch reference
    elementwise for every parameter of every network.

    This covers what output parity cannot: stop_gradient/detach placement,
    the custom grad path through the SDF Hessian, and loss-term gradient
    routing. With outputs AND parameter gradients proven identical, the
    per-step training map (params, batch, rng) -> update is the same
    function in both frameworks, so converged-quality differences can only
    come from RNG stream realizations (ref:exp_runner.py:160-181)."""
    t_renderer, jcfg, jparams = _build_pair()
    t_sdf, t_dev = t_renderer.sdf_network, t_renderer.deviation_network
    t_color, t_nerf = t_renderer.color_network, t_renderer.nerf
    t_ref = t_renderer.refColor_network
    rays_o, rays_d, near, far = _rays()
    rng = np.random.RandomState(7)
    true_rgb = rng.rand(rays_o.shape[0], 3).astype(np.float32)
    mask = (rng.rand(rays_o.shape[0], 1) > 0.3).astype(np.float32)
    tcfg = TrainConfig(igr_weight=0.1, mask_weight=0.1, surface_weight=0.1)

    # --- torch: loss exactly as exp_runner.py:160-177, then backward ---
    with torch.enable_grad():
        t_out = t_renderer.render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d),
            torch.from_numpy(near), torch.from_numpy(far),
            perturb_overwrite=0, cos_anneal_ratio=0.37)
        F = torch.nn.functional
        t_rgb = torch.from_numpy(true_rgb)
        t_mask = torch.from_numpy(mask)
        mask_sum = t_mask.sum() + 1e-5
        sdf_mask = t_out["sdf_mask"]
        mask_sdf_sum = t_mask[sdf_mask].sum() + 1e-5
        color_error = (t_out["color_fine"] - t_rgb) * t_mask
        color_loss = F.l1_loss(color_error, torch.zeros_like(color_error),
                               reduction="sum") / mask_sum
        surf_err = tcfg.surface_weight * (t_out["surface_color"][sdf_mask]
                                          - t_rgb[sdf_mask]) * t_mask[sdf_mask]
        surface_loss = F.l1_loss(surf_err, torch.zeros_like(surf_err),
                                 reduction="sum") / mask_sdf_sum
        mask_loss = F.binary_cross_entropy(
            t_out["weight_sum"].clip(1e-3, 1.0 - 1e-3), t_mask)
        t_loss = (color_loss + surface_loss
                  + t_out["gradient_error"] * tcfg.igr_weight
                  + mask_loss * tcfg.mask_weight)
        t_loss.backward()

    tgrads = {
        "sdf": [_grad_wn(getattr(t_sdf, f"lin{l}"))
                for l in range(t_sdf.num_layers - 1)],
        "variance": {"variance": _np(t_dev.variance.grad)},
        "color": [_grad_wn(getattr(t_color, f"lin{l}"))
                  for l in range(t_color.num_layers - 1)],
        "nerf": {
            "pts_linears": [_grad_dense(l) for l in t_nerf.pts_linears],
            "views_linear": _grad_dense(t_nerf.views_linears[0]),
            "feature_linear": _grad_dense(t_nerf.feature_linear),
            "alpha_linear": _grad_dense(t_nerf.alpha_linear),
            "rgb_linear": _grad_dense(t_nerf.rgb_linear),
        },
        "ref_color": {
            "net_cd": [_grad_dense(t_ref.net_cd[i]) for i in (0, 2, 4, 6, 8)],
            "viewdir_mlp": [_grad_dense(l) for l in t_ref.viewdir_mlp],
            "net_cs": [_grad_dense(t_ref.net_cs[0])],
        },
    }

    # --- jax: grad of the framework's own loss through its own render ---
    def jloss(params):
        out = JR.render(params, jcfg, jnp.asarray(rays_o),
                        jnp.asarray(rays_d), jnp.asarray(near),
                        jnp.asarray(far), key=None, cos_anneal_ratio=0.37,
                        perturb_overwrite=0.0)
        loss, _ = JL.stage1_losses(out, jnp.asarray(true_rgb),
                                   jnp.asarray(mask), tcfg,
                                   reduce=lambda x: x)
        return loss

    jgrads = jax.grad(jloss)(jparams)
    _assert_grads_close(jgrads, tgrads, "grad")


def test_stage2_param_grad_parity(monkeypatch):
    """Stage-2 PARAMETER-GRADIENT parity: d(lvis+trace loss)/d(lvis,
    indirect params) through the full lvis_render graph matches the torch
    reference elementwise — the stage-2 analog of
    test_stage1_param_grad_parity (ref:lvis.py:150-170, 89-92: only the
    Lvis and IndirectLight networks train)."""
    t_renderer, jcfg, jparams = _build_pair23()
    t_lvis = t_renderer.lvis_network
    t_indi = t_renderer.indiLgt_network
    rays_o, rays_d, near, far = _rays(B=12)
    B = rays_o.shape[0]
    rng = np.random.RandomState(123)
    theta_u = rng.rand(B, 4).astype(np.float32)
    z_u = rng.rand(B, 4).astype(np.float32)

    def t_np(x):
        return torch.from_numpy(x)

    def jloss(sub):
        p = {**jparams, **sub}
        out = JR.lvis_render(p, jcfg, jnp.asarray(rays_o),
                             jnp.asarray(rays_d), jnp.asarray(near),
                             jnp.asarray(far), jax.random.PRNGKey(0))
        loss, _ = JL.stage2_losses(out, reduce=lambda x: x)
        return loss

    # deterministic sdf_mask from a jax forward (asserted equal to torch's
    # in the output-parity test); compacts the torch queue like the ref does
    _patch_rand(monkeypatch, [],
                        [("r_theta", theta_u), ("rand_z", z_u)])
    mask = np.asarray(JR.lvis_render(
        jparams, jcfg, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far),
        jax.random.PRNGKey(0))["sdf_mask"])
    assert mask.sum() >= 4

    # jax grads w.r.t. the trainable groups (fresh queue)
    _, jq = _patch_rand(monkeypatch, [],
                        [("r_theta", theta_u), ("rand_z", z_u)])
    jgrads = jax.grad(jloss)({"lvis": jparams["lvis"],
                              "indirect": jparams["indirect"]})
    assert not jq

    # torch side: reference loss transcribed from lvis.py:150-170
    tq, _ = _patch_rand(monkeypatch,
                           [("r_theta", theta_u[mask]), ("rand_z", z_u[mask])], [])
    with torch.enable_grad():
        t_out = t_renderer.lvis_render(t_np(rays_o), t_np(rays_d),
                                       t_np(near), t_np(far))
        F = torch.nn.functional
        gt_lvis, pre_lvis = t_out["gt_lvis"], t_out["pre_lvis"]
        gt_tr, pre_tr = (t_out["gt_trace_radiance"],
                         t_out["pre_trace_radiance"])
        sdf_mask = t_out["sdf_mask"]
        lvis_error = gt_lvis - pre_lvis
        lvis_loss = F.l1_loss(lvis_error, torch.zeros_like(lvis_error),
                              reduction="sum") / (
            sdf_mask[..., None].expand(gt_lvis.shape).sum() + 1e-6)
        tr_error = (gt_tr - pre_tr) * sdf_mask[..., None, None]
        tr_loss = F.l1_loss(tr_error, torch.zeros_like(tr_error),
                            reduction="sum") / (
            sdf_mask[..., None, None].expand(gt_tr.shape).sum() + 1e-6)
        (lvis_loss + tr_loss).backward()
    assert not tq

    tgrads = {
        "lvis": [_grad_dense(t_lvis.lvis[i]) for i in (0, 2, 4, 6, 8)],
        "indirect": [_grad_dense(t_indi.indi[i]) for i in (0, 2, 4, 6, 8)],
    }
    # stage-2/3 tolerance: d(L1)/d(residual) = sign(residual), and residual
    # elements inside the 3e-4 cross-framework OUTPUT tolerance can flip
    # sign between frameworks, each shifting a grad leaf by ~1/n_elements —
    # inherent to L1 at near-zero residuals, not a graph difference
    # (measured worst leaves 4.1e-4 w / 7.8e-4 b at f32; structural errors
    # show up 10-1000x above this)
    _assert_grads_close(jgrads, tgrads, "grad2", abs_tol=1.2e-3, rel_tol=3e-3)


def test_stage3_param_grad_parity(monkeypatch):
    """Stage-3 PARAMETER-GRADIENT parity: d(rgb+encoder loss)/d(material
    params) through the full mateIllu_render graph — BRDF auto-encoder,
    net_cs, SG PBR with MC diffuse visibility — matches the torch
    reference elementwise (ref:mateIllu.py:157-173, 91: only
    EnvmapMaterialNetwork trains)."""
    t_renderer, jcfg, jparams = _build_pair23()
    t_mat = t_renderer.mateIllu_network
    rays_o, rays_d, near, far = _rays(B=12)
    n_lobe, nsamp = 16, 32
    rng = np.random.RandomState(321)
    vtheta_u = rng.rand(n_lobe, nsamp).astype(np.float32)
    vphi_u = rng.rand(n_lobe, nsamp).astype(np.float32)
    true_rgb = rng.rand(rays_o.shape[0], 3).astype(np.float32)
    ones_mask = np.ones((rays_o.shape[0], 1), np.float32)

    _, jq = _patch_rand(monkeypatch, [],
                        [("r_theta", vtheta_u), ("r_phi", vphi_u)])

    def jloss(sub):
        p = {**jparams, **sub}
        out = JR.mate_illu_render(p, jcfg, jnp.asarray(rays_o),
                                  jnp.asarray(rays_d), jnp.asarray(near),
                                  jnp.asarray(far), jax.random.PRNGKey(0))
        loss, _ = JL.stage3_losses(out, jnp.asarray(true_rgb),
                                   jnp.asarray(ones_mask),
                                   reduce=lambda x: x)
        return loss

    jgrads = jax.grad(jloss)({"material": jparams["material"]})
    assert not jq

    tq, _ = _patch_rand(monkeypatch,
                           [("r_theta", vtheta_u), ("r_phi", vphi_u)], [])
    with torch.enable_grad():
        t_out = t_renderer.mateIllu_render(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d),
            torch.from_numpy(near), torch.from_numpy(far))
        F = torch.nn.functional
        rgb = t_out["rgb"]
        sdf_mask = t_out["sdf_mask"]
        t_rgb = torch.from_numpy(true_rgb)
        t_mask = torch.from_numpy(ones_mask)
        sdf_mask_sum = t_mask[sdf_mask].sum() + 1e-5
        rgb_error = (rgb[sdf_mask] - t_rgb[sdf_mask]) * t_mask[sdf_mask]
        rgb_loss = F.l1_loss(rgb_error, torch.zeros_like(rgb_error),
                             reduction="sum") / sdf_mask_sum
        (rgb_loss + t_out["encoder_loss"]).backward()
    assert not tq

    enc_lins = [t_mat.brdf_encoder_layer[i] for i in (0, 2, 4, 6, 8)]
    dec_lins = [t_mat.brdf_decoder_layer[i] for i in (0, 2, 4)]
    tgrads = {"material": {
        "lgtSGs": _np(t_mat.lgtSGs.grad),
        "brdf_encoder": [_grad_dense(l) for l in enc_lins],
        "brdf_decoder": [_grad_dense(l) for l in dec_lins],
        "net_cs": [_grad_dense(t_mat.net_cs[i]) for i in (0, 2, 4, 6, 8)],
    }}
    # same L1-sign-flip tolerance rationale as stage 2
    _assert_grads_close(jgrads, tgrads, "grad3", abs_tol=6e-4, rel_tol=3e-3)


# ---------------------------------------------------------------------------
# .pth checkpoint importer
# ---------------------------------------------------------------------------

def test_torch_pth_import(tmp_path):
    """Save a reference-format .pth checkpoint, import it, and verify the
    imported params reproduce the torch render; then round-trip through the
    framework's native npz format (ref:exp_runner.py:266-278)."""
    from models import inverRender as TIR                    # reference
    from factored_neus_tpu.utils import torch_import as TI
    from factored_neus_tpu.utils import checkpoints as CK

    t_renderer, jcfg, _ = _build_pair()
    t_lvis = TF.Lvis()
    t_indi = TF.IndirectLight(num_lgt_sgs=24)
    t_mat = TIR.EnvmapMaterialNetwork(num_lgt_sgs=16)
    t_lvis(torch.zeros(2, 3), torch.zeros(2, 3))             # materialize
    t_indi(torch.zeros(2, 3))
    t_mat.net_cs(torch.zeros(2, 90))                         # LazyLinear

    pth = str(tmp_path / "ckpt_001234.pth")
    torch.save({
        "nerf": t_renderer.nerf.state_dict(),
        "sdf_network_fine": t_renderer.sdf_network.state_dict(),
        "variance_network_fine": t_renderer.deviation_network.state_dict(),
        "color_network_fine": t_renderer.color_network.state_dict(),
        "refColor_network": t_renderer.refColor_network.state_dict(),
        "lvis_network": t_lvis.state_dict(),
        "indiLgt_network": t_indi.state_dict(),
        "mateIllu_network": t_mat.state_dict(),
        "optimizer": {"state": {}, "param_groups": []},
        "iter_step": 1234,
    }, pth)

    groups = TI.load_torch_checkpoint(pth)
    assert groups["iter_step"] == 1234
    jparams = TI.params_from_torch_checkpoint(
        torch.load(pth, map_location="cpu", weights_only=False))
    assert set(jparams) == {"nerf", "sdf", "variance", "color", "ref_color",
                            "lvis", "indirect", "material"}

    # imported weights drive this framework to the reference's output
    rays_o, rays_d, near, far = _rays(B=12)
    t_out = t_renderer.render(torch.from_numpy(rays_o),
                              torch.from_numpy(rays_d),
                              torch.from_numpy(near), torch.from_numpy(far),
                              perturb_overwrite=0, cos_anneal_ratio=1.0)
    j_out = JR.render(jparams, jcfg, jnp.asarray(rays_o), jnp.asarray(rays_d),
                      jnp.asarray(near), jnp.asarray(far), key=None,
                      cos_anneal_ratio=1.0, perturb_overwrite=0.0)
    np.testing.assert_allclose(np.asarray(j_out["color_fine"]),
                               _np(t_out["color_fine"]), atol=2e-4)

    # lvis / indirect / material groups converted with correct shapes
    np.testing.assert_allclose(
        np.asarray(JF.lvis_apply(jparams["lvis"], JF.LvisConfig(),
                                 jnp.zeros((4, 3)), jnp.ones((4, 3)))),
        _np(t_lvis(torch.zeros(4, 3), torch.ones(4, 3))), atol=ATOL)
    np.testing.assert_allclose(
        np.asarray(JF.indirect_light_apply(
            jparams["indirect"], JF.IndirectLightConfig(),
            jnp.full((4, 3), 0.2))),
        _np(t_indi(torch.full((4, 3), 0.2))), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jparams["material"]["lgtSGs"]),
                               _np(t_mat.lgtSGs), atol=1e-6)

    # CLI path: .pth -> native npz a runner can --is_continue from
    exp_dir = str(tmp_path / "exp")
    out_path = TI.import_to_exp_dir(pth, exp_dir)
    assert out_path.endswith("ckpt_001234.npz")
    loaded = CK.load_checkpoint(out_path)
    assert int(loaded["iter_step"]) == 1234
    np.testing.assert_allclose(
        loaded["sdf_network_fine"][0]["v"],
        np.asarray(jparams["sdf"][0]["v"]), atol=0)


# ---------------------------------------------------------------------------
# Stage-3 SG shading parity (ref:models/inverRender.py) — round 2 addition
# ---------------------------------------------------------------------------

def _unit(x):
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-9)


def test_sg_primitives_parity():
    """lambda_trick / hemisphere_int / integrate_rgb vs the reference
    (ref:inverRender.py:83-125,264-283)."""
    import models.inverRender as TI                  # reference
    from factored_neus_tpu.ops import sg as JSG

    P, M = 8, 6
    lobe1 = _unit(_rand(P, M, 3, seed=40))
    lam1 = np.abs(_rand(P, M, 1, seed=41)) * 3 + 0.2
    mu1 = np.abs(_rand(P, M, 3, seed=42))
    lobe2 = _unit(_rand(P, M, 3, seed=43))
    lam2 = np.abs(_rand(P, M, 1, seed=44)) * 40 + 5    # lambda1 << lambda2
    mu2 = np.abs(_rand(P, M, 3, seed=45))

    t_out = TI.lambda_trick(*(torch.from_numpy(a) for a in
                              (lobe1, lam1, mu1, lobe2, lam2, mu2)))
    j_out = JSG.lambda_trick(*(jnp.asarray(a) for a in
                               (lobe1, lam1, mu1, lobe2, lam2, mu2)))
    for a, b, name in zip(j_out, t_out, ("lobes", "lambdas", "mus")):
        np.testing.assert_allclose(np.asarray(a), _np(b), atol=ATOL,
                                   err_msg=name)

    lam = np.abs(_rand(P, M, 1, seed=46)) * 30 + 0.1
    cosb = np.clip(_rand(P, M, 1, seed=47), -1, 1)
    np.testing.assert_allclose(
        np.asarray(JSG.hemisphere_int(jnp.asarray(lam), jnp.asarray(cosb))),
        _np(TI.hemisphere_int(torch.from_numpy(lam),
                              torch.from_numpy(cosb))), atol=ATOL)

    normal = _unit(_rand(P, 3, seed=48))
    normal_e = np.broadcast_to(normal[:, None, :], (P, M, 3)).copy()
    np.testing.assert_allclose(
        np.asarray(JSG.integrate_rgb(jnp.asarray(normal_e),
                                     jnp.asarray(lobe2), jnp.asarray(lam2),
                                     jnp.asarray(mu2))),
        _np(TI.integrate_rgb(torch.from_numpy(normal_e),
                             torch.from_numpy(lobe2),
                             torch.from_numpy(lam2),
                             torch.from_numpy(mu2))), atol=ATOL)


def test_render_with_sg_parity(monkeypatch):
    """The full SG PBR equation, comp_vis=False (deterministic — the MC
    visibility path is RNG-parameterized differently per framework).
    ref:inverRender.py:314-449."""
    import models.inverRender as TI                  # reference
    from factored_neus_tpu.models import materials as JM

    if not torch.cuda.is_available():                # ref hardcodes .cuda()
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)

    P, M = 10, 12
    rng = np.random.RandomState(50)
    points = (rng.randn(P, 3) * 0.4).astype(np.float32)
    normal = _unit(rng.randn(P, 3)).astype(np.float32)
    viewdirs = _unit(rng.randn(P, 3)).astype(np.float32)
    lgt_sgs = rng.randn(P, M, 7).astype(np.float32)
    spec_refl = np.full((P, 3), 0.02, np.float32)
    spec_alb = rng.rand(P, 3).astype(np.float32)
    rough = (0.09 + 0.9 * rng.rand(P, 1)).astype(np.float32)
    diff_alb = rng.rand(P, 3).astype(np.float32)

    t_out = TI.render_with_sg(
        torch.from_numpy(points), torch.from_numpy(normal),
        torch.from_numpy(viewdirs), torch.from_numpy(lgt_sgs),
        torch.from_numpy(spec_refl), torch.from_numpy(spec_alb),
        torch.from_numpy(rough), torch.from_numpy(diff_alb),
        gt_specular_linear=None, comp_vis=False)
    j_out = JM.render_with_sg(
        jnp.asarray(points), jnp.asarray(normal), jnp.asarray(viewdirs),
        jnp.asarray(lgt_sgs), jnp.asarray(spec_refl), jnp.asarray(spec_alb),
        jnp.asarray(rough), jnp.asarray(diff_alb), comp_vis=False)
    for k in ("env_rgb", "diffuse_rgb", "specular_rgb"):
        np.testing.assert_allclose(np.asarray(j_out[k]), _np(t_out[k]),
                                   atol=ATOL, err_msg=k)


# ---------------------------------------------------------------------------
# Stage-2 secondary-ray weight parity (ref:models/calLvis.py) — round 2
# ---------------------------------------------------------------------------

def test_secondary_compute_weight_parity():
    """NeuS weights along secondary rays vs the reference's compute_weight
    (ref:calLvis.py:93-150), same injected SDF/variance weights."""
    import models.calLvis as TCL                     # reference
    from factored_neus_tpu.models import secondary as JS

    tnet = TF.SDFNetwork(d_in=3, d_out=257, d_hidden=64, n_layers=4,
                         skip_in=(2,), multires=6, scale=1.0)
    tvar = TF.SingleVarianceNetwork(0.3)
    jp = t2j_sdf(tnet)
    jcfg = JF.SDFConfig(d_out=257, d_hidden=64, n_layers=4, skip_in=(2,),
                        multires=6)
    jvar = {"variance": jnp.asarray(_np(tvar.variance).reshape(()))}

    B, T = 6, 32
    rng = np.random.RandomState(60)
    rays_o = (rng.randn(B, 3) * 0.1).astype(np.float32)
    rays_d = _unit(rng.randn(B, 3)).astype(np.float32)
    z = np.sort(0.1 + 0.9 * rng.rand(B, T).astype(np.float32), axis=-1)

    with torch.enable_grad():
        t_w, t_wi = TCL.compute_weight(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d),
            torch.from_numpy(z), tnet, tvar)

    inv_s = jnp.clip(JF.variance_inv_s(jvar), 1e-6, 1e6)
    j_w, j_wi = JS.compute_weight(
        lambda p: JF.sdf_value(jp, jcfg, p),
        lambda p: JF.sdf_gradient(jp, jcfg, p),
        inv_s, jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(j_w), _np(t_w), atol=ATOL)
    np.testing.assert_allclose(np.asarray(j_wi), _np(t_wi), atol=ATOL)


# ---------------------------------------------------------------------------
# Stage-2/3 FULL-GRAPH parity: lvis_render / mateIllu_render end-to-end with
# injected weights AND injected RNG draws (round-4 addition)
# ---------------------------------------------------------------------------

def _patch_rand(monkeypatch, torch_queue, jax_queue):
    """Feed both frameworks the SAME uniform draws.

    torch: calLvis.cal_indiLgt draws torch.rand(n_mask, 4) twice
    (ref:calLvis.py:352-353); inverRender.get_diffuse_visibility draws
    torch.rand(n_lobe, nsamp) twice (ref:inverRender.py:151-152).
    jax: secondary.cal_indi_lgt / materials.get_diffuse_visibility draw
    jax.random.uniform with the same semantics (full-batch shapes — the
    static-shape design computes all rays and masks after, so the torch
    queue holds the masked ROWS of the same master arrays).

    Queue entries are (label, array): label must appear in the consuming
    call-site's SOURCE LINE (e.g. "r_theta" / "rand_z" / "r_phi"), so a
    swapped draw order between frameworks fails loudly even when the two
    draws share a shape (theta/z and vtheta/vphi do)."""
    import linecache

    tq = list(torch_queue)
    jq = list(jax_queue)

    def assert_site(label):
        fr = sys._getframe(2)           # the frame calling the fake
        line = linecache.getline(fr.f_code.co_filename, fr.f_lineno)
        assert label in line, (
            f"RNG draw order mismatch: expected the '{label}' draw but the "
            f"consuming line is {fr.f_code.co_filename}:{fr.f_lineno}: "
            f"{line.strip()!r}")

    def fake_rand(*size, **kw):
        if len(size) == 1 and isinstance(size[0], (tuple, list)):
            size = tuple(size[0])
        label, arr = tq.pop(0)
        assert_site(label)
        assert tuple(size) == arr.shape, (size, arr.shape)
        return torch.from_numpy(np.ascontiguousarray(arr))

    def fake_uniform(key, shape=(), dtype=None, minval=0.0, maxval=1.0):
        label, arr = jq.pop(0)
        assert_site(label)
        assert tuple(shape) == arr.shape, (shape, arr.shape)
        return jnp.asarray(arr)

    monkeypatch.setattr(torch, "rand", fake_rand)
    monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    if not torch.cuda.is_available():
        monkeypatch.setattr(torch.Tensor, "cuda",
                            lambda self, *a, **k: self)
    return tq, jq


def _build_pair23():
    """Shared-weight stack for the stage-2/3 graphs (adds Lvis /
    IndirectLight / EnvmapMaterialNetwork to the stage-1 pair)."""
    import models.inverRender as TIR                 # reference
    from factored_neus_tpu.models.materials import EnvmapMaterialConfig
    from factored_neus_tpu.utils import torch_import as TI

    t_renderer, jcfg1, _ = _build_pair()
    t_lvis = TF.Lvis()
    t_indi = TF.IndirectLight(num_lgt_sgs=24)
    t_mat = TIR.EnvmapMaterialNetwork(num_lgt_sgs=16)
    t_lvis(torch.zeros(2, 3), torch.zeros(2, 3))     # materialize the
    t_indi(torch.zeros(2, 3))                        # LazyLinear layers
    t_mat.net_cs(torch.zeros(2, 90))
    t_renderer.lvis_network = t_lvis
    t_renderer.indiLgt_network = t_indi
    t_renderer.mateIllu_network = t_mat

    state = {
        "nerf": t_renderer.nerf.state_dict(),
        "sdf_network_fine": t_renderer.sdf_network.state_dict(),
        "variance_network_fine": t_renderer.deviation_network.state_dict(),
        "color_network_fine": t_renderer.color_network.state_dict(),
        "refColor_network": t_renderer.refColor_network.state_dict(),
        "lvis_network": t_lvis.state_dict(),
        "indiLgt_network": t_indi.state_dict(),
        "mateIllu_network": t_mat.state_dict(),
        "iter_step": 0,
    }
    jparams = TI.params_from_torch_checkpoint(state)
    # sweep_act_bf16 must be OFF for bit-level parity: the stage-2 coarse
    # secondary sweep (renderer.py lvis_render, bf16_act=True) otherwise
    # places fine samples from rounded sdf values, shifting gt_lvis by a
    # few % vs the reference's f32 quadrature (a validated perf trade in
    # production, not a parity bug — conftest pins core_act f32 the same
    # way)
    jcfg = JR.RendererConfig(
        n_samples=jcfg1.n_samples, n_importance=jcfg1.n_importance,
        n_outside=0, up_sample_steps=jcfg1.up_sample_steps, perturb=0.0,
        sdf=jcfg1.sdf, rendering=jcfg1.rendering, nerf=jcfg1.nerf,
        refcolor=jcfg1.refcolor, sweep_act_bf16=False,
        material=EnvmapMaterialConfig(num_lgt_sgs=16, tonemap="srgb"))
    return t_renderer, jcfg, jparams


def test_lvis_render_full_graph_parity(monkeypatch):
    """End-to-end stage-2 graph: surface localization -> 4 hemisphere
    secondary rays -> 512-coarse/32-fine SDF sweeps -> gt/pre lvis + trace
    radiance, torch vs jax with injected weights and injected hemisphere
    draws (ref:renderer.py:567-627, calLvis.py:339-409)."""
    t_renderer, jcfg, jparams = _build_pair23()
    rays_o, rays_d, near, far = _rays(B=12)
    B = rays_o.shape[0]
    rng = np.random.RandomState(123)
    theta_u = rng.rand(B, 4).astype(np.float32)
    z_u = rng.rand(B, 4).astype(np.float32)

    # jax first: full-batch draws; gives us the (deterministic) sdf_mask
    _, jq = _patch_rand(monkeypatch, [],
                        [("r_theta", theta_u), ("rand_z", z_u)])
    j_out = JR.lvis_render(jparams, jcfg, jnp.asarray(rays_o),
                           jnp.asarray(rays_d), jnp.asarray(near),
                           jnp.asarray(far), jax.random.PRNGKey(0))
    assert not jq, "jax side consumed fewer draws than queued"
    mask = np.asarray(j_out["sdf_mask"])
    assert mask.sum() >= 4, "fixture must hit the surface on several rays"

    # torch side: the reference compacts to masked rays BEFORE drawing
    tq, _ = _patch_rand(monkeypatch,
                           [("r_theta", theta_u[mask]), ("rand_z", z_u[mask])], [])
    t_out = t_renderer.lvis_render(torch.from_numpy(rays_o),
                                   torch.from_numpy(rays_d),
                                   torch.from_numpy(near),
                                   torch.from_numpy(far))
    assert not tq, "torch side consumed fewer draws than queued"

    np.testing.assert_array_equal(mask, _np(t_out["sdf_mask"]).astype(bool))
    for k, tol in (("gt_lvis", 3e-4), ("pre_lvis", 3e-4),
                   ("gt_trace_radiance", 3e-4), ("pre_trace_radiance", 3e-4)):
        np.testing.assert_allclose(np.asarray(j_out[k]), _np(t_out[k]),
                                   atol=tol, err_msg=k)


def test_mateillu_render_full_graph_parity(monkeypatch):
    """End-to-end stage-3 graph: surface localization -> frozen RefColor
    GT decomposition -> IndirectLight SGs -> EnvmapMaterialNetwork (BRDF
    auto-encoder + KL, net_cs, SG PBR with MC diffuse visibility) -> the 11
    output maps + losses, torch vs jax with injected weights and injected
    visibility draws (ref:renderer.py:630-726, inverRender.py:530-598)."""
    t_renderer, jcfg, jparams = _build_pair23()
    rays_o, rays_d, near, far = _rays(B=12)
    n_lobe, nsamp = 16, 32
    rng = np.random.RandomState(321)
    vtheta_u = rng.rand(n_lobe, nsamp).astype(np.float32)
    vphi_u = rng.rand(n_lobe, nsamp).astype(np.float32)

    _, jq = _patch_rand(monkeypatch, [],
                        [("r_theta", vtheta_u), ("r_phi", vphi_u)])
    j_out = JR.mate_illu_render(jparams, jcfg, jnp.asarray(rays_o),
                                jnp.asarray(rays_d), jnp.asarray(near),
                                jnp.asarray(far), jax.random.PRNGKey(0))
    assert not jq
    mask = np.asarray(j_out["sdf_mask"])
    assert mask.sum() >= 4

    tq, _ = _patch_rand(monkeypatch,
                           [("r_theta", vtheta_u), ("r_phi", vphi_u)], [])
    t_out = t_renderer.mateIllu_render(torch.from_numpy(rays_o),
                                       torch.from_numpy(rays_d),
                                       torch.from_numpy(near),
                                       torch.from_numpy(far))
    assert not tq

    np.testing.assert_array_equal(mask, _np(t_out["sdf_mask"]).astype(bool))
    maps = ("rgb", "env_rgb", "indir_rgb", "diffuse_albedo",
            "specular_albedo", "diffuse_rgb", "specular_rgb", "roughness",
            "lvis_mean", "gt_specular_linear", "gt_diffuse_srgb", "n_out")
    for k in maps:
        np.testing.assert_allclose(np.asarray(j_out[k]), _np(t_out[k]),
                                   atol=3e-4, err_msg=k)
    for k in ("encoder_loss", "diffuse_loss", "specular_loss",
              "smooth_loss"):
        np.testing.assert_allclose(float(np.asarray(j_out[k])),
                                   float(t_out[k]), atol=3e-4, err_msg=k)
