"""Equivalence of the fused Pallas geometry kernels vs the XLA reference
path (fields.sdf_value_and_grad_feat), including the full custom-VJP
backward with the eikonal-style gradient cotangent (reverse-over-forward).

Runs in Pallas interpret mode on CPU; the TPU lowering is exercised by the
renderer benchmark path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factored_neus_tpu.models import fields as F
from factored_neus_tpu.ops import pallas_geometry as PG


def _cfg(scale=1.0, skip=(2,)):
    return F.SDFConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=skip,
                       multires=4, scale=scale)


def _setup(scale=1.0, skip=(2,), n=150, seed=0):
    cfg = _cfg(scale, skip)
    params = F.sdf_init(jax.random.PRNGKey(seed), cfg)
    x = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3)) * 0.4
    return cfg, params, x


@pytest.mark.parametrize("scale,skip", [(1.0, (2,)), (1.5, (2,)),
                                        (1.0, ())])
def test_fwd_matches_xla(scale, skip):
    cfg, params, x = _setup(scale, skip)
    s_ref, f_ref, g_ref = F.sdf_value_and_grad_feat(params, cfg, x)
    s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                            block_rows=64)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def _loss_terms(s, f, g, x):
    """Exercises every cotangent path: sdf, feature, AND the gradient
    (eikonal + a normal-consumption term, like render_core)."""
    eik = jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)
    normal_use = jnp.mean(jnp.sum(g * x, -1) * s)
    feat_use = jnp.mean(f ** 2)
    return eik + normal_use + feat_use + jnp.mean(jnp.abs(s))


@pytest.mark.parametrize("scale,skip,stacked",
                         [(1.0, (2,), True), (1.5, (2,), True),
                          (1.0, (), True),
                          (1.0, (2,), False), (1.0, (), False)])
def test_bwd_matches_xla(scale, skip, stacked):
    """jax.grad through the custom VJP == jax.grad through the XLA path,
    for params (weight-norm v/g/b) and inputs — both backward-kernel
    variants (stacked 3-matmul/layer and split 6-matmul/layer)."""
    cfg, params, x = _setup(scale, skip)

    def loss_pallas(params, x):
        s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                                block_rows=64,
                                                stacked=stacked)
        return _loss_terms(s, f, g, x)

    def loss_xla(params, x):
        s, f, g = F.sdf_value_and_grad_feat(params, cfg, x)
        return _loss_terms(s, f, g, x)

    lp, lx = float(loss_pallas(params, x)), float(loss_xla(params, x))
    np.testing.assert_allclose(lp, lx, rtol=1e-5)

    gp_params, gp_x = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    gx_params, gx_x = jax.grad(loss_xla, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gx_x),
                               atol=2e-5, err_msg="d/dx")
    for a, b in zip(jax.tree_util.tree_leaves(gp_params),
                    jax.tree_util.tree_leaves(gx_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-4)


def test_multi_block_accumulation():
    """Param grads accumulate correctly across several grid steps and with
    row padding (N not a block multiple)."""
    cfg, params, x = _setup(n=150)

    def loss(params):
        s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                                block_rows=32)
        return _loss_terms(s, f, g, x)

    def loss_ref(params):
        s, f, g = F.sdf_value_and_grad_feat(params, cfg, x)
        return _loss_terms(s, f, g, x)

    ga = jax.grad(loss)(params)
    gb = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-4)


def test_bf16_variant_close():
    cfg, params, x = _setup()
    s_ref, f_ref, g_ref = F.sdf_value_and_grad_feat(params, cfg, x)
    s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=True,
                                            block_rows=64)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=3e-2)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=5e-2)


# ---------------------------------------------------------------------------
# Fused radiance MLP (ops.pallas_radiance)
# ---------------------------------------------------------------------------

def _rad_setup(n=150, seed=0):
    from factored_neus_tpu.ops import pallas_radiance as PR
    cfg = F.RenderingConfig(d_feature=64, d_hidden=64, n_layers=3,
                            multires_view=4)
    params = F.rendering_init(jax.random.PRNGKey(seed), cfg)
    k = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    pts = jax.random.normal(k[0], (n, 3)) * 0.4
    normals = jax.random.normal(k[1], (n, 3))
    dirs = jax.random.normal(k[2], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, -1, keepdims=True)
    feat = jax.random.normal(k[3], (n, 64)) * 0.5
    return PR, cfg, params, (pts, normals, dirs, feat)


def test_radiance_fwd_matches_xla():
    PR, cfg, params, (pts, normals, dirs, feat) = _rad_setup()
    ref = F.rendering_apply(params, cfg, pts, normals, dirs, feat)
    out = PR.rendering_apply_pallas(params, cfg, pts, normals, dirs, feat,
                                    bf16=False, block_rows=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_radiance_bwd_matches_xla():
    PR, cfg, params, inputs = _rad_setup()

    def loss(fn):
        def inner(params, pts, normals, dirs, feat):
            rgb = fn(params, cfg, pts, normals, dirs, feat)
            return jnp.mean(rgb ** 2) + jnp.sum(rgb[:, 0] * pts[:, 0]) * 1e-3
        return inner

    ref_fn = loss(lambda p, c, *a: F.rendering_apply(p, c, *a))
    pal_fn = loss(lambda p, c, *a: PR.rendering_apply_pallas(
        p, c, *a, bf16=False, block_rows=32))

    np.testing.assert_allclose(float(pal_fn(params, *inputs)),
                               float(ref_fn(params, *inputs)), rtol=1e-5)
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4))(params, *inputs)
    g_pal = jax.grad(pal_fn, argnums=(0, 1, 2, 3, 4))(params, *inputs)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=1e-4)


def test_bf16_backward_gradients_close():
    """The default TPU configuration runs the bf16 custom-VJP backward —
    its parameter and input gradients must track the f32 XLA reference in
    direction and magnitude (bf16 matmul tolerance)."""
    cfg, params, x = _setup()

    def loss_pallas(params, x):
        s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=True,
                                                block_rows=64)
        return _loss_terms(s, f, g, x)

    def loss_ref(params, x):
        s, f, g = F.sdf_value_and_grad_feat(params, cfg, x)
        return _loss_terms(s, f, g, x)

    gp, gx = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    rp, rx = jax.grad(loss_ref, argnums=(0, 1))(params, x)

    def check(a, b, name):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        denom = np.linalg.norm(b)
        assert denom > 0.0, name
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.05, f"{name}: relative grad error {rel:.4f}"
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * denom + 1e-12))
        assert cos > 0.999, f"{name}: cosine {cos:.5f}"

    check(gx, rx, "d/dx")
    flat_p, _ = jax.tree_util.tree_flatten(gp)
    flat_r, _ = jax.tree_util.tree_flatten(rp)
    for i, (a, b) in enumerate(zip(flat_p, flat_r)):
        check(a, b, f"param[{i}]")


def test_flop_model():
    """The hand-counted FLOP log (bench.py MFU accounting): a traced fwd
    logs 4*S FLOPs per padded row, fwd+bwd under jax.grad logs 16*S —
    where S is the sum of per-layer padded MAC counts.  Recomputed here
    independently of the kernel-side constants."""
    from factored_neus_tpu.ops import pallas_sdf as PS

    cfg, params, x = _setup(n=150)
    block = 64
    _, ins, outs, _ = PG._dims(cfg)
    rup = lambda d: ((d + 127) // 128) * 128
    S = sum(rup(i) * rup(o) for i, o in zip(ins, outs))
    n_pad = ((150 + block - 1) // block) * block

    PS.flop_log_start()
    PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                  block_rows=block)
    got_fwd = PS.flop_log_stop()
    assert got_fwd == 2 * 2 * S * n_pad, (got_fwd, S, n_pad)

    def loss(params, x):
        s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                                block_rows=block)
        return _loss_terms(s, f, g, x)

    PS.flop_log_start()
    jax.jit(jax.grad(loss)).lower(params, x)     # trace only — no execution
    got_bwd = PS.flop_log_stop()
    assert got_bwd == (4 + 12) * S * n_pad, (got_bwd, S, n_pad)

    # log is off outside start/stop: no accumulation, no error
    PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                  block_rows=block)
    PS.flop_log_start()
    assert PS.flop_log_stop() == 0.0


def test_fwd_block_decoupled_matches():
    """fwd_block_rows != bwd block_rows: values and gradients unchanged
    (the blocks only partition work)."""
    cfg, params, x = _setup(n=150)

    def loss(params, x, fb):
        s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                                block_rows=32,
                                                fwd_block_rows=fb)
        return _loss_terms(s, f, g, x)

    l64 = float(loss(params, x, 64))
    l_same = float(loss(params, x, None))
    np.testing.assert_allclose(l64, l_same, rtol=1e-6)
    g64, gx64 = jax.grad(loss, argnums=(0, 1))(params, x, 64)
    gs, gxs = jax.grad(loss, argnums=(0, 1))(params, x, None)
    np.testing.assert_allclose(np.asarray(gx64), np.asarray(gxs), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g64),
                    jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_hbm_stash_backward_close():
    """FNEUS_PG_HBM_STASH variant: the bwd reads bf16 pre-activations from
    the fwd's HBM stash instead of recomputing the primal chain.  The bf16
    stash rounds the recomputed activations, so gradients track the f32
    XLA reference within the same tolerance class as the bf16 matmul
    default (direction + magnitude), and values are exact (the stash never
    feeds the primal outputs)."""
    cfg, params, x = _setup(n=150)

    s_ref, f_ref, g_ref = F.sdf_value_and_grad_feat(params, cfg, x)
    s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                            block_rows=64, stash=True)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)

    def loss_stash(params, x):
        s, f, g = PG.sdf_value_grad_feat_pallas(params, cfg, x, bf16=False,
                                                block_rows=64, stash=True)
        return _loss_terms(s, f, g, x)

    def loss_ref(params, x):
        s, f, g = F.sdf_value_and_grad_feat(params, cfg, x)
        return _loss_terms(s, f, g, x)

    gp, gx = jax.grad(loss_stash, argnums=(0, 1))(params, x)
    rp, rx = jax.grad(loss_ref, argnums=(0, 1))(params, x)

    def check(a, b, name):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        denom = np.linalg.norm(b)
        assert denom > 0.0, name
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.05, f"{name}: relative grad error {rel:.4f}"
        cos = float(np.dot(a, b) / (np.linalg.norm(a) * denom + 1e-12))
        assert cos > 0.999, f"{name}: cosine {cos:.5f}"

    check(gx, rx, "d/dx")
    for i, (a, b) in enumerate(zip(jax.tree_util.tree_leaves(gp),
                                   jax.tree_util.tree_leaves(rp))):
        check(a, b, f"param[{i}]")


def test_compiler_params_gating(monkeypatch):
    """The raised scoped-VMEM budget (FNEUS_PG_VMEM_MB) must reach Mosaic
    only on real-TPU lowering: interpret mode gets None (pl.pallas_call
    rejects TPU CompilerParams off-TPU), and a non-positive budget keeps
    the backend default."""
    from jax.experimental.pallas import tpu as pltpu

    # off-TPU (this suite): interpret mode -> no compiler params
    assert PG._interpret()
    assert PG._compiler_params() is None

    # pretend TPU lowering: params carry the env-scaled byte budget
    monkeypatch.setattr(PG, "_interpret", lambda: False)
    monkeypatch.setattr(PG, "VMEM_LIMIT_MB", 48)
    cp = PG._compiler_params()
    assert isinstance(cp, pltpu.CompilerParams)
    assert cp.vmem_limit_bytes == 48 * 2 ** 20

    # disabled -> backend default even when lowering for TPU
    monkeypatch.setattr(PG, "VMEM_LIMIT_MB", 0)
    assert PG._compiler_params() is None
