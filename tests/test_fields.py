"""Field-network tests: shapes, initialization properties, gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from factored_neus_tpu.models import fields as F
from factored_neus_tpu.models import materials as MAT


def test_sdf_shapes_and_sphere_init():
    cfg = F.SDFConfig()
    params = F.sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (128, 3)) * 0.8
    out = F.sdf_apply(params, cfg, pts)
    assert out.shape == (128, 257)
    # geometric init approximates sdf(x) ~ |x| - bias: check monotonicity in
    # radius and zero-level near r = bias
    r = jnp.linspace(0.05, 1.5, 64)
    pts_r = jnp.stack([r, jnp.zeros_like(r), jnp.zeros_like(r)], -1)
    sdf_r = np.asarray(F.sdf_value(params, cfg, pts_r))
    corr = np.corrcoef(np.asarray(r), sdf_r)[0, 1]
    assert corr > 0.95
    # zero crossing within ~0.25 of the bias radius
    zero_r = float(r[np.argmin(np.abs(sdf_r))])
    assert abs(zero_r - 0.5) < 0.25


def test_sdf_gradient_matches_fd():
    cfg = F.SDFConfig()
    params = F.sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(2), (8, 3)) * 0.3
    g = np.asarray(F.sdf_gradient(params, cfg, pts))
    eps = 1e-3
    for ax in range(3):
        dp = jnp.zeros_like(pts).at[:, ax].set(eps)
        fd = (np.asarray(F.sdf_value(params, cfg, pts + dp))
              - np.asarray(F.sdf_value(params, cfg, pts - dp))) / (2 * eps)
        np.testing.assert_allclose(g[:, ax], fd, atol=5e-2, rtol=5e-2)


def test_sdf_gradient_double_backprop():
    """Eikonal-through-gradient must be differentiable wrt params."""
    cfg = F.SDFConfig(n_layers=2, d_hidden=32, d_out=33, skip_in=())
    params = F.sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(3), (16, 3)) * 0.5

    def loss(p):
        g = F.sdf_gradient(p, cfg, pts)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    grads = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert np.isfinite(total) and total > 0


def test_sdf_scale_invariance_of_zero_set():
    cfg2 = F.SDFConfig(scale=2.0)
    params = F.sdf_init(jax.random.PRNGKey(0), cfg2)
    pts = jax.random.normal(jax.random.PRNGKey(1), (4, 3)) * 0.3
    out = F.sdf_apply(params, cfg2, pts)
    assert out.shape == (4, 257)


def test_rendering_network():
    cfg = F.RenderingConfig()
    params = F.rendering_init(jax.random.PRNGKey(0), cfg)
    n = 64
    rgb = F.rendering_apply(params, cfg,
                            jnp.zeros((n, 3)), jnp.ones((n, 3)),
                            jnp.ones((n, 3)), jnp.zeros((n, 256)))
    assert rgb.shape == (n, 3)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()


def test_nerf_background():
    cfg = F.NeRFConfig()
    params = F.nerf_init(jax.random.PRNGKey(0), cfg)
    alpha, rgb = F.nerf_apply(params, cfg, jnp.ones((32, 4)) * 0.3,
                              jnp.ones((32, 3)))
    assert alpha.shape == (32, 1) and rgb.shape == (32, 3)


def test_variance():
    p = F.variance_init(0.3)
    np.testing.assert_allclose(float(F.variance_inv_s(p)), np.exp(3.0),
                               rtol=1e-6)


def test_refcolor():
    cfg = F.RefColorConfig()
    params = F.refcolor_init(jax.random.PRNGKey(0), cfg)
    n = 32
    key = jax.random.PRNGKey(1)
    out = F.refcolor_apply(params, cfg,
                           jax.random.normal(key, (n, 3)),
                           jax.random.normal(key, (n, 256)),
                           jax.random.normal(key, (n, 3)),
                           jax.random.normal(key, (n, 3)))
    for k in ("rgb", "specular_rgb", "diffuse_rgb"):
        assert out[k].shape == (n, 3)
        v = np.asarray(out[k])
        assert (v >= 0).all() and (v <= 1).all()
    # specular head is single-channel repeated
    s = np.asarray(out["specular_rgb"])
    np.testing.assert_allclose(s[:, 0], s[:, 1])
    np.testing.assert_allclose(s[:, 0], s[:, 2])


def test_lvis():
    cfg = F.LvisConfig()
    params = F.lvis_init(jax.random.PRNGKey(0), cfg)
    v = F.lvis_apply(params, cfg, jnp.zeros((16, 3)), jnp.ones((16, 3)))
    assert v.shape == (16, 1)
    assert (np.asarray(v) >= 0).all() and (np.asarray(v) <= 1).all()


def test_indirect_light():
    cfg = F.IndirectLightConfig()
    params = F.indirect_light_init(jax.random.PRNGKey(0), cfg)
    sgs = F.indirect_light_apply(params, cfg, jnp.zeros((8, 3)))
    assert sgs.shape == (8, 24, 7)
    s = np.asarray(sgs)
    np.testing.assert_allclose(np.linalg.norm(s[..., :3], axis=-1), 1.0,
                               atol=1e-5)                    # unit axes
    assert (s[..., 3] >= 0.1).all() and (s[..., 3] <= 30.1).all()  # sharpness
    assert (s[..., 4:] >= 0).all()                            # amplitude


def test_envmap_material_init_energy():
    cfg = MAT.EnvmapMaterialConfig()
    params = MAT.envmap_material_init(jax.random.PRNGKey(0), cfg)
    sgs = params["lgtSGs"]
    assert sgs.shape == (128, 7)
    # amplitudes white (channels equal)
    s = np.asarray(sgs)
    np.testing.assert_allclose(s[:, 4], s[:, 5], rtol=1e-5)
    np.testing.assert_allclose(s[:, 4], s[:, 6], rtol=1e-5)
    assert (s[:, 3] >= 10.0).all()
    # energy normalized to ~2*pi*0.8 per channel
    from factored_neus_tpu.ops import sg as SG
    energy = np.asarray(SG.compute_energy(jnp.asarray(s)))
    np.testing.assert_allclose(energy.sum(0), 2 * np.pi * 0.8, rtol=1e-4)
    # lobes duplicated fibonacci
    np.testing.assert_allclose(s[:64, :3], s[64:, :3], atol=1e-6)


def test_envmap_material_forward():
    cfg = MAT.EnvmapMaterialConfig(vis_nsamp=4)
    params = MAT.envmap_material_init(jax.random.PRNGKey(0), cfg)
    lvis_cfg = F.LvisConfig()
    lvis_params = F.lvis_init(jax.random.PRNGKey(1), lvis_cfg)
    P = 8
    key = jax.random.PRNGKey(2)
    pts = jax.random.normal(key, (P, 3)) * 0.3
    dirs = jax.random.normal(key, (P, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    n = jax.random.normal(jax.random.PRNGKey(3), (P, 3))
    indi = jnp.zeros((P, 24, 7)).at[..., 2].set(1.0).at[..., 3].set(5.0)
    out = MAT.envmap_material_apply(params, cfg, key, pts, dirs, n,
                                    jnp.zeros((P, 3)), indi,
                                    lvis_params, lvis_cfg)
    for k in ("rgb", "env_rgb", "indir_rgb", "diffuse_albedo",
              "specular_albedo", "diffuse_rgb", "specular_rgb"):
        assert out[k].shape == (P, 3), k
        v = np.asarray(out[k])
        assert np.isfinite(v).all() and (v >= 0).all() and (v <= 1).all(), k
    assert out["roughness"].shape == (P, 1)
    r = np.asarray(out["roughness"])
    assert (r >= 0.09).all() and (r <= 0.99).all()
    assert np.isfinite(float(out["encoder_loss"]))


def test_vjp_fused_grad_matches_jax_grad():
    """The shared-forward (jax.vjp) gradient must equal jax.grad's, including
    under a second differentiation (eikonal double-backprop)."""
    cfg = F.SDFConfig(n_layers=2, d_hidden=32, d_out=33, skip_in=(),
                      multires=4)
    params = F.sdf_init(jax.random.PRNGKey(0), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(1), (16, 3)) * 0.4

    s1, f1, g1 = F.sdf_value_and_grad_feat(params, cfg, pts)
    out = F.sdf_apply(params, cfg, pts)
    g2 = F.sdf_gradient(params, cfg, pts)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(out[:, 0]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-6)

    def eik_fused(p):
        _, _, g = F.sdf_value_and_grad_feat(p, cfg, pts)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    def eik_plain(p):
        g = F.sdf_gradient(p, cfg, pts)
        return jnp.mean((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2)

    ga = jax.grad(eik_fused)(params)
    gb = jax.grad(eik_plain)(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)


def test_kl_divergence_saturated_latent_is_finite():
    """A latent saturating sigmoid to exactly 0/1 in f32 must not log(0)
    in either the masked or unmasked branch."""
    raw = jnp.full((16, 4), 40.0)           # sigmoid -> 1.0 exactly in f32
    raw = raw.at[:, 1].set(-40.0)           # sigmoid -> 0.0 exactly
    for mask in (None, jnp.ones((16,)), jnp.zeros((16,))):
        kl = MAT.kl_divergence(0.05, raw, mask=mask)
        assert np.isfinite(float(kl)), f"mask={mask}: kl={kl}"


def test_specular_visibility_extreme_sharpness_finite():
    """Saturating SG sharpness (weights under/overflow) must keep the
    BRDF-lobe visibility finite and in [0, 1] via the one-hot fallback."""
    lvis_cfg = F.LvisConfig()
    lvis_params = F.lvis_init(jax.random.PRNGKey(0), lvis_cfg)
    P = 8
    pts = jax.random.normal(jax.random.PRNGKey(1), (P, 3)) * 0.3
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (P, 1))
    viewdirs = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (P, 1))
    lobes = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (P, 1))
    for lam in (1e-8, 1e9):                 # clips to [0.1, 50]
        vis = MAT.get_specular_visibility(
            jax.random.PRNGKey(2), pts, normals, viewdirs, lvis_params,
            lvis_cfg, lobes, jnp.full((P, 1), lam), nsamp=6)
        v = np.asarray(vis)
        assert np.isfinite(v).all()
        assert (v >= 0).all() and (v <= 1 + 1e-5).all()


def test_specular_visibility_degenerate_rows_use_best_sample():
    """When every SG weight underflows, the one-hot fallback must average
    only the best-aligned sample instead of returning 0/TINY."""
    logw = jnp.asarray([[-200.0, -150.0, -300.0],
                        [-0.5, -1.0, -2.0]])
    weight = jnp.exp(logw)
    wsum = jnp.sum(weight, axis=-1)
    degenerate = ~jnp.isfinite(wsum) | (wsum <= MAT.TINY)
    onehot = jax.nn.one_hot(jnp.argmax(logw, axis=-1), logw.shape[-1],
                            dtype=weight.dtype)
    weight = jnp.where(degenerate[:, None], onehot, weight)
    vis_samples = jnp.asarray([[0.1, 0.9, 0.3], [0.1, 0.9, 0.3]])
    vis = jnp.sum(vis_samples * weight, -1) / (jnp.sum(weight, -1) + MAT.TINY)
    v = np.asarray(vis)
    assert abs(v[0] - 0.9) < 1e-4           # degenerate row -> best sample
    assert 0.0 < v[1] < 0.9                 # healthy row -> true average


def test_lvis_apply_outer_matches_flat():
    """The factorized outer Lvis evaluation (stage-3 MC sweep fast path)
    equals the flat per-pair path up to f32 partial-sum order."""
    import jax
    import jax.numpy as jnp
    cfg = F.LvisConfig()
    params = F.lvis_init(jax.random.PRNGKey(0), cfg)
    P, D = 7, 11
    pts = jax.random.normal(jax.random.PRNGKey(1), (P, 3)) * 0.4
    dirs = jax.random.normal(jax.random.PRNGKey(2), (D, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    outer = F.lvis_apply_outer(params, cfg, pts, dirs)          # [D, P]
    flat_p = jnp.broadcast_to(pts[None], (D, P, 3)).reshape(-1, 3)
    flat_d = jnp.broadcast_to(dirs[:, None], (D, P, 3)).reshape(-1, 3)
    flat = F.lvis_apply(params, cfg, flat_p, flat_d).reshape(D, P)
    np.testing.assert_allclose(np.asarray(outer), np.asarray(flat),
                               rtol=2e-5, atol=2e-6)
