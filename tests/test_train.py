"""Train-step tests: loss decreases on a tiny synthetic scene; sharded and
single-device paths agree; stage-2/3 steps run and update only their groups."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factored_neus_tpu.parallel import sharding as SH
from factored_neus_tpu.train import stage1, stage2, stage3
from factored_neus_tpu.train.common import TrainConfig
from factored_neus_tpu.utils import schedule

from util_scene import ring_cameras, tiny_config, tiny_params


@pytest.fixture(scope="module")
def scene():
    return ring_cameras(n_views=2, H=16, W=16)


def _tree_diff(a, b):
    return sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_lr_schedule_matches_reference_formula():
    # warmup: linear; then cosine down to alpha*base
    f0 = float(schedule.lr_factor(0, 100.0, 1000, 0.05))
    f50 = float(schedule.lr_factor(50, 100.0, 1000, 0.05))
    f100 = float(schedule.lr_factor(100, 100.0, 1000, 0.05))
    f1000 = float(schedule.lr_factor(1000, 100.0, 1000, 0.05))
    assert f0 == 0.0 and abs(f50 - 0.5) < 1e-6 and abs(f100 - 1.0) < 1e-6
    np.testing.assert_allclose(f1000, 0.05, atol=1e-6)
    # anneal ratio
    assert float(schedule.cos_anneal_ratio(123, 0.0)) == 1.0
    assert abs(float(schedule.cos_anneal_ratio(50, 100.0)) - 0.5) < 1e-6


def test_stage1_loss_decreases(scene):
    cfg = tiny_config()
    params = tiny_params(cfg)
    tcfg = TrainConfig(batch_size=64, end_iter=200, warm_up_end=0,
                       learning_rate=5e-4, anneal_end=0.0)
    opt_init, step_fn = stage1.make_train_step(cfg, tcfg, mesh=None)
    opt_state = opt_init(params)
    key = jax.random.PRNGKey(0)
    losses = []
    for it in range(30):
        k = jax.random.fold_in(key, it)
        params, opt_state, m = step_fn(params, opt_state, scene,
                                       jnp.asarray(it % 2), k,
                                       jnp.asarray(it))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_stage1_sharded_matches_single(scene):
    """8-device CPU mesh: sharded step must track the single-device step."""
    cfg = tiny_config()
    params = tiny_params(cfg)
    tcfg = TrainConfig(batch_size=64, end_iter=100, warm_up_end=0)
    mesh = SH.make_mesh()
    assert mesh.devices.size == 8

    opt_init_s, step_s = stage1.make_train_step(cfg, tcfg, mesh=mesh)
    opt_init_1, step_1 = stage1.make_train_step(cfg, tcfg, mesh=None)
    key = jax.random.PRNGKey(1)

    # the step donates params/opt_state buffers — give each path its own copy
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    p_s = copy(params)
    p_1 = copy(params)
    o_s = opt_init_s(p_s)
    o_1 = opt_init_1(p_1)
    p_s, o_s, m_s = step_s(p_s, o_s, scene, jnp.asarray(0), key,
                           jnp.asarray(0))
    p_1, o_1, m_1 = step_1(p_1, o_1, scene, jnp.asarray(0), key,
                           jnp.asarray(0))
    # different per-device RNG -> different rays, but both losses finite and
    # the parameter update magnitudes comparable
    assert np.isfinite(float(m_s["loss"])) and np.isfinite(float(m_1["loss"]))
    d_s = _tree_diff(p_s, params)
    d_1 = _tree_diff(p_1, params)
    assert d_s > 0 and d_1 > 0
    assert 0.2 < d_s / d_1 < 5.0


def test_stage2_step_updates_only_lvis_indirect(scene):
    cfg = tiny_config()
    params = tiny_params(cfg)
    tcfg = TrainConfig(batch_size=16, end_iter=100, warm_up_end=0)
    opt_init, step_fn = stage2.make_train_step(cfg, tcfg, mesh=None)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    p_in = copy(params)
    opt_state = opt_init(p_in)
    p2, _, m = step_fn(p_in, opt_state, scene, jnp.asarray(0),
                       jax.random.PRNGKey(2), jnp.asarray(0))
    assert np.isfinite(float(m["loss"]))
    assert _tree_diff(p2["lvis"], params["lvis"]) > 0
    assert _tree_diff(p2["indirect"], params["indirect"]) > 0
    for frozen in ("sdf", "color", "nerf", "ref_color", "variance",
                   "material"):
        assert _tree_diff(p2[frozen], params[frozen]) == 0.0, frozen


def test_stage3_step_updates_only_material(scene):
    cfg = tiny_config()
    params = tiny_params(cfg)
    tcfg = TrainConfig(batch_size=16, end_iter=100, warm_up_end=0)
    opt_init, step_fn = stage3.make_train_step(cfg, tcfg, mesh=None)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    p_in = copy(params)
    opt_state = opt_init(p_in)
    p3, _, m = step_fn(p_in, opt_state, scene, jnp.asarray(0),
                       jax.random.PRNGKey(3), jnp.asarray(0))
    assert np.isfinite(float(m["loss"]))
    assert _tree_diff(p3["material"], params["material"]) > 0
    for frozen in ("sdf", "color", "nerf", "ref_color", "variance", "lvis",
                   "indirect"):
        assert _tree_diff(p3[frozen], params[frozen]) == 0.0, frozen


def test_checkpoint_roundtrip(tmp_path):
    from factored_neus_tpu.utils import checkpoints as CK
    cfg = tiny_config()
    params = tiny_params(cfg)
    path = CK.save_checkpoint(str(tmp_path), 1234, {
        "sdf_network_fine": params["sdf"],
        "variance_network_fine": params["variance"],
        "iter_step": 1234,
    })
    assert path.endswith("ckpt_001234.npz")
    assert CK.latest_checkpoint(str(tmp_path)) == path
    assert CK.latest_checkpoint(str(tmp_path), end_iter=100) is None
    loaded = CK.load_checkpoint(path)
    assert int(loaded["iter_step"]) == 1234
    for a, b in zip(jax.tree_util.tree_leaves(loaded["sdf_network_fine"]),
                    jax.tree_util.tree_leaves(params["sdf"])):
        np.testing.assert_array_equal(a, b)


def test_stage2_stage3_sharded(scene):
    """Stages 2 and 3 compile and run on the 8-device mesh too."""
    cfg = tiny_config()
    params = tiny_params(cfg)
    tcfg = TrainConfig(batch_size=32, end_iter=100, warm_up_end=0)
    mesh = SH.make_mesh()
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)

    oi2, sf2 = stage2.make_train_step(cfg, tcfg, mesh=mesh)
    p = copy(params)
    o = oi2(p)
    p, o, m2 = sf2(p, o, scene, jnp.asarray(0), jax.random.PRNGKey(0),
                   jnp.asarray(0))
    assert np.isfinite(float(m2["loss"]))

    oi3, sf3 = stage3.make_train_step(cfg, tcfg, mesh=mesh)
    p = copy(params)
    o = oi3(p)
    p, o, m3 = sf3(p, o, scene, jnp.asarray(0), jax.random.PRNGKey(1),
                   jnp.asarray(0))
    assert np.isfinite(float(m3["loss"]))


def test_sharded_params_stay_replicated(scene):
    """Without the gradient psum each chip applies a different update and the
    'replicated' params silently diverge — assert per-device shards agree
    bit-for-bit after several steps."""
    cfg = tiny_config()
    params = tiny_params(cfg)
    tcfg = TrainConfig(batch_size=64, end_iter=100, warm_up_end=0)
    mesh = SH.make_mesh()
    opt_init, step_fn = stage1.make_train_step(cfg, tcfg, mesh=mesh)
    copy = lambda t: jax.tree_util.tree_map(lambda x: jnp.array(x), t)
    p = copy(params)
    o = opt_init(p)
    key = jax.random.PRNGKey(5)
    for it in range(3):
        p, o, m = step_fn(p, o, scene, jnp.asarray(it % 2),
                          jax.random.fold_in(key, it), jnp.asarray(it))
    leaf = jax.tree_util.tree_leaves(p)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) >= 2
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_render_fns_sharded_match_single(scene):
    """Validation render fns sharded over an 8-device mesh reproduce the
    single-device per-ray outputs (stage 1 exactly; stages 2/3 use
    per-device RNG, so only shapes/finiteness are checked there)."""
    cfg = tiny_config()
    params = tiny_params(cfg)
    tcfg = TrainConfig(batch_size=64, end_iter=100, warm_up_end=0,
                       anneal_end=0.0)
    mesh = SH.make_mesh()
    B = 16
    ang = jnp.linspace(-0.3, 0.3, B)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -3.0]]), (B, 1))
    rays_d = jnp.stack([jnp.sin(ang), jnp.zeros(B), jnp.cos(ang)], -1)
    mid = -jnp.sum(rays_o * rays_d, -1, keepdims=True) \
        / jnp.sum(rays_d ** 2, -1, keepdims=True)
    near, far = mid - 1.0, mid + 1.0

    single = stage1.make_render_fn(cfg, tcfg)
    sharded = stage1.make_render_fn(cfg, tcfg, mesh=mesh)
    o1 = single(params, rays_o, rays_d, near, far, jnp.asarray(5))
    o8 = sharded(params, rays_o, rays_d, near, far, jnp.asarray(5))
    assert "gradient_error" in o1 and "gradient_error" not in o8
    for k in o8:
        np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o8[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)

    key = jax.random.PRNGKey(7)
    for mod, dropped in ((stage2, ()), (stage3, ("diffuse_loss",))):
        fn = mod.make_render_fn(cfg, mesh=mesh)
        out = fn(params, rays_o, rays_d, near, far, key)
        for k, v in out.items():
            assert v.shape[0] == B, (k, v.shape)
            assert np.isfinite(np.asarray(v)).all(), k
        for k in dropped:
            assert k not in out


def test_multi_step_matches_singles(scene):
    """A k_steps block (one lax.scan program) follows the exact same
    parameter trajectory as k single steps whose keys are folded by
    absolute step — the contract runner1's block mode relies on."""
    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=32, end_iter=100, warm_up_end=0,
                       learning_rate=5e-4, anneal_end=0.0)
    K = 4
    key = jax.random.PRNGKey(7)
    idxs = [0, 1, 1, 0]

    p1 = tiny_params(cfg)
    opt_init, single = stage1.make_train_step(cfg, tcfg, mesh=None)
    o1 = opt_init(p1)
    metrics_single = []
    for it in range(K):
        p1, o1, m = single(p1, o1, scene, jnp.asarray(idxs[it]),
                           jax.random.fold_in(key, it), jnp.asarray(it))
        metrics_single.append(float(m["loss"]))

    p2 = tiny_params(cfg)
    _, multi = stage1.make_train_step(cfg, tcfg, mesh=None, k_steps=K)
    o2 = opt_init(p2)
    p2, o2, ms = multi(p2, o2, scene, jnp.asarray(idxs), key,
                       jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(ms["loss"]),
                               np.asarray(metrics_single), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mod", [stage2, stage3])
def test_multi_step_matches_singles_stage23(scene, mod):
    """Stages 2/3 share the multi-step contract (common.multi_step_wrapper):
    a K-block equals K absolute-step-folded single steps."""
    cfg = tiny_config()
    tcfg = TrainConfig(batch_size=16, end_iter=100, warm_up_end=0,
                       learning_rate=5e-4, anneal_end=0.0)
    K = 3
    key = jax.random.PRNGKey(11)
    idxs = [1, 0, 1]

    p1 = tiny_params(cfg)
    opt_init, single = mod.make_train_step(cfg, tcfg, mesh=None)
    o1 = opt_init(p1)
    for it in range(K):
        p1, o1, _ = single(p1, o1, scene, jnp.asarray(idxs[it]),
                           jax.random.fold_in(key, it), jnp.asarray(it))

    p2 = tiny_params(cfg)
    _, multi = mod.make_train_step(cfg, tcfg, mesh=None, k_steps=K)
    o2 = opt_init(p2)
    p2, o2, ms = multi(p2, o2, scene, jnp.asarray(idxs), key,
                       jnp.asarray(0))
    assert all(np.asarray(v).shape[0] == K for v in
               jax.tree_util.tree_leaves(ms))
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_plan_block():
    from factored_neus_tpu.train.common import plan_block
    rng = np.random.RandomState(0)
    perm = rng.permutation(5)
    # blocks stop exactly at event boundaries
    K, idxs, _ = plan_block(96, 1000, 8, (100, 0, 2500), perm, rng, 5)
    assert K == 4 and len(idxs) == 4
    # and at end_iter
    K, _, _ = plan_block(998, 1000, 8, (100,), perm, rng, 5)
    assert K == 2
    # permutation rotates mid-block with the caller's rng, matching the
    # single-step loop's sequence
    rng1 = np.random.RandomState(3)
    perm1 = rng1.permutation(3)
    seq_single, t, p = [], 0, perm1
    for _ in range(7):
        seq_single.append(int(p[t % 3])); t += 1
        if t % 3 == 0:
            p = rng1.permutation(3)
    rng2 = np.random.RandomState(3)
    perm2 = rng2.permutation(3)
    seq_block, t = [], 0
    while t < 7:
        K, idxs, perm2 = plan_block(t, 7, 4, (), perm2, rng2, 3)
        seq_block += idxs; t += K
    assert seq_block == seq_single


def test_async_checkpoint_save(tmp_path):
    """save_checkpoint_async: file content equals a sync save, survives
    immediate donation-style mutation of the source buffers, and surfaces
    writer errors on the next wait."""
    import jax
    import jax.numpy as jnp
    from factored_neus_tpu.utils import checkpoints as CK

    groups = {
        "sdf_network_fine": {"l0": {"w": jnp.arange(12.0).reshape(3, 4),
                                    "b": jnp.ones((4,))}},
        "iter_step": 7,
    }
    CK.save_checkpoint_async(str(tmp_path), 7, groups)
    # mutate the source tree immediately (stands in for buffer donation by
    # the next train step) — the async writer must have snapshotted
    groups["sdf_network_fine"]["l0"]["w"] = \
        groups["sdf_network_fine"]["l0"]["w"] * 0.0
    CK.wait_for_async_saves()
    path = CK.latest_checkpoint(str(tmp_path))
    assert path is not None and path.endswith("ckpt_000007.npz")
    loaded = CK.load_checkpoint(path)
    np.testing.assert_array_equal(
        loaded["sdf_network_fine"]["l0"]["w"],
        np.arange(12.0).reshape(3, 4))
    assert int(loaded["iter_step"]) == 7

    # writer errors are keyed per directory: they surface on the training
    # thread at the next save to the SAME directory and at the global
    # drain (wait_for_async_saves / the atexit hook), never at saves to
    # other directories
    bad = tmp_path / "file_in_the_way"
    bad.write_text("x")
    CK.save_checkpoint_async(str(bad / "sub"), 1, {"iter_step": 1})
    # a failure in one directory must NOT surface at — or drop — a healthy
    # save to a DIFFERENT directory (the three stages save concurrently)
    good = tmp_path / "recovered"
    CK.save_checkpoint_async(str(good), 2, {"iter_step": 2})
    assert CK.latest_checkpoint(str(good)).endswith("ckpt_000002.npz")
    # ... but the next save to the FAILED directory re-raises, and the new
    # (also doomed) write it starts is not dropped by the raise
    with pytest.raises(RuntimeError, match="async checkpoint"):
        CK.save_checkpoint_async(str(bad / "sub"), 3, {"iter_step": 3})

    # read-only lookups never raise (nor clear) stale writer errors
    assert CK.latest_checkpoint(str(tmp_path / "nowhere")) is None

    # the global drain surfaces a stale error from ANY directory — a
    # failure in a directory the process never saves to again cannot
    # silently vanish (runners call this at train-loop exit; the atexit
    # hook covers abnormal exits)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        CK.wait_for_async_saves()
    # once surfaced, the error is cleared
    CK.wait_for_async_saves()


def test_normal_map_device_matches_host_formula():
    """runner1's device-side normal reduction equals the reference's host
    formula (ref:exp_runner.py:325-328) it replaced."""
    import jax
    from factored_neus_tpu.train.runner1 import _normal_map_device

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    B, n_total, n_with_bg = 7, 5, 9
    gradients = jax.random.normal(k1, (B, n_total, 3))
    weights = jax.random.uniform(k2, (B, n_with_bg))
    inside = (jax.random.uniform(k3, (B, n_total)) > 0.5).astype(jnp.float32)

    got = np.asarray(_normal_map_device(gradients, weights, inside))
    want = (np.asarray(gradients)
            * np.asarray(weights)[:, :n_total, None]
            * np.asarray(inside)[..., None]).sum(1)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_checkpoint_tuple_roundtrip(tmp_path):
    """Tuples in plain groups round-trip as tuples (list vs tuple are
    distinct jax pytree node types; resume must match a fresh treedef)."""
    from factored_neus_tpu.utils import checkpoints as CK
    groups = {"grp": {"layers": ({"w": jnp.ones((2, 3))},
                                 {"w": jnp.zeros((3,))})}}
    path = CK.save_checkpoint(str(tmp_path), 5, groups)
    loaded = CK.load_checkpoint(path)
    layers = loaded["grp"]["layers"]
    assert isinstance(layers, tuple) and len(layers) == 2
    np.testing.assert_array_equal(layers[0]["w"], np.ones((2, 3)))
    assert jax.tree_util.tree_structure(loaded["grp"]) == \
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(np.asarray, groups["grp"]))
