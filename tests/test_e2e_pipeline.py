"""End-to-end three-stage pipeline through the Runner orchestration layer on
a fabricated DTU-format scene (CPU, tiny nets): train -> checkpoint -> chain
-> train -> chain -> train, plus resume."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from make_fake_dtu import make_fake_dtu_scene, write_tiny_conf  # noqa: E402


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data = make_fake_dtu_scene(str(root / "data" / "fake_scan"),
                               n_views=2, H=32, W=40)
    conf = write_tiny_conf(str(root / "tiny.conf"),
                           str(root / "data" / "CASE_NAME") + "/",
                           str(root / "exp" / "CASE_NAME"),
                           iters=4, iters2=4)
    return {"root": root, "conf": conf}


@pytest.mark.skipif(os.environ.get("FNEUS_E2E", "") != "1",
                    reason="~10 min on CPU; set FNEUS_E2E=1 to run "
                           "(the CLI drive in .claude/skills/verify covers it)")
def test_full_pipeline(pipeline_dirs):
    from factored_neus_tpu.train import runner1, runner2, runner3

    conf = pipeline_dirs["conf"]
    exp = pipeline_dirs["root"] / "exp" / "fake_scan"

    # stage 1
    r1 = runner1.Runner(conf, mode="train", case="fake_scan", type="dtu")
    r1.train()
    assert r1.iter_step == 4
    r1.save_checkpoint()
    from factored_neus_tpu.utils import checkpoints as CK
    CK.wait_for_async_saves()           # saves are async; drain before stat
    ck1 = exp / "geometry" / "checkpoints" / "ckpt_000004.npz"
    assert ck1.exists()

    # resume semantics: a fresh runner with is_continue picks up iter 4
    r1b = runner1.Runner(conf, mode="none", case="fake_scan", type="dtu",
                         is_continue=True)
    assert r1b.iter_step == 4

    # stage 2 chains from the stage-1 checkpoint
    r2 = runner2.Runner(conf, mode="train", case="fake_scan", type="dtu")
    # frozen geometry weights must equal stage-1's trained weights
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(r2.params["sdf"]),
                    jax.tree_util.tree_leaves(r1.params["sdf"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    r2.train()
    r2.save_checkpoint()
    CK.wait_for_async_saves()
    assert (exp / "lvis" / "checkpoints" / "ckpt_000004.npz").exists()

    # stage 3 chains from the stage-2 checkpoint
    r3 = runner3.Runner(conf, mode="train", case="fake_scan", type="dtu")
    for a, b in zip(jax.tree_util.tree_leaves(r3.params["lvis"]),
                    jax.tree_util.tree_leaves(r2.params["lvis"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    r3.train()
    assert r3.iter_step == 4


def test_dataset_loader_roundtrip(pipeline_dirs):
    """DTU loader on the fabricated scene: shapes, bbox, ray shapes."""
    from factored_neus_tpu.data.datasets import DTUDataset
    from factored_neus_tpu.utils import config as CFG

    c = CFG.load(pipeline_dirs["conf"], case="fake_scan")
    ds = DTUDataset(c["dataset"])
    assert ds.n_images == 2 and ds.H == 32 and ds.W == 40
    np.testing.assert_allclose(ds.object_bbox_min, [-1.01, -1.01, -1.01],
                               atol=1e-5)
    rays_o, rays_d = ds.gen_rays_at(0, resolution_level=2)
    assert rays_o.shape == (16, 20, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_d), axis=-1),
                               1.0, atol=1e-5)
    # camera sits at radius 3 (fabricated ring)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rays_o[0, 0])),
                               3.0 + 0.4 ** 2 / 6, atol=0.1)
    ro, rd, color, mask = ds.gen_random_rays_at(0, 64)
    assert ro.shape == (64, 3) and color.shape == (64, 3)
    assert mask.shape == (64, 1)
    # central rays look at the sphere: near/far bracket the unit sphere
    near, far = ds.near_far_from_sphere(ro, rd)
    np.testing.assert_allclose(np.asarray(far) - np.asarray(near), 2.0,
                               atol=1e-5)


def test_rays_hit_rendered_sphere(pipeline_dirs):
    """Ray geometry consistency: pixels marked as sphere hits in the
    fabricated mask correspond to rays that intersect the r=0.5 sphere."""
    from factored_neus_tpu.data.datasets import DTUDataset
    from factored_neus_tpu.utils import config as CFG

    c = CFG.load(pipeline_dirs["conf"], case="fake_scan")
    ds = DTUDataset(c["dataset"])
    rays_o, rays_d = ds.gen_rays_at(0, resolution_level=1)
    o = np.asarray(rays_o).reshape(-1, 3)
    d = np.asarray(rays_d).reshape(-1, 3)
    b = 2 * np.sum(o * d, -1)
    c_ = np.sum(o * o, -1) - 0.25
    hits_geom = (b * b - 4 * c_) > 0
    mask = np.asarray(ds.masks[0, :, :, 0] > 0.5).reshape(-1)
    agree = (hits_geom == mask).mean()
    assert agree > 0.99, f"ray/mask agreement {agree}"


@pytest.mark.skipif(os.environ.get("FNEUS_E2E", "") != "1",
                    reason="~11 min of CPU compile; set FNEUS_E2E=1 to run "
                           "(verified passing in round 2)")
def test_sharded_runner_trains_and_validates(pipeline_dirs, tmp_path):
    """The --shard wiring end to end on the 8-virtual-device mesh: a
    sharded Runner trains (sharded step fn), renders a validation image
    (sharded render fn), and extracts a mesh (sharded grid fill)."""
    from make_fake_dtu import write_tiny_conf
    from factored_neus_tpu.train import runner1

    conf = write_tiny_conf(str(tmp_path / "tiny.conf"),
                           str(pipeline_dirs["root"] / "data" / "CASE_NAME")
                           + "/",
                           str(tmp_path / "exp" / "CASE_NAME"),
                           iters=2, iters2=2)
    r = runner1.Runner(conf, mode="train", case="fake_scan", type="dtu",
                       use_mesh_sharding=True)
    assert r.mesh is not None and r.mesh.devices.size == 8
    r.train()
    assert r.iter_step == 2
    r.validate_image(idx=0, resolution_level=8)
    out = r.validate_mesh(world_space=False, resolution=24)
    assert os.path.exists(out)
