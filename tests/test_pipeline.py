"""Inference Pipeline API tests (tiny nets, no checkpoints needed)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from make_fake_dtu import make_fake_dtu_scene, write_tiny_conf  # noqa: E402
from util_scene import tiny_config, tiny_params  # noqa: E402


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    from factored_neus_tpu.data.datasets import DTUDataset
    from factored_neus_tpu.pipeline import Pipeline
    from factored_neus_tpu.utils import config as CFG

    root = tmp_path_factory.mktemp("pipe")
    make_fake_dtu_scene(str(root / "data" / "fake_scan"), n_views=2,
                        H=24, W=32)
    conf = write_tiny_conf(str(root / "tiny.conf"),
                           str(root / "data" / "CASE_NAME") + "/",
                           str(root / "exp" / "CASE_NAME"))
    c = CFG.load(conf, case="fake_scan")
    ds = DTUDataset(c["dataset"])
    cfg = tiny_config()
    params = tiny_params(cfg)
    return Pipeline(cfg, params, ds, batch_size=128)


def test_render_view(pipe):
    img = pipe.render_view(0, resolution_level=2)
    assert img.shape == (12, 16, 3)
    assert np.isfinite(img).all()


def test_render_between(pipe):
    img = pipe.render_between(0, 1, 0.5, resolution_level=4)
    assert img.shape == (6, 8, 3)
    assert np.isfinite(img).all()


def test_render_decomposition(pipe):
    maps = pipe.render_decomposition(0, resolution_level=4)
    assert maps["rgb"].shape == (6, 8, 3)
    assert maps["roughness"].shape == (6, 8, 1)
    for k, v in maps.items():
        assert np.isfinite(v).all(), k


def test_extract_mesh(pipe):
    verts, tris = pipe.extract_mesh(resolution=32)
    assert len(verts) > 0 and len(tris) > 0
    # geometric init -> roughly spherical zero set
    r = np.linalg.norm(verts, axis=-1)
    assert 0.2 < r.mean() < 0.9


def test_envmap_and_sdf(pipe):
    env = pipe.envmap(H=16, W=32)
    assert env.shape == (16, 32, 3) and (env >= 0).all()
    s = pipe.sdf(np.zeros((4, 3), np.float32))
    assert s.shape == (4,)
    assert (s < 0).all()   # origin is inside the init sphere


def test_from_experiment_requires_checkpoint(pipe, tmp_path):
    from factored_neus_tpu.pipeline import Pipeline
    conf = tmp_path / "c.conf"
    conf.write_text("""
general {
    base_exp_dir_geo = %s/geo
}
dataset {
    data_dir = %s/
}
""" % (tmp_path, tmp_path))
    with pytest.raises(FileNotFoundError):
        Pipeline.from_experiment(str(conf), stage=1)


def test_relight_swaps_and_restores_envmap(pipe, tmp_path):
    """Pipeline.relight renders under a loaded SG envmap (sg_128.npy,
    ref:models/inverRender.py:614-625) and restores the trained light."""
    rng = np.random.RandomState(5)
    sgs = np.concatenate([rng.randn(16, 3), np.abs(rng.randn(16, 1)) * 20,
                          np.abs(rng.randn(16, 3)) * 3], -1).astype(np.float32)
    env = tmp_path / "envmap_test"
    env.mkdir()
    np.save(str(env / "sg_128.npy"), sgs)

    before = np.asarray(pipe.params["material"]["lgtSGs"]).copy()
    base = pipe.render_decomposition(0, resolution_level=4)["rgb"]
    relit = pipe.relight(str(env), 0, resolution_level=4)
    assert relit.shape == base.shape and np.isfinite(relit).all()
    assert np.abs(relit - base).max() > 1e-4     # the light actually changed
    np.testing.assert_array_equal(
        np.asarray(pipe.params["material"]["lgtSGs"]), before)
