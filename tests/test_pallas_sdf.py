"""Fused Pallas SDF kernel vs the reference jnp path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from factored_neus_tpu.models import fields as F
from factored_neus_tpu.ops import pallas_sdf as PS


def _check(cfg, n=300, seed=0, atol=2e-5):
    params = F.sdf_init(jax.random.PRNGKey(seed), cfg)
    pts = jax.random.normal(jax.random.PRNGKey(seed + 1), (n, 3)) * 0.7
    want_full = np.asarray(F.sdf_apply(params, cfg, pts))
    # interpret mode: runs the kernel logic on CPU
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)
    with mock.patch.object(pl, "pallas_call", interp):
        PS._build_kernel.cache_clear()
        got_sdf = np.asarray(PS.sdf_forward_pallas(params, cfg, pts))
        got_full = np.asarray(PS.sdf_forward_pallas(params, cfg, pts,
                                                    full_out=True))
    np.testing.assert_allclose(got_sdf, want_full[:, 0], atol=atol, rtol=1e-4)
    np.testing.assert_allclose(got_full, want_full, atol=atol, rtol=1e-4)


def test_pallas_sdf_standard_config():
    _check(F.SDFConfig())             # 8x256, skip at 4, multires 6


def test_pallas_sdf_no_skip_small():
    _check(F.SDFConfig(n_layers=3, d_hidden=64, d_out=65, skip_in=(),
                       multires=4))


def test_pallas_sdf_scaled():
    _check(F.SDFConfig(scale=2.0))


def test_pallas_sdf_padding_edges():
    # N not a multiple of the block size
    _check(F.SDFConfig(n_layers=2, d_hidden=64, d_out=65, skip_in=(),
                       multires=4), n=7)
