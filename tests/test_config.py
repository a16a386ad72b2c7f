"""HOCON-subset parser + config schema tests."""
import numpy as np
import pytest

from factored_neus_tpu.utils import config as CFG
from factored_neus_tpu.utils.hocon import parse_string


def test_basic_types():
    c = parse_string("""
a = 1
b = 2.5
c = hello
d = True
e = false
f = 5e-4
""")
    assert c["a"] == 1 and isinstance(c["a"], int)
    assert c["b"] == 2.5
    assert c["c"] == "hello"
    assert c["d"] is True and c["e"] is False
    assert c["f"] == 5e-4


def test_nested_and_dotted_access():
    c = parse_string("""
outer {
    inner {
        x = 3
    }
    y = 4
}
""")
    assert c["outer.inner.x"] == 3
    assert c["outer.y"] == 4
    assert c.get("outer.missing", 7) == 7
    assert c.get_int("outer.inner.x") == 3


def test_trailing_commas_and_inline():
    c = parse_string("""
block {
    a = 8,
    b = [4],
    c = 1.0
}
""")
    assert c["block.a"] == 8
    assert c["block.b"] == [4]
    assert c["block.c"] == 1.0


def test_multiline_list_and_comments():
    c = parse_string("""
# leading comment
lst = [
    ./,
    ./models
]
x = 5  # trailing comment
// slash comment
y = 6
""")
    assert c["lst"] == ["./", "./models"]
    assert c["x"] == 5 and c["y"] == 6


def test_case_name_substitution(tmp_path):
    p = tmp_path / "c.conf"
    p.write_text("""
general { base_exp_dir_geo = ./exp/CASE_NAME/geo }
dataset { data_dir = ./data/CASE_NAME/ }
""")
    c = CFG.load(str(p), case="scan97")
    assert c["general.base_exp_dir_geo"] == "./exp/scan97/geo"
    assert c["dataset.data_dir"] == "./data/scan97/"


def test_reference_schema_configs():
    """The shipped wmask/womask confs produce the reference hyperparameters."""
    c = CFG.load("confs/womask.conf", case="x")
    rc = CFG.renderer_config(c)
    assert (rc.n_samples, rc.n_importance, rc.n_outside,
            rc.up_sample_steps) == (64, 64, 32, 4)
    assert rc.sdf.dims == (39,) + (256,) * 8 + (257,)
    assert rc.rendering.dims == (9 + 256 + 24, 256, 256, 256, 256, 3)
    assert rc.nerf.input_ch == 84 and rc.nerf.input_ch_view == 27
    assert rc.refcolor.d_feature == 256
    from factored_neus_tpu.train.common import TrainConfig
    t1 = TrainConfig.from_conf(c, stage=1)
    assert t1.end_iter == 300000 and t1.batch_size == 512
    assert t1.mask_weight == 0.0 and t1.anneal_end == 50000
    t2 = TrainConfig.from_conf(c, stage=2)
    assert t2.end_iter == 10000 and t2.warm_up_end == 1000
    t3 = TrainConfig.from_conf(c, stage=3)
    assert t3.end_iter == 40000

    cw = CFG.load("confs/wmask.conf", case="x")
    rcw = CFG.renderer_config(cw)
    assert rcw.n_outside == 0
    tw = TrainConfig.from_conf(cw, stage=1)
    assert tw.mask_weight == 0.1 and tw.anneal_end == 0.0


def test_comment_markers_inside_values_survive():
    """'//' or '#' preceded by non-whitespace is part of the value (a path
    with a double slash — e.g. an empty CASE_NAME — or a URL must not be
    truncated into a different directory)."""
    from factored_neus_tpu.utils.hocon import parse_string
    c = parse_string(
        "a = ./exp//wmask/geometry   # trailing comment\n"
        "b = http://host/p // trailing\n"
        "// full-line comment\n"
        "c = 3\n")
    assert c["a"] == "./exp//wmask/geometry"
    assert c["b"] == "http://host/p"
    assert c["c"] == 3


def test_get_through_scalar_returns_default():
    from factored_neus_tpu.utils.hocon import parse_string
    c = parse_string("a = 1")
    assert c.get("a.b", "dflt") == "dflt"


def test_attached_hash_and_quoted_markers():
    """HOCON semantics: '#' starts a comment even when attached to a value
    ('300000#note' parses as 300000), and markers inside QUOTED spans are
    value content, never comments (ADVICE r3)."""
    from factored_neus_tpu.utils.hocon import parse_string
    c = parse_string(
        "a = 300000#note\n"
        "b = 'x # y'\n"
        'bb = "u // v"\n'
        "d = './exp//wmask' # tail\n")
    assert c["a"] == 300000
    assert c["b"] == "x # y"
    assert c["bb"] == "u // v"
    assert c["d"] == "./exp//wmask"
