import os
import tempfile

import pytest

from vnext_tpu.config import CfgNode, get_cfg, LazyCall, LazyConfig, instantiate


def test_defaults_clone_independent():
    c1 = get_cfg()
    c2 = get_cfg()
    c1.MODEL.META_ARCHITECTURE = "Other"
    assert c2.MODEL.META_ARCHITECTURE == "IDOL"


def test_attribute_access_and_freeze():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.5
    assert cfg.SOLVER.BASE_LR == 0.5
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.BASE_LR = 0.1
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 0.1
    assert cfg.SOLVER.BASE_LR == 0.1


def test_unknown_key_rejected_in_merge():
    cfg = get_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])
    with pytest.raises(KeyError):
        cfg.merge_from_other_cfg(CfgNode({"NOT_A_KEY": 1}))


def test_merge_from_list_type_coercion():
    cfg = get_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.02", "SOLVER.MAX_ITER", "100"])
    assert cfg.SOLVER.BASE_LR == 0.02
    assert isinstance(cfg.SOLVER.MAX_ITER, int) and cfg.SOLVER.MAX_ITER == 100


def test_merge_from_file_with_base():
    with tempfile.TemporaryDirectory() as d:
        base = os.path.join(d, "base.yaml")
        child = os.path.join(d, "child.yaml")
        with open(base, "w") as f:
            f.write("SOLVER:\n  BASE_LR: 0.25\n")
        with open(child, "w") as f:
            f.write(f"_BASE_: base.yaml\nSOLVER:\n  MAX_ITER: 7\n")
        cfg = get_cfg()
        cfg.merge_from_file(child)
        assert cfg.SOLVER.BASE_LR == 0.25
        assert cfg.SOLVER.MAX_ITER == 7


def test_dump_roundtrip():
    import yaml

    cfg = get_cfg()
    d = yaml.safe_load(cfg.dump())
    assert d["MODEL"]["META_ARCHITECTURE"] == "IDOL"


def test_new_allowed_subtree():
    cfg = CfgNode()
    cfg.set_new_allowed(True)
    cfg.FOO = CfgNode(new_allowed=True)
    cfg.FOO.BAR = 3
    assert cfg.FOO.BAR == 3


class _Dummy:
    def __init__(self, a, b=2):
        self.a = a
        self.b = b


def test_lazycall_instantiate():
    node = LazyCall(_Dummy)(a=LazyCall(_Dummy)(a=1))
    obj = instantiate(node)
    assert isinstance(obj, _Dummy) and isinstance(obj.a, _Dummy)
    assert obj.a.a == 1 and obj.b == 2


def test_lazyconfig_load_and_override():
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "cfg.py")
        with open(path, "w") as f:
            f.write(
                "from vnext_tpu.config import LazyCall\n"
                "import tests.test_config as m\n"
                "model = LazyCall(m._Dummy)(a=5, b=6)\n"
                "lr = 0.1\n"
            )
        cfg = LazyConfig.load(path)
        assert cfg.lr == 0.1
        LazyConfig.apply_overrides(cfg, ["model.a=9", "lr=0.5"])
        assert cfg.lr == 0.5
        obj = instantiate(cfg.model)
        assert obj.a == 9 and obj.b == 6


def test_lazyconfig_to_py():
    from vnext_tpu.config.lazy import LazyCall, LazyConfig
    from vnext_tpu.models.layers import MLP

    cfg = {"head": LazyCall(MLP)(in_dim=4, hidden_dim=8, num_layers=2), "lr": 0.02}
    code = LazyConfig.to_py(cfg)
    assert "cfg.lr = 0.02" in code
    assert "L(vnext_tpu.models.layers.MLP)(" in code
    assert "in_dim=4" in code and "num_layers=2" in code
