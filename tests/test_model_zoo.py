"""Model zoo smoke tests (reference tests: model_zoo.get/get_config_file)."""

import pytest

from vnext_tpu import model_zoo


def test_every_zoo_entry_builds():
    for path in model_zoo.list_configs():
        model, params, cfg = model_zoo.get(path, trained=False, init=False)
        assert params is None
        assert cfg.MODEL.META_ARCHITECTURE in ("IDOL", "SeqFormer", "MaskFormer")
        assert type(model).__name__ == cfg.MODEL.META_ARCHITECTURE


def test_get_config_file_missing_raises():
    with pytest.raises(RuntimeError):
        model_zoo.get_config_file("idol/nonexistent.yaml")
    with pytest.raises(RuntimeError):
        model_zoo.get_checkpoint_url("idol/nonexistent.yaml")


def test_checkpoint_url_env_override(monkeypatch):
    monkeypatch.setenv("VNEXT_WEIGHTS", "/data/w")
    url = model_zoo.get_checkpoint_url("idol/ytvis19_r50.yaml")
    assert url == "/data/w/IDOL_YTVIS19_R50.pth"


def test_tiny_zoo_get_with_init(tmp_path, monkeypatch):
    """Full get() path incl. param init, on a tiny quick-schedule entry."""
    import numpy as np

    model, params, cfg = model_zoo.get("quick_schedules/idol_instant_test.yaml")
    assert params is not None
    n = sum(np.prod(x.shape) for x in __import__("jax").tree_util.tree_leaves(params))
    assert n > 1000
