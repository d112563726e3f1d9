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


def test_checkpoint_urls_are_published_release_urls():
    """Every zoo URL is the actual published release URL
    (projects/IDOL/IDOL.md:33-55, projects/InstMove/InstMove.md:24)."""
    url = model_zoo.get_checkpoint_url("idol/ytvis19_r50.yaml")
    assert url == (
        "https://huggingface.co/QHL067/VNext_ECCV/resolve/main/IDOL/"
        "YTVIS19_R50_502AP.pth"
    )
    for path in model_zoo.list_configs():
        assert model_zoo.get_checkpoint_url(path).startswith("https://")


def test_resolve_checkpoint_cache(monkeypatch, tmp_path):
    """$VNEXT_WEIGHTS cache hit resolves without any network access."""
    monkeypatch.setenv("VNEXT_WEIGHTS", str(tmp_path))
    fake = tmp_path / "YTVIS19_R50_502AP.pth"
    fake.write_bytes(b"x")
    assert model_zoo.resolve_checkpoint("idol/ytvis19_r50.yaml") == str(fake)
    # absent + download disabled -> None (caller decides)
    assert model_zoo.resolve_checkpoint("idol/ovis_r50.yaml", download=False) is None


def test_trained_get_with_real_checkpoint():
    """Integration: zoo -> download/cache -> torch_import -> one-clip forward.

    Runs only where the real released checkpoint is available (cached in
    $VNEXT_WEIGHTS or downloadable); skipped offline."""
    import os

    local = model_zoo.resolve_checkpoint(
        "idol/ytvis19_r50.yaml", download=os.environ.get("VNEXT_ALLOW_DOWNLOAD") == "1"
    )
    if local is None:
        pytest.skip("released IDOL checkpoint not cached and downloads disabled")
    import jax.numpy as jnp
    import numpy as np

    from vnext_tpu.models.idol import IDOL

    model, params, cfg = model_zoo.get("idol/ytvis19_r50.yaml", trained=True)
    frames = jnp.asarray(np.zeros((1, 128, 192, 3), np.float32))
    out = model.apply(
        {"params": params}, frames, jnp.asarray([[128, 192]]), method=IDOL.inference
    )
    assert out["pred_logits"].shape[1] == cfg.MODEL.IDOL.NUM_OBJECT_QUERIES


def test_tiny_zoo_get_with_init(tmp_path, monkeypatch):
    """Full get() path incl. param init, on a tiny quick-schedule entry."""
    import numpy as np

    model, params, cfg = model_zoo.get("quick_schedules/idol_instant_test.yaml")
    assert params is not None
    n = sum(np.prod(x.shape) for x in __import__("jax").tree_util.tree_leaves(params))
    assert n > 1000
