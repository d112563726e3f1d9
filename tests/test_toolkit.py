"""Tests for the bbox tracker toolkit, export, analysis and memory utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.tracking.bbox_trackers import (
    BBoxIOUTracker,
    IOUWeightedHungarianBBoxIOUTracker,
    VanillaHungarianBBoxIOUTracker,
)


def _frame(offset):
    return {
        "boxes": np.asarray(
            [[10 + offset, 10, 30 + offset, 30], [50, 50 + offset, 70, 70 + offset]], np.float64
        ),
        "classes": np.asarray([0, 1]),
        "scores": np.asarray([0.9, 0.8]),
    }


@pytest.mark.parametrize(
    "cls", [BBoxIOUTracker, VanillaHungarianBBoxIOUTracker, IOUWeightedHungarianBBoxIOUTracker]
)
def test_tracker_identity_continuity(cls):
    tracker = cls(track_iou_threshold=0.3)
    ids = []
    for t in range(4):
        out = tracker.update(_frame(t * 2))
        ids.append(out["ids"].tolist())
    assert ids[0] == [0, 1]
    for frame_ids in ids[1:]:
        assert frame_ids == ids[0]


@pytest.mark.parametrize("cls", [BBoxIOUTracker, VanillaHungarianBBoxIOUTracker])
def test_tracker_new_object(cls):
    tracker = cls()
    tracker.update(_frame(0))
    frame = _frame(1)
    frame["boxes"] = np.vstack([frame["boxes"], [[200, 200, 220, 220]]])
    frame["classes"] = np.append(frame["classes"], 0)
    frame["scores"] = np.append(frame["scores"], 0.7)
    out = tracker.update(frame)
    assert out["ids"][2] == 2  # fresh id


def test_tracker_class_gating():
    tracker = BBoxIOUTracker()
    tracker.update(_frame(0))
    frame = _frame(0)
    frame["classes"] = np.asarray([1, 0])  # classes swapped: no same-class overlap
    out = tracker.update(frame)
    assert out["ids"].tolist() == [2, 3]


def test_export_roundtrip(tmp_path):
    from vnext_tpu.export import export_stablehlo, load_exported, save_exported

    def f(x, y):
        return jnp.sin(x) @ y + 1.0

    x = jnp.ones((4, 8))
    y = jnp.ones((8, 2))
    exported = export_stablehlo(f, (x, y))
    p = str(tmp_path / "model.stablehlo")
    save_exported(exported, p)
    restored = load_exported(p)
    out = restored.call(x, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(x, y)), rtol=1e-6)


def test_parameter_count_and_flops():
    from vnext_tpu.utils.analysis import flop_count, parameter_count, parameter_count_table

    params = {"a": {"w": jnp.zeros((3, 4))}, "b": jnp.zeros((5,))}
    assert parameter_count(params) == 17
    table = parameter_count_table(params)
    assert "(total)" in table

    cost = flop_count(lambda x: x @ x.T, jnp.ones((64, 64)))
    assert cost["flops"] > 0


def test_retry_if_oom_passthrough_and_split():
    from vnext_tpu.utils.memory import retry_if_oom

    calls = []

    def fn(x):
        calls.append(x.shape[0])
        if x.shape[0] > 2:
            raise RuntimeError("RESOURCE EXHAUSTED: out of memory")
        return x * 2

    wrapped = retry_if_oom(fn)
    out = wrapped(np.arange(8.0))
    np.testing.assert_allclose(out, np.arange(8.0) * 2)
    assert max(calls) == 8 and min(calls) <= 2

    def bad(x):
        raise ValueError("not oom")

    with pytest.raises(ValueError):
        retry_if_oom(bad)(np.arange(4.0))


def test_instmove_predictor_tiny():
    from vnext_tpu.models.instmove import InstMovePredictor, motion_match_cost

    model = InstMovePredictor(memory_size=8, num_lstm_layers=2, lstm_channels=16)
    masks = jnp.asarray(np.random.RandomState(0).rand(1, 4, 64, 64, 1), jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), masks, img))()
    out = jax.jit(lambda v, m, im: model.apply(v, m, im))(variables, masks, img)
    assert out.shape == (1, 1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()

    pred = jnp.asarray(np.random.RandomState(1).randn(2, 16, 16))
    cand = jnp.asarray(np.random.RandomState(2).randn(3, 16, 16))
    cost = np.asarray(motion_match_cost(pred, cand))
    assert cost.shape == (2, 3) and (cost >= 0).all() and (cost <= 1).all()


def test_keypoints_heatmap_roundtrip():
    from vnext_tpu.structures.keypoints import Keypoints

    kp = Keypoints(jnp.asarray([[[12.0, 20.0, 2.0], [50.0, 60.0, 0.0]]]))
    boxes = jnp.asarray([[8.0, 16.0, 40.0, 48.0]])
    idx, valid = kp.to_heatmap(boxes, heatmap_size=8)
    assert bool(valid[0, 0]) and not bool(valid[0, 1])  # second kp: vis=0 + outside
    # decode a synthetic heatmap peaked at that index
    hm = np.full((1, 8, 8, 2), -10.0, np.float32)
    i = int(idx[0, 0])
    hm[0, i // 8, i % 8, 0] = 10.0
    out = np.asarray(Keypoints.from_heatmap(jnp.asarray(hm), boxes))
    assert abs(out[0, 0, 0] - 12.0) < 4.0 and abs(out[0, 0, 1] - 20.0) < 4.0


def test_async_predictor_order_and_errors():
    import time
    from vnext_tpu.engine.predictor import AsyncPredictor

    def slow_sq(x):
        time.sleep(0.01 * (3 - x))  # earlier items take longer
        if x == 99:
            raise ValueError("boom")
        return x * x

    ap = AsyncPredictor(slow_sq)
    for i in range(3):
        ap.put(i)
    assert [ap.get() for _ in range(3)] == [0, 1, 4]  # order preserved
    ap.put(99)
    try:
        ap.get()
        assert False, "expected error"
    except ValueError:
        pass
    ap.shutdown()


def test_repeat_factor_sampler():
    from vnext_tpu.data.build import RepeatFactorTrainingSampler

    # 9 images of common cat 0, 1 image of rare cat 1 → rare image repeats ~sqrt(t/f)
    dicts = [{"annotations": [{"category_id": 0}]} for _ in range(9)]
    dicts.append({"annotations": [{"category_id": 1}]})
    sampler = RepeatFactorTrainingSampler(dicts, repeat_thresh=0.9, seed=0)
    rf = sampler._repeat_factors
    assert rf[:9].max() == 1.0  # common: freq 0.9 >= thresh
    assert abs(rf[9] - np.sqrt(0.9 / 0.1)) < 1e-6  # rare: sqrt(9) = 3
    it = iter(sampler)
    first_epoch = [next(it) for _ in range(12)]
    assert first_epoch.count(9) >= 3  # rare image appears >= floor(3) times


def test_lvis_loader(tmp_path):
    import json
    from vnext_tpu.data.datasets.lvis import load_lvis_json

    data = {
        "images": [{"id": 1, "height": 10, "width": 10,
                    "coco_url": "http://x/train2017/000001.jpg",
                    "neg_category_ids": [2]}],
        "categories": [{"id": 1, "synonyms": ["cat"], "frequency": "f"},
                       {"id": 2, "synonyms": ["dog"], "frequency": "r"}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 2,
                         "bbox": [1, 1, 4, 4],
                         "segmentation": [[1, 1, 5, 1, 5, 5, 1, 5]]}],
    }
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(data))
    records = load_lvis_json(str(p), "/root_img", "lvis_test_ds")
    assert records[0]["file_name"].endswith("train2017/000001.jpg")
    assert records[0]["annotations"][0]["category_id"] == 1  # contiguous
    assert records[0]["neg_category_ids"] == [2]
