"""SyncBatchNorm / configurable / auto_scale_workers / aspect-ratio grouping /
rotated-COCO + Cityscapes evaluators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_sync_batch_norm_global_stats():
    from vnext_tpu.models.layers import SyncBatchNorm

    n_dev = jax.local_device_count()
    assert n_dev >= 2
    model = SyncBatchNorm(features=4, axis_name="batch")
    x = np.random.RandomState(0).randn(n_dev, 2, 3, 3, 4).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x[0]))

    def fwd(v, xs):
        out, updates = model.apply(v, xs, mutable=["batch_stats"])
        return out, updates["batch_stats"]

    outs, stats = jax.pmap(fwd, axis_name="batch")(
        jax.tree_util.tree_map(lambda a: jnp.broadcast_to(a, (n_dev, *a.shape)), variables),
        jnp.asarray(x),
    )
    # synced: every replica's running stats identical and equal to GLOBAL batch stats
    mean = np.asarray(stats["bn"]["mean"])
    assert np.allclose(mean, mean[0], atol=1e-6)
    global_mean = x.reshape(-1, 4).mean(0)
    # momentum 0.9: running = 0.1 * batch_mean
    np.testing.assert_allclose(mean[0], 0.1 * global_mean, atol=1e-5)
    # normalized output uses global stats: per-replica output mean differs from 0
    # unless its local mean equals global; overall mean ~0
    assert abs(float(np.asarray(outs).reshape(-1, 4).mean())) < 1e-4


def test_configurable_class_and_function():
    from vnext_tpu.config import CfgNode, configurable, get_cfg

    class Thing:
        @configurable
        def __init__(self, a, b=1):
            self.a, self.b = a, b

        @classmethod
        def from_config(cls, cfg):
            return {"a": cfg.MODEL.MASK_ON, "b": 7}

    cfg = get_cfg()
    t = Thing(cfg)
    assert t.a == cfg.MODEL.MASK_ON and t.b == 7
    t2 = Thing(a=5, b=2)
    assert t2.a == 5 and t2.b == 2

    @configurable(from_config=lambda cfg: {"a": 42})
    def build(a):
        return a

    assert build(cfg) == 42 and build(a=3) == 3


def test_auto_scale_workers():
    from vnext_tpu.config import auto_scale_workers, get_cfg

    cfg = get_cfg()
    cfg.SOLVER.REFERENCE_WORLD_SIZE = 8
    cfg.SOLVER.IMS_PER_BATCH = 16
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.MAX_ITER = 1000
    cfg.SOLVER.STEPS = (600, 800)
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.freeze()
    scaled = auto_scale_workers(cfg, 16)
    assert scaled.SOLVER.IMS_PER_BATCH == 32
    assert abs(scaled.SOLVER.BASE_LR - 0.2) < 1e-9
    assert scaled.SOLVER.MAX_ITER == 500
    assert scaled.SOLVER.STEPS == (300, 400)
    assert scaled.SOLVER.REFERENCE_WORLD_SIZE == 16
    assert scaled.is_frozen()
    # untouched original + no-op when sizes equal
    assert cfg.SOLVER.IMS_PER_BATCH == 16
    assert auto_scale_workers(cfg, 8) is cfg


def test_aspect_ratio_grouping():
    from vnext_tpu.data.build import AspectRatioGroupedDataset

    samples = [
        {"height": 10, "width": 20, "i": 0},  # landscape
        {"height": 20, "width": 10, "i": 1},  # portrait
        {"height": 10, "width": 30, "i": 2},  # landscape -> batch [0, 2]
        {"height": 30, "width": 10, "i": 3},  # portrait -> batch [1, 3]
    ]
    batches = list(AspectRatioGroupedDataset(iter(samples), batch_size=2))
    assert [[s["i"] for s in b] for b in batches] == [[0, 2], [1, 3]]


def test_rotated_coco_evaluator():
    from vnext_tpu.evaluation.rotated_coco_eval import RotatedCOCOEvaluator

    ev = RotatedCOCOEvaluator(class_names=["a"])
    inputs = [{
        "image_id": 1,
        "annotations": [{"category_id": 0, "bbox": [30, 30, 20, 10, 15.0]}],
    }]
    # perfect detection
    ev.process(inputs, [{
        "boxes": np.asarray([[30, 30, 20, 10, 15.0]], np.float32),
        "scores": np.asarray([0.9]),
        "classes": np.asarray([0]),
        "valid": np.asarray([True]),
    }])
    res = ev.evaluate()["bbox"]
    assert res["AP"] > 99.0 and res["AP75"] > 99.0

    # axis-aligned vs 90-degree-rotated non-square box: IoU well below 0.5
    ev2 = RotatedCOCOEvaluator()
    ev2.process(inputs, [{
        "boxes": np.asarray([[30, 30, 20, 10, 105.0]], np.float32),
        "scores": np.asarray([0.9]),
        "classes": np.asarray([0]),
        "valid": np.asarray([True]),
    }])
    assert ev2.evaluate()["bbox"]["AP50"] == 0.0


def test_cityscapes_instance_evaluator():
    from vnext_tpu.evaluation.cityscapes_eval import CityscapesInstanceEvaluator
    from vnext_tpu.evaluation.rle import rle_encode

    m = np.zeros((16, 16), bool)
    m[2:10, 3:12] = True
    record = {
        "image_id": "f0", "height": 16, "width": 16, "file_name": "x.png",
        "annotations": [{"category_id": 2, "segmentation": rle_encode(m)}],
    }
    ev = CityscapesInstanceEvaluator(class_names=["person", "rider", "car"])
    ev.process([record], [{
        "scores": np.asarray([0.95]),
        "classes": np.asarray([2]),
        "valid": np.asarray([True]),
        "masks": m[None],
    }])
    res = ev.evaluate()["segm"]
    assert res["AP"] > 0.99  # 0-1 scale in YTVOSeval stats
