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


def test_diou_ciou_losses_vs_numpy_reference():
    from vnext_tpu.ops.losses import ciou_loss, diou_loss

    rng = np.random.RandomState(0)
    a = rng.uniform(0, 50, (16, 2))
    b1 = np.concatenate([a, a + rng.uniform(5, 40, (16, 2))], 1).astype(np.float64)
    a2 = rng.uniform(0, 50, (16, 2))
    b2 = np.concatenate([a2, a2 + rng.uniform(5, 40, (16, 2))], 1).astype(np.float64)

    def np_diou_ciou(p, g):
        inter = (np.clip(np.minimum(p[:, 2], g[:, 2]) - np.maximum(p[:, 0], g[:, 0]), 0, None)
                 * np.clip(np.minimum(p[:, 3], g[:, 3]) - np.maximum(p[:, 1], g[:, 1]), 0, None))
        area_p = (p[:, 2] - p[:, 0]) * (p[:, 3] - p[:, 1])
        area_g = (g[:, 2] - g[:, 0]) * (g[:, 3] - g[:, 1])
        iou = inter / (area_p + area_g - inter)
        cw = np.maximum(p[:, 2], g[:, 2]) - np.minimum(p[:, 0], g[:, 0])
        ch = np.maximum(p[:, 3], g[:, 3]) - np.minimum(p[:, 1], g[:, 1])
        c2 = cw**2 + ch**2
        d2 = (((p[:, 0] + p[:, 2]) - (g[:, 0] + g[:, 2])) ** 2
              + ((p[:, 1] + p[:, 3]) - (g[:, 1] + g[:, 3])) ** 2) / 4.0
        diou = 1 - iou + d2 / c2
        wp, hp = p[:, 2] - p[:, 0], p[:, 3] - p[:, 1]
        wg, hg = g[:, 2] - g[:, 0], g[:, 3] - g[:, 1]
        v = (4 / np.pi**2) * (np.arctan(wg / hg) - np.arctan(wp / hp)) ** 2
        alpha = v / (1 - iou + v)
        return diou, diou + alpha * v

    ref_d, ref_c = np_diou_ciou(b1, b2)
    ours_d = np.asarray(diou_loss(jnp.asarray(b1), jnp.asarray(b2)))
    ours_c = np.asarray(ciou_loss(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(ours_d, ref_d, atol=1e-4)
    np.testing.assert_allclose(ours_c, ref_c, atol=1e-4)
    # identical boxes -> zero loss
    assert float(diou_loss(jnp.asarray(b1), jnp.asarray(b1)).max()) < 1e-6
    assert float(ciou_loss(jnp.asarray(b1), jnp.asarray(b1)).max()) < 1e-6


def test_aspp_shapes():
    from vnext_tpu.models.layers import ASPP

    m = ASPP(out_channels=16)
    x = jnp.zeros((1, 24, 24, 8))
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), x))()
    out = jax.jit(lambda v: m.apply(v, x))(params)
    assert out.shape == (1, 24, 24, 16)


def test_update_bn_stats_exact():
    import flax.linen as nn

    from vnext_tpu.engine.hooks import update_bn_stats

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=False, momentum=0.9)(x)

    m = M()
    x0 = np.random.RandomState(0).randn(8, 4).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x0))

    def apply_stats(v, batch):
        _, updates = m.apply(v, batch, mutable=["batch_stats"])
        return updates["batch_stats"]

    batches = [jnp.asarray(np.random.RandomState(i).randn(8, 4).astype(np.float32) + i)
               for i in range(3)]
    new_stats = update_bn_stats(apply_stats, variables, batches)
    expected_mean = np.mean([np.asarray(b).mean(0) for b in batches], axis=0)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(new_stats)[0]), expected_mean, atol=1e-5
    )


def test_register_all_builtin():
    from vnext_tpu.data.catalog import DatasetCatalog
    from vnext_tpu.data.datasets.builtin import register_all_builtin

    register_all_builtin()
    names = DatasetCatalog.list()
    for expected in ("lvis_v1_train", "voc_2007_test",
                     "cityscapes_fine_instance_seg_val", "coco_2017_val_panoptic"):
        assert expected in names
    register_all_builtin()  # idempotent


def test_config_compat_upgrade_downgrade():
    from vnext_tpu.config.cfgnode import CfgNode
    from vnext_tpu.config.compat import downgrade_config, upgrade_config

    old = CfgNode()
    old.VERSION = 1
    old.MODEL = CfgNode()
    old.MODEL.TPU_MESH_SHAPE = (8,)
    old.MODEL.WEIGHTS = "x.pth"
    new = upgrade_config(old)
    assert new.VERSION == 2
    assert new.TPU.MESH_SHAPE == (8,)
    assert "TPU_MESH_SHAPE" not in new.MODEL
    assert new.MODEL.WEIGHTS == "x.pth"

    back = downgrade_config(new, 1)
    assert back.VERSION == 1 and back.MODEL.TPU_MESH_SHAPE == (8,)


def test_detection_mapper():
    import random

    from vnext_tpu.data.detection_mapper import (
        DetectionDatasetMapper,
        stack_detection_batch,
    )

    rng0 = np.random.RandomState(0)
    record = {
        "image": rng0.randint(0, 255, (100, 150, 3), dtype=np.uint8),
        "image_id": 7,
        "height": 100,
        "width": 150,
        "annotations": [
            {"category_id": 2, "bbox": [10, 20, 40, 30],
             "segmentation": [[10, 20, 50, 20, 50, 50, 10, 50]]},
            {"category_id": 1, "bbox": [0, 0, 5, 5], "iscrowd": 1},  # skipped
        ],
    }
    mapper = DetectionDatasetMapper(
        is_train=True, min_sizes=(64,), max_size=128, max_insts=8,
        target_size=(96, 128), mask_on=True,
    )
    out = mapper(record, random.Random(3))
    assert out["image"].shape == (96, 128, 3)
    assert out["boxes"].shape == (8, 4) and out["valid"].sum() == 1
    b = out["boxes"][0]
    assert b[2] > b[0] and b[3] > b[1]
    assert out["masks"].shape == (8, 96, 128)
    # mask roughly covers the box interior
    ys, xs = np.nonzero(out["masks"][0])
    assert len(ys) > 0
    assert xs.min() >= b[0] - 3 and xs.max() <= b[2] + 3

    batch = stack_detection_batch([out, out])
    assert batch["image"].shape == (2, 96, 128, 3)
    assert batch["image_id"] == [7, 7]


def test_visualizer_keypoints_and_panoptic():
    from vnext_tpu.utils.visualizer import Visualizer

    img = np.zeros((40, 60, 3), np.uint8)
    vis = Visualizer(img, class_names=["cat"])
    kp = np.asarray([[[10, 10, 1.0], [30, 20, 1.0], [50, 30, 0.0]]])
    out = vis.draw_keypoints(kp, connectivity=[(0, 1), (1, 2)])
    assert out.shape == (40, 60, 3)
    assert out[10, 10].sum() > 0       # dot drawn
    assert out[30, 50].sum() == 0      # invisible kp untouched

    pan = np.zeros((40, 60), np.int32)
    pan[:20] = 1
    pan[20:] = 2
    out2 = Visualizer(img, class_names=["cat"]).draw_panoptic_seg(
        pan,
        [{"id": 1, "category_id": 0, "isthing": True},
         {"id": 2, "category_id": 0, "isthing": False}],
        stuff_names=["sky"],
    )
    assert out2.shape == (40, 60, 3)
    # both halves got colored
    assert out2[5, 5].sum() > 0 and out2[35, 5].sum() > 0
    assert not np.array_equal(out2[5, 5], out2[35, 5])


def test_build_model_all_archs():
    from vnext_tpu.config import get_cfg
    from vnext_tpu.models import build_model

    for arch, cls_name in [
        ("GeneralizedRCNN", "GeneralizedRCNN"),
        ("PanopticFPN", "PanopticFPN"),
        ("ProposalNetwork", "ProposalNetwork"),
        ("RetinaNet", "RetinaNet"),
        ("FCOS", "FCOS"),
        ("SemanticSegmentor", "SemanticSegmentor"),
        ("IDOL", "IDOL"),
    ]:
        cfg = get_cfg()
        if arch == "IDOL":
            from vnext_tpu.config import add_idol_config

            add_idol_config(cfg)
        cfg.MODEL.META_ARCHITECTURE = arch
        m = build_model(cfg)
        assert type(m).__name__ == cls_name, arch
    # config plumbs through
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 7
    cfg.MODEL.KEYPOINT_ON = True
    m = build_model(cfg)
    assert m.num_classes == 7 and m.keypoint_on


def test_photometric_transforms():
    import random as pyrandom

    from vnext_tpu.data.transforms import (
        BlendTransform,
        random_brightness,
        random_contrast,
        random_saturation,
    )

    rng = pyrandom.Random(0)
    img = (np.arange(24).reshape(2, 4, 3) * 10).astype(np.uint8)
    # brightness w: out = w * img
    t = random_brightness(rng, 1.2, 1.2)
    out = t.apply_image(img)
    np.testing.assert_allclose(out, np.clip(img * 1.2, 0, 255).astype(np.uint8))
    # contrast at w=0 collapses to the mean
    t = BlendTransform(float(img.mean()), 1.0, 0.0)
    assert (t.apply_image(img) == int(img.mean())).all()
    # saturation at w=0 collapses to grey (channels equal)
    t = random_saturation(img, rng, 0.0, 0.0)
    g = t.apply_image(img)
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()
    # geometry untouched
    box = np.asarray([[1.0, 2.0, 3.0, 4.0]])
    np.testing.assert_array_equal(t.apply_box(box), box)


def test_rotation_transform():
    from vnext_tpu.data.transforms import RotationTransform

    h, w = 40, 60
    img = np.zeros((h, w, 3), np.uint8)
    img[10:14, 20:26] = 255
    t = RotationTransform(h, w, 90.0)
    out = t.apply_image(img)
    assert out.shape[:2] == (t.new_h, t.new_w)
    assert abs(t.new_h - 60) <= 2 and abs(t.new_w - 40) <= 2
    # a point maps consistently with the image rotation: take the blob center
    c_in = np.asarray([[23.0, 12.0]])  # (x, y)
    c_out = t.apply_coords(c_in.copy())[0]
    ys, xs = np.nonzero(out[..., 0] > 127)
    np.testing.assert_allclose([xs.mean(), ys.mean()], c_out, atol=1.5)
    # boxes stay tight around the rotated blob
    box = t.apply_box(np.asarray([[20.0, 10.0, 26.0, 14.0]]))[0]
    assert box[0] <= xs.min() + 1.5 and box[2] >= xs.max() - 1.5


def test_visualizer_extended_surfaces():
    """Rotated boxes, sem-seg overlay, BW mode, dataset-dict GT drawing
    (reference visualizer.py ColorMode / draw_rotated_box_with_label /
    draw_sem_seg / draw_dataset_dict)."""
    import numpy as np

    from vnext_tpu.utils.visualizer import ColorMode, Visualizer, rotated_box_corners

    img = np.full((60, 80, 3), 200, np.uint8)

    # rotated boxes: 0-angle corners are the axis-aligned rectangle
    pts = rotated_box_corners([40, 30, 20, 10, 0])
    assert np.allclose(sorted(p[0] for p in pts), [30, 30, 50, 50])
    out = Visualizer(img).draw_rotated_instances(
        np.asarray([[40.0, 30.0, 20.0, 10.0, 30.0]]), labels=np.asarray([0]),
        scores=np.asarray([0.9]))
    assert out.shape == img.shape and (out != img).any()

    # sem seg overlay labels every class
    sem = np.zeros((60, 80), np.uint8)
    sem[:, 40:] = 3
    out = Visualizer(img).draw_sem_seg(sem, stuff_names=["road", "a", "b", "sky"])
    assert (out[:, :40] != out[:, 40:]).any()

    # IMAGE_BW grays the unmasked region, keeps the masked region colored
    mask = np.zeros((60, 80), bool)
    mask[10:30, 10:30] = True
    out = Visualizer(img, color_mode=ColorMode.IMAGE_BW).draw_instances(
        masks=mask[None], labels=np.asarray([0]))
    bg = out[45, 70]
    assert abs(int(bg[0]) - int(bg[1])) <= 1 and abs(int(bg[1]) - int(bg[2])) <= 1

    # dataset dict: XYWH box + polygon segmentation + keypoints
    rec = {
        "height": 60, "width": 80,
        "annotations": [{
            "bbox": [10, 10, 20, 15], "bbox_mode": 1, "category_id": 0,
            "segmentation": [[10, 10, 30, 10, 30, 25, 10, 25]],
            "keypoints": [15, 15, 2, 25, 20, 2],
        }],
    }
    out = Visualizer(img, class_names=["cat"]).draw_dataset_dict(rec)
    assert (out != img).any()
