"""End-to-end keypoint pipeline tests (reference surface:
detectron2/data/detection_utils.py transform_keypoint_annotations,
detectron2/evaluation/coco_evaluation.py keypoints task (OKS),
detectron2/modeling/roi_heads/keypoint_head.py:44 loss/inference — the head
itself is covered in test_rcnn.py/test_roi_heads_extra.py; here we cover
annotation loading -> transform -> mapper -> train-step loss -> OKS eval)."""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.data.datasets.builtin_meta import keypoint_flip_indices
from vnext_tpu.data.transforms import (
    HFlipTransform,
    ResizeTransform,
    TransformList,
    transform_keypoint_annotations,
)
from vnext_tpu.evaluation.coco_eval import COCOEvaluator, compute_oks_matrix


def test_transform_keypoints_resize_flip_and_visibility():
    tl = TransformList([ResizeTransform(100, 200, 50, 100), HFlipTransform(100)])
    # kp0 at (10,20) vis 2; kp1 at (190,80) vis 1; kp2 unlabeled
    kp = [10.0, 20.0, 2, 190.0, 80.0, 1, 0.0, 0.0, 0]
    out = transform_keypoint_annotations(kp, tl, (50, 100), keypoint_hflip_indices=[1, 0, 2])
    # resize halves coords; flip mirrors x; flip map swaps kp0/kp1
    np.testing.assert_allclose(out[0], [5.0, 40.0, 1.0])
    np.testing.assert_allclose(out[1], [95.0, 10.0, 2.0])
    np.testing.assert_allclose(out[2], [0.0, 0.0, 0.0])
    # out-of-image keypoints become unlabeled AND zeroed (COCO convention)
    kp2 = [150.0, 20.0, 2] * 3
    tl2 = TransformList([ResizeTransform(100, 200, 100, 200)])
    out2 = transform_keypoint_annotations(
        kp2, tl2, (100, 100), keypoint_hflip_indices=[0, 1, 2]
    )  # image cropped to width 100 -> x=150 outside
    np.testing.assert_allclose(out2, 0.0)
    # odd number of flips without a flip map is an error
    with pytest.raises(ValueError):
        transform_keypoint_annotations(kp, tl, (50, 100), keypoint_hflip_indices=None)


def test_coco_person_flip_indices_roundtrip():
    idx = np.asarray(keypoint_flip_indices())
    assert idx.shape == (17,)
    # involution: flipping twice is identity
    np.testing.assert_array_equal(idx[idx], np.arange(17))
    assert idx[0] == 0  # nose is symmetric
    assert idx[1] == 2 and idx[2] == 1  # eyes swap


def test_oks_matrix_hand_values():
    sigmas = np.asarray([0.5, 1.0])  # test sigmas, k=2
    gt = [{"keypoints": [10, 10, 2, 20, 20, 0], "bbox": [0, 0, 30, 30], "area": 900.0}]
    # perfect detection on the visible keypoint
    dt = [{"keypoints": [10, 10, 1, 99, 99, 1]},
          {"keypoints": [13, 14, 1, 20, 20, 1]}]
    oks = compute_oks_matrix(dt, gt, sigmas=sigmas)
    assert oks.shape == (2, 1)
    assert abs(oks[0, 0] - 1.0) < 1e-9  # only the visible keypoint counts
    # hand value: d2=9+16=25, var=(2*0.5)^2=1, e=25/1/900/2
    expected = np.exp(-25.0 / 900.0 / 2.0)
    assert abs(oks[1, 0] - expected) < 1e-9
    # GT with no visible keypoints: expanded-box clamp, inside -> OKS 1
    gt0 = [{"keypoints": [0, 0, 0, 0, 0, 0], "bbox": [10, 10, 10, 10], "area": 100.0}]
    oks0 = compute_oks_matrix([{"keypoints": [15, 15, 1, 15, 15, 1]}], gt0, sigmas=sigmas)
    assert abs(oks0[0, 0] - 1.0) < 1e-9


def _kp_gt_and_meta(tmp_path, n_imgs=2):
    """Register a tiny keypoint COCO dataset; returns (name, records)."""
    from vnext_tpu.data.datasets.synthetic import register_synthetic_coco
    from vnext_tpu.data.catalog import DatasetCatalog

    name = "coco_synthetic_kp_test"
    register_synthetic_coco(name=name, root=str(tmp_path / name), num_images=n_imgs)
    return name, DatasetCatalog.get(name)


def test_loaded_annotations_carry_keypoints(tmp_path):
    name, records = _kp_gt_and_meta(tmp_path)
    assert len(records) > 0
    objs = records[0]["annotations"]
    assert all("keypoints" in o and len(o["keypoints"]) == 51 for o in objs)
    assert all(o.get("num_keypoints") == 17 for o in objs)


def test_mapper_propagates_keypoints(tmp_path):
    from vnext_tpu.data.detection_mapper import DetectionDatasetMapper

    name, records = _kp_gt_and_meta(tmp_path)
    mapper = DetectionDatasetMapper(
        is_train=True, min_sizes=(128,), max_size=224, max_insts=8,
        target_size=(128, 224), keypoint_on=True,
    )
    out = mapper(records[0], rng=random.Random(3))
    assert out["keypoints"].shape == (8, 17, 3)
    valid = out["valid"]
    assert valid.any()
    for i in np.flatnonzero(valid):
        box = out["boxes"][i]
        kps = out["keypoints"][i]
        vis = kps[:, 2] > 0
        assert vis.any()
        # visible keypoints live inside (a slightly padded) transformed box
        assert (kps[vis, 0] >= box[0] - 1).all() and (kps[vis, 0] <= box[2] + 1).all()
        assert (kps[vis, 1] >= box[1] - 1).all() and (kps[vis, 1] <= box[3] + 1).all()


def test_keypoint_evaluator_oks_ap(tmp_path):
    """Perfect keypoint predictions score AP 1.0; badly shifted ones score lower."""
    name, records = _kp_gt_and_meta(tmp_path)
    evaluator = COCOEvaluator(name, tasks=("keypoints",))

    def predictions(shift):
        outs = []
        for rec in records:
            objs = rec["annotations"]
            boxes, kps = [], []
            for o in objs:
                x, y, w, h = o["bbox"]
                boxes.append([x, y, x + w, y + h])
                k = np.asarray(o["keypoints"], np.float64).reshape(17, 3).copy()
                k[:, 0] += shift
                k[:, 2] = 1.0
                kps.append(k)
            outs.append(
                {
                    "boxes": np.asarray(boxes, np.float32),
                    "scores": np.ones(len(objs), np.float32),
                    "classes": np.asarray([o["category_id"] for o in objs], np.int32),
                    "valid": np.ones(len(objs), bool),
                    "keypoints": np.asarray(kps, np.float32),
                }
            )
        return outs

    evaluator.reset()
    evaluator.process(records, predictions(shift=0.0))
    perfect = evaluator.evaluate()["keypoints"]
    assert perfect["AP"] == pytest.approx(1.0)
    assert "AR@20" in perfect and perfect["AR@20"] == pytest.approx(1.0)

    evaluator.reset()
    evaluator.process(records, predictions(shift=60.0))
    shifted = evaluator.evaluate()["keypoints"]
    assert shifted["AP"] < perfect["AP"]


def test_keypoint_rcnn_train_step_from_loader(tmp_path):
    """Loader -> mapper -> adapter -> jitted train step produces loss_keypoint."""
    from vnext_tpu.config import add_idol_config, get_cfg
    from vnext_tpu.engine.detection import build_detection_train_loader, make_batch_adapter
    from vnext_tpu.models import build_model

    name, _ = _kp_gt_and_meta(tmp_path)
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = (name,)
    cfg.INPUT.MIN_SIZE_TRAIN = (128,)
    cfg.INPUT.MAX_SIZE_TRAIN = 224
    cfg.SOLVER.IMS_PER_BATCH = 1
    cfg.TPU.TRAIN_IMAGE_SIZE = [128, 224]
    cfg.TPU.TEST_IMAGE_SIZE = [128, 224]
    cfg.TPU.MAX_INSTANCES = 8

    loader = build_detection_train_loader(cfg, seed=0)
    batch = next(iter(loader))
    assert "keypoints" in batch and batch["keypoints"].shape[-2:] == (17, 3)

    model = build_model(cfg)
    adapter = make_batch_adapter(cfg)
    args, kwargs = adapter(batch)
    assert "gt_keypoints" in kwargs
    params = model.init(
        jax.random.PRNGKey(0), *args, train=True,
        rng_key=jax.random.PRNGKey(1), **kwargs,
    )["params"]
    losses = jax.jit(
        lambda p: model.apply(
            {"params": p}, *args, train=True, rng_key=jax.random.PRNGKey(5), **kwargs
        )
    )(params)
    assert "loss_keypoint" in losses
    assert np.isfinite(float(losses["loss_keypoint"]))
