"""GeneralizedRCNN / RPN / ROI-heads tests (tiny shapes, reference test style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.rcnn import GeneralizedRCNN, assign_fpn_levels
from vnext_tpu.models.retinanet import DetTargets


def test_assign_fpn_levels():
    rois = jnp.asarray(
        [[0, 0, 56, 56], [0, 0, 224, 224], [0, 0, 448, 448], [0, 0, 1000, 1000]],
        jnp.float32,
    )
    lvl = np.asarray(assign_fpn_levels(rois))
    assert lvl.tolist() == [2, 4, 5, 5]


@pytest.fixture(scope="module")
def tiny_rcnn():
    model = GeneralizedRCNN(
        num_classes=4, fpn_channels=32, proposals_per_image=32,
        roi_batch_per_image=16, max_detections=8,
    )
    images = jnp.zeros((1, 64, 96, 3))
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = DetTargets(
        labels=jnp.asarray([[1, 2, 0]], jnp.int32),
        boxes=jnp.asarray([[[8, 8, 40, 40], [50, 20, 90, 60], [0, 0, 1, 1]]], jnp.float32),
        valid=jnp.asarray([[True, True, False]]),
    )
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets, train=False)["params"]
    )()
    return model, params, images, sizes, targets


def test_rcnn_train_losses(tiny_rcnn):
    model, params, images, sizes, targets = tiny_rcnn
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, targets, train=True,
                              rng_key=jax.random.PRNGKey(5))
    )(params)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls", "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, k
    assert float(losses["loss_cls"]) > 0


def test_rcnn_empty_gt(tiny_rcnn):
    model, params, images, sizes, targets = tiny_rcnn
    empty = DetTargets(targets.labels, targets.boxes, jnp.zeros_like(targets.valid))
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, empty, train=True,
                              rng_key=jax.random.PRNGKey(5))
    )(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_mask_rcnn_train_and_inference():
    model = GeneralizedRCNN(
        num_classes=4, fpn_channels=32, proposals_per_image=32,
        roi_batch_per_image=16, max_detections=8, mask_on=True,
    )
    images = jnp.zeros((1, 64, 96, 3))
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = DetTargets(
        labels=jnp.asarray([[1, 2, 0]], jnp.int32),
        boxes=jnp.asarray([[[8, 8, 40, 40], [50, 20, 90, 60], [0, 0, 1, 1]]], jnp.float32),
        valid=jnp.asarray([[True, True, False]]),
    )
    gt_masks = np.zeros((1, 3, 64, 96), np.float32)
    gt_masks[0, 0, 8:40, 8:40] = 1.0
    gt_masks[0, 1, 20:60, 50:90] = 1.0
    gt_masks = jnp.asarray(gt_masks)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets, train=True,
                           gt_masks=gt_masks)["params"]
    )()
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, targets, train=True,
                              rng_key=jax.random.PRNGKey(5), gt_masks=gt_masks)
    )(params)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, k
    # BCE of random logits vs ~half-on targets should be near log(2) scale, not 0
    assert float(losses["loss_mask"]) > 0.1

    out = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, method=GeneralizedRCNN.inference)
    )(params)
    assert out["mask_probs"].shape == (1, 8, 14, 14)
    mp = np.asarray(out["mask_probs"])
    assert np.isfinite(mp).all() and (mp >= 0).all() and (mp <= 1).all()


def test_rcnn_inference_shapes(tiny_rcnn):
    model, params, images, sizes, _ = tiny_rcnn
    out = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, method=GeneralizedRCNN.inference)
    )(params)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["scores"].shape == (1, 8)
    b = np.asarray(out["boxes"])
    assert np.isfinite(b).all()
    # boxes clipped to the image
    assert (b[..., 0::2] <= 96 + 1e-3).all() and (b[..., 1::2] <= 64 + 1e-3).all()
    assert (b >= -1e-3).all()


def test_keypoint_rcnn_train_and_inference():
    model = GeneralizedRCNN(
        num_classes=2, fpn_channels=32, proposals_per_image=16,
        roi_batch_per_image=8, max_detections=4, keypoint_on=True, num_keypoints=3,
    )
    images = jnp.zeros((1, 64, 96, 3))
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = DetTargets(
        labels=jnp.asarray([[0, 1]], jnp.int32),
        boxes=jnp.asarray([[[8, 8, 40, 40], [50, 20, 90, 60]]], jnp.float32),
        valid=jnp.asarray([[True, True]]),
    )
    gt_kps = jnp.asarray(
        [[[[12, 12, 2], [30, 30, 2], [0, 0, 0]],
          [[55, 25, 2], [80, 50, 1], [0, 0, 0]]]], jnp.float32
    )  # [1, 2, 3, 3]
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets,
                           train=True, gt_keypoints=gt_kps)["params"]
    )()
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, targets, train=True,
                              rng_key=jax.random.PRNGKey(5), gt_keypoints=gt_kps)
    )(params)
    assert "loss_keypoint" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, k
    # random heatmaps over 28x28 grid: CE ~ log(784)
    assert 2.0 < float(losses["loss_keypoint"]) < 12.0

    out = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, method=GeneralizedRCNN.inference)
    )(params)
    assert out["keypoints"].shape == (1, 4, 3, 3)
    kp = np.asarray(out["keypoints"])
    assert np.isfinite(kp).all()
