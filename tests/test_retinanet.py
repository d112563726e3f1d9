"""RetinaNet + dense-head building block tests (reference style:
tests/modeling/test_rpn.py / test_matcher.py / test_box2box_transform.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.dense_heads import (
    Box2BoxTransform,
    anchors_for_level,
    generate_cell_anchors,
    iou_matcher,
)


def test_cell_anchors_areas_and_ratios():
    cell = generate_cell_anchors(sizes=(32,), aspect_ratios=(0.5, 1.0, 2.0))
    assert cell.shape == (3, 4)
    w = cell[:, 2] - cell[:, 0]
    h = cell[:, 3] - cell[:, 1]
    np.testing.assert_allclose(w * h, 32 * 32, rtol=1e-5)
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)


def test_anchors_for_level_grid():
    cell = generate_cell_anchors(sizes=(16,), aspect_ratios=(1.0,))
    a = np.asarray(anchors_for_level(2, 3, 8, cell))
    assert a.shape == (6, 4)
    centers_x = (a[:, 0] + a[:, 2]) / 2
    np.testing.assert_allclose(centers_x[:3], [4, 12, 20])


def test_box2box_roundtrip():
    t = Box2BoxTransform()
    rng = np.random.RandomState(0)
    src = rng.rand(10, 4).astype(np.float32) * 50
    src[:, 2:] = src[:, :2] + rng.rand(10, 2).astype(np.float32) * 40 + 5
    tgt = rng.rand(10, 4).astype(np.float32) * 50
    tgt[:, 2:] = tgt[:, :2] + rng.rand(10, 2).astype(np.float32) * 40 + 5
    deltas = t.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = np.asarray(t.apply_deltas(deltas, jnp.asarray(src)))
    np.testing.assert_allclose(rec, tgt, rtol=1e-4, atol=1e-3)


def test_iou_matcher_semantics():
    gt = jnp.asarray([[0.0, 0, 10, 10], [50, 50, 60, 60]])
    valid = jnp.asarray([True, True])
    anchors = jnp.asarray(
        [
            [0.0, 0, 10, 10],     # exact match gt0 -> fg
            [0, 0, 30, 30],       # iou ~0.11 -> bg
            [49, 49, 61, 61],     # high iou gt1 -> fg
            [4, 0, 14, 10],       # iou ~0.43 -> ignore band
            [200, 200, 210, 210], # zero iou -> bg
        ]
    )
    idx, labels = iou_matcher(gt, valid, anchors, thresholds=(0.4, 0.5),
                              allow_low_quality_matches=False)
    assert labels.tolist() == [1, 0, 1, -1, 0]
    assert int(idx[0]) == 0 and int(idx[2]) == 1


def test_iou_matcher_low_quality_rescue():
    gt = jnp.asarray([[0.0, 0, 10, 10]])
    valid = jnp.asarray([True])
    anchors = jnp.asarray([[3.0, 3, 13, 13], [100.0, 100, 110, 110]])
    _, labels_no = iou_matcher(gt, valid, anchors, thresholds=(0.4, 0.5),
                               allow_low_quality_matches=False)
    _, labels_yes = iou_matcher(gt, valid, anchors, thresholds=(0.4, 0.5),
                                allow_low_quality_matches=True)
    assert int(labels_no[0]) != 1  # iou ~0.36 below fg threshold
    assert int(labels_yes[0]) == 1  # rescued: best anchor for the gt


@pytest.fixture(scope="module")
def tiny_retinanet():
    from vnext_tpu.models.retinanet import DetTargets, RetinaNet

    model = RetinaNet(
        num_classes=4, fpn_channels=32,
        anchor_sizes=((16,), (32,), (64,), (128,), (256,)),
        test_topk=50, max_detections=10,
    )
    images = jnp.zeros((1, 64, 96, 3))
    targets = DetTargets(
        labels=jnp.asarray([[1, 2, 0]], jnp.int32),
        boxes=jnp.asarray([[[8, 8, 40, 40], [50, 20, 90, 60], [0, 0, 1, 1]]], jnp.float32),
        valid=jnp.asarray([[True, True, False]]),
    )
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, targets, train=False)["params"]
    )()
    return model, params, images, targets


def test_retinanet_losses(tiny_retinanet):
    model, params, images, targets = tiny_retinanet
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, targets, train=True)
    )(params)
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    for v in losses.values():
        assert np.isfinite(float(v)) and float(v) >= 0


def test_retinanet_inference_shapes(tiny_retinanet):
    from vnext_tpu.models.retinanet import RetinaNet

    model, params, images, _ = tiny_retinanet
    out = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method=RetinaNet.inference)
    )(params, images)
    assert out["boxes"].shape == (1, 10, 4)
    assert out["scores"].shape == (1, 10)
    assert out["classes"].shape == (1, 10)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_tta_wrapper(tiny_retinanet):
    from vnext_tpu.models.retinanet import RetinaNet
    from vnext_tpu.models.tta import DetectorWithTTA

    model, params, images, _ = tiny_retinanet
    infer = jax.jit(lambda x: model.apply({"params": params}, x, method=RetinaNet.inference))
    tta = DetectorWithTTA(infer, min_sizes=(48, 64), flip=True, max_detections=8)
    out = tta(images)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["scores"].shape == (1, 8)
    assert np.isfinite(np.asarray(out["boxes"])).all()
    # merged scores are sorted descending
    s = np.asarray(out["scores"][0])
    assert (np.diff(s) <= 1e-6).all()
