"""FCOS meta-arch tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.fcos import FCOS
from vnext_tpu.models.retinanet import DetTargets


@pytest.fixture(scope="module")
def tiny_fcos():
    model = FCOS(
        num_classes=4, fpn_channels=32,
        size_ranges=((-1, 16), (16, 32), (32, 64), (64, 128), (128, 1e8)),
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


def test_fcos_losses_finite(tiny_fcos):
    model, params, images, targets = tiny_fcos
    losses = jax.jit(lambda p: model.apply({"params": p}, images, targets))(params)
    assert set(losses) == {"loss_fcos_cls", "loss_fcos_loc", "loss_fcos_ctr"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, k


def test_fcos_empty_gt(tiny_fcos):
    model, params, images, targets = tiny_fcos
    empty = DetTargets(targets.labels, targets.boxes, jnp.zeros_like(targets.valid))
    losses = jax.jit(lambda p: model.apply({"params": p}, images, empty))(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_fcos_inference_shapes(tiny_fcos):
    model, params, images, _ = tiny_fcos
    out = jax.jit(lambda p, x: model.apply({"params": p}, x, method=FCOS.inference))(
        params, images
    )
    assert out["boxes"].shape == (1, 10, 4)
    assert out["scores"].shape == (1, 10)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_fcos_point_assignment():
    model = FCOS(num_classes=2)
    # a gt centered at (16,16); stride-8 points at (16,16) and (100,100)
    points = jnp.asarray([[16.0, 16.0], [100.0, 100.0]])
    strides = jnp.asarray([8.0, 8.0])
    ranges = jnp.asarray([[-1.0, 64.0], [-1.0, 64.0]])
    gt_boxes = jnp.asarray([[8.0, 8, 24, 24]])
    gt_labels = jnp.asarray([1])
    gt_valid = jnp.asarray([True])
    matched, fg, reg = FCOS._assign(model, points, strides, ranges, gt_boxes, gt_labels, gt_valid)
    assert bool(fg[0]) and not bool(fg[1])
    assert int(matched[0]) == 0
    np.testing.assert_allclose(np.asarray(reg[0, 0]), [8, 8, 8, 8])
