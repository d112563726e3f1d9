"""Rotated IoU/NMS tests (reference style: tests/test_rotated_boxes.py:437 —
exact values for axis-aligned and known-rotation cases, plus a Monte-Carlo
cross-check oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.ops.rotated_boxes import (
    nms_rotated_mask,
    pairwise_iou_rotated,
    rotated_box_vertices,
)
from vnext_tpu.structures.boxes import pairwise_iou


def _mc_iou(b1, b2, n=200_000, seed=0):
    """Monte-Carlo IoU oracle over the union bounding region."""
    rng = np.random.RandomState(seed)
    v = np.asarray(rotated_box_vertices(jnp.asarray(np.stack([b1, b2]))))
    lo = v.reshape(-1, 2).min(0) - 1
    hi = v.reshape(-1, 2).max(0) + 1
    pts = rng.rand(n, 2) * (hi - lo) + lo

    def inside(box):
        cx, cy, w, h, a = box
        t = -a * np.pi / 180
        c, s = np.cos(t), np.sin(t)
        rel = pts - [cx, cy]
        x = rel[:, 0] * c - rel[:, 1] * s
        y = rel[:, 0] * s + rel[:, 1] * c
        return (np.abs(x) <= w / 2) & (np.abs(y) <= h / 2)

    i1, i2 = inside(b1), inside(b2)
    inter = (i1 & i2).sum()
    union = (i1 | i2).sum()
    return inter / max(union, 1)


def test_vertices_axis_aligned():
    v = np.asarray(rotated_box_vertices(jnp.asarray([[5.0, 6.0, 4.0, 2.0, 0.0]])))[0]
    np.testing.assert_allclose(sorted(v[:, 0]), [3, 3, 7, 7])
    np.testing.assert_allclose(sorted(v[:, 1]), [5, 5, 7, 7])


def test_rotated_iou_matches_aabb_at_zero_angle():
    rng = np.random.RandomState(0)
    n, m = 5, 6
    c1 = rng.rand(n, 2) * 40
    wh1 = rng.rand(n, 2) * 20 + 2
    c2 = rng.rand(m, 2) * 40
    wh2 = rng.rand(m, 2) * 20 + 2
    rot1 = jnp.asarray(np.concatenate([c1, wh1, np.zeros((n, 1))], 1), jnp.float32)
    rot2 = jnp.asarray(np.concatenate([c2, wh2, np.zeros((m, 1))], 1), jnp.float32)
    aabb1 = jnp.concatenate([rot1[:, :2] - rot1[:, 2:4] / 2, rot1[:, :2] + rot1[:, 2:4] / 2], 1)
    aabb2 = jnp.concatenate([rot2[:, :2] - rot2[:, 2:4] / 2, rot2[:, :2] + rot2[:, 2:4] / 2], 1)
    np.testing.assert_allclose(
        np.asarray(pairwise_iou_rotated(rot1, rot2)),
        np.asarray(pairwise_iou(aabb1, aabb2)),
        rtol=1e-4, atol=1e-5,
    )


def test_rotated_iou_45_degree_known_value():
    # unit square vs the same square rotated 45°: IoU = 2(sqrt2 - 1)/... known:
    # intersection is a regular octagon with area 2*(sqrt(2)-1) for unit squares
    a = jnp.asarray([[0.0, 0, 1, 1, 0]])
    b = jnp.asarray([[0.0, 0, 1, 1, 45]])
    inter_area = 2 * (np.sqrt(2) - 1)
    expected = inter_area / (2 - inter_area)
    got = float(pairwise_iou_rotated(a, b)[0, 0])
    assert abs(got - expected) < 1e-4


def test_rotated_iou_90_degree_identity():
    a = jnp.asarray([[3.0, 4, 6, 2, 0]])
    b = jnp.asarray([[3.0, 4, 2, 6, 90]])  # same box, rotated parameterization
    assert abs(float(pairwise_iou_rotated(a, b)[0, 0]) - 1.0) < 1e-4


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rotated_iou_monte_carlo(seed):
    rng = np.random.RandomState(seed)
    b1 = np.asarray([20, 20, 10 + rng.rand() * 10, 5 + rng.rand() * 10, rng.rand() * 180 - 90], np.float32)
    b2 = np.asarray([22, 18, 8 + rng.rand() * 10, 6 + rng.rand() * 10, rng.rand() * 180 - 90], np.float32)
    got = float(pairwise_iou_rotated(jnp.asarray(b1[None]), jnp.asarray(b2[None]))[0, 0])
    ref = _mc_iou(b1, b2)
    assert abs(got - ref) < 0.01, (got, ref)


def test_disjoint_boxes_zero_iou():
    a = jnp.asarray([[0.0, 0, 2, 2, 30]])
    b = jnp.asarray([[100.0, 100, 2, 2, -60]])
    assert float(pairwise_iou_rotated(a, b)[0, 0]) == 0.0


def test_nms_rotated():
    boxes = jnp.asarray(
        [
            [10.0, 10, 8, 4, 0],
            [10.0, 10, 8, 4, 5],    # heavy overlap with first
            [30.0, 30, 8, 4, 45],
        ]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated_mask(boxes, scores, 0.3))
    assert keep.tolist() == [True, False, True]
