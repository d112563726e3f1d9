import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models.matcher import (
    dynamic_k_matching,
    get_in_boxes_info,
    match,
    pos_neg_masks,
)


def _toy_problem(q=50, k=4, k_valid=3, seed=0):
    rng = np.random.RandomState(seed)
    gt_boxes = np.zeros((k, 4), np.float32)
    gt_boxes[:, :2] = rng.rand(k, 2) * 0.6 + 0.2
    gt_boxes[:, 2:] = rng.rand(k, 2) * 0.2 + 0.1
    gt_valid = np.arange(k) < k_valid
    gt_labels = rng.randint(0, 5, size=(k,))
    # queries: a few placed exactly on gts, the rest random
    boxes = rng.rand(q, 4).astype(np.float32) * 0.5 + 0.25
    boxes[:, 2:] = rng.rand(q, 2) * 0.2 + 0.05
    for i in range(k_valid):
        boxes[i * 3 : i * 3 + 3] = gt_boxes[i] + rng.randn(3, 4).astype(np.float32) * 0.01
    logits = rng.randn(q, 5).astype(np.float32) * 0.1
    for i in range(k_valid):
        logits[i * 3 : i * 3 + 3, gt_labels[i]] = 3.0
    return logits, boxes, gt_labels, gt_boxes, gt_valid


def test_every_valid_gt_gets_a_query():
    logits, boxes, labels, gt_boxes, gt_valid = _toy_problem()
    res = match(
        jnp.asarray(logits)[None],
        jnp.asarray(boxes)[None],
        jnp.asarray(labels)[None],
        jnp.asarray(gt_boxes)[None],
        jnp.asarray(gt_valid)[None],
    )
    mm = np.asarray(res.matching_matrix[0])
    assert (mm.sum(0)[gt_valid] >= 1).all()
    assert (mm.sum(0)[~gt_valid] == 0).all()
    # one gt per query at most
    assert (mm.sum(1) <= 1).all()
    # matched_query_per_gt points at a query matched to that gt
    mq = np.asarray(res.matched_query_per_gt[0])
    for g in range(len(gt_valid)):
        if gt_valid[g]:
            assert mm[mq[g], g] == 1


def test_nearby_high_score_queries_are_selected():
    logits, boxes, labels, gt_boxes, gt_valid = _toy_problem()
    res = match(
        jnp.asarray(logits)[None],
        jnp.asarray(boxes)[None],
        jnp.asarray(labels)[None],
        jnp.asarray(gt_boxes)[None],
        jnp.asarray(gt_valid)[None],
    )
    sel = np.asarray(res.selected_query[0])
    gidx = np.asarray(res.gt_index[0])
    # the planted queries (i*3..i*3+2) should mostly be matched to gt i
    planted_hits = sum(
        1 for i in range(3) for j in range(3) if sel[i * 3 + j] and gidx[i * 3 + j] == i
    )
    assert planted_hits >= 5


def test_empty_gt_image():
    logits, boxes, labels, gt_boxes, _ = _toy_problem()
    gt_valid = np.zeros(len(gt_boxes), bool)
    res = match(
        jnp.asarray(logits)[None],
        jnp.asarray(boxes)[None],
        jnp.asarray(labels)[None],
        jnp.asarray(gt_boxes)[None],
        jnp.asarray(gt_valid)[None],
    )
    assert not bool(np.asarray(res.selected_query).any())


def test_dynamic_k_respects_candidate_budget():
    rng = np.random.RandomState(1)
    cost = jnp.asarray(rng.rand(40, 3).astype(np.float32))
    ious = jnp.asarray(np.clip(rng.rand(40, 3), 0, 1).astype(np.float32))
    valid = jnp.ones((3,), bool)
    mm = np.asarray(dynamic_k_matching(cost, ious, valid, n_candidate_k=10))
    assert mm.sum(0).max() <= 10
    assert (mm.sum(0) >= 1).all()


def test_pos_neg_masks_disjoint_and_nested():
    logits, boxes, labels, gt_boxes, gt_valid = _toy_problem()
    prob = jax.nn.sigmoid(jnp.asarray(logits))
    pos, neg = pos_neg_masks(
        prob, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(gt_boxes), jnp.asarray(gt_valid)
    )
    pos, neg = np.asarray(pos), np.asarray(neg)
    # pos (k=10 match) is a subset of the k=100 match, so never overlaps neg (=~k100)
    assert not (pos & neg).any()
    for g in range(len(gt_valid)):
        if gt_valid[g]:
            assert pos[g].sum() >= 1


def test_in_boxes_info():
    boxes = jnp.asarray([[0.5, 0.5, 0.1, 0.1], [0.9, 0.9, 0.05, 0.05]], jnp.float32)
    gts = jnp.asarray([[0.5, 0.5, 0.3, 0.3]], jnp.float32)
    fg, in_bc = get_in_boxes_info(boxes, gts)
    assert bool(fg[0]) and not bool(fg[1])
    assert bool(in_bc[0, 0]) and not bool(in_bc[1, 0])
