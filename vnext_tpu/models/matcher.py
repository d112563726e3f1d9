"""Fixed-shape simOTA-style dynamic-k matching (device-side, jit-compatible).

Capability parity with idol/models/matcher.py:19 (HungarianMatcher.forward — despite
the name, the reference implements YOLOX-style dynamic-k OTA matching) and
idol/models/pos_neg_select.py:166 (dynamic_k_matching used for contrastive pos/neg
selection). The reference runs this on CPU with python loops per gt; here it is a
fully vectorized fixed-shape computation over padded GT slots, vmapped over the
batch — eliminating the reference's per-decoder-layer host sync (SURVEY.md §3.1).

Conventions: Q queries, K padded GT slots; ``gt_valid`` marks real GTs. All boxes
are normalized cxcywh.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import box_cxcywh_to_xyxy, generalized_box_iou, pairwise_iou

Array = jnp.ndarray

_BIG = 1e5
_INF = 1e9


class MatchResult(NamedTuple):
    selected_query: Array      # [B, Q] bool — query is matched to some gt
    gt_index: Array            # [B, Q] int — gt slot for each selected query (0 if unselected)
    matched_query_per_gt: Array  # [B, K] int — the min-cost matched query for each gt
    matching_matrix: Array     # [B, Q, K] float 0/1


def get_in_boxes_info(
    boxes_cxcywh: Array, gt_cxcywh: Array, expanded_strides: int = 32, center_radius: float = 2.5
) -> Tuple[Array, Array]:
    """fg anchor prior: query centers inside gt boxes or near gt centers.

    boxes: [Q, 4], gt: [K, 4] normalized cxcywh. Returns ([Q] bool, [Q, K] bool).
    """
    gt_xyxy = box_cxcywh_to_xyxy(gt_cxcywh)
    cx = boxes_cxcywh[:, 0:1]  # [Q, 1]
    cy = boxes_cxcywh[:, 1:2]

    in_box = (
        (cx > gt_xyxy[None, :, 0])
        & (cx < gt_xyxy[None, :, 2])
        & (cy > gt_xyxy[None, :, 1])
        & (cy < gt_xyxy[None, :, 3])
    )
    r = center_radius / expanded_strides
    gcx = gt_cxcywh[None, :, 0]
    gcy = gt_cxcywh[None, :, 1]
    in_center = (cx > gcx - r) & (cx < gcx + r) & (cy > gcy - r) & (cy < gcy + r)

    is_in_boxes_anchor = jnp.any(in_box, axis=1) | jnp.any(in_center, axis=1)
    is_in_boxes_and_center = in_box & in_center
    return is_in_boxes_anchor, is_in_boxes_and_center


def focal_class_cost(prob: Array, gt_labels: Array, alpha: float = 0.25, gamma: float = 2.0) -> Array:
    """[Q, K] focal-aware classification cost; prob [Q, C], gt_labels [K]."""
    neg = (1 - alpha) * prob**gamma * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    return pos[:, gt_labels] - neg[:, gt_labels]


def build_match_cost(
    prob: Array,            # [Q, C] sigmoid scores
    boxes: Array,           # [Q, 4] cxcywh
    gt_labels: Array,       # [K]
    gt_boxes: Array,        # [K, 4] cxcywh
    gt_valid: Array,        # [K] bool
) -> Tuple[Array, Array]:
    """Returns (cost [Q, K] with invalid gts at +inf, ious [Q, K])."""
    fg_mask, in_box_center = get_in_boxes_info(boxes, gt_boxes)
    ious = pairwise_iou(box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(gt_boxes))
    ious = jnp.where(gt_valid[None, :], ious, 0.0)
    cost = (
        focal_class_cost(prob, gt_labels)
        + 3.0 * (-generalized_box_iou(box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(gt_boxes)))
        + 100.0 * (~in_box_center)
    )
    cost = cost + 10000.0 * (~fg_mask)[:, None]
    cost = jnp.where(gt_valid[None, :], cost, _INF)
    return cost, ious


def dynamic_k_matching(
    cost: Array, ious: Array, gt_valid: Array, n_candidate_k: int = 10
) -> Array:
    """[Q, K] 0/1 matching matrix via dynamic-k OTA with conflict repair.

    Mirrors idol/models/matcher.py:133 dynamic_k_matching with fixed shapes: the
    data-dependent top-k per gt becomes a static top-``n_candidate_k`` plus a rank
    mask, and the repair while-loop becomes a bounded fori_loop (each unmatched gt
    claims the cheapest unmatched query; per-query conflicts resolve to min cost).
    """
    q, k = cost.shape
    n_cand = min(n_candidate_k, q)

    # dynamic k per gt = clamp(sum of top-n candidate IoUs, 1, n_cand)
    topk_ious, _ = jax.lax.top_k(ious.T, n_cand)  # [K, n_cand]
    dynamic_ks = jnp.clip(jnp.sum(topk_ious, axis=1).astype(jnp.int32), 1, n_cand)

    # per gt: mark its dynamic_k lowest-cost queries
    _, cand_idx = jax.lax.top_k(-cost.T, n_cand)  # [K, n_cand] query indices, ascending cost
    rank_ok = (jnp.arange(n_cand)[None, :] < dynamic_ks[:, None]) & gt_valid[:, None]
    cols = jnp.broadcast_to(jnp.arange(k)[:, None], (k, n_cand))
    mm = jnp.zeros((q, k), dtype=jnp.float32)
    mm = mm.at[cand_idx.reshape(-1), cols.reshape(-1)].max(rank_ok.reshape(-1).astype(jnp.float32))

    def resolve_conflicts(mm):
        amg = jnp.sum(mm, axis=1)  # queries matched to >1 gt keep only min-cost gt
        best_gt = jnp.argmin(cost, axis=1)  # invalid gts are +inf, never chosen
        onehot = jax.nn.one_hot(best_gt, k, dtype=mm.dtype)
        return jnp.where((amg > 1)[:, None], onehot, mm)

    mm = resolve_conflicts(mm)

    def repair(_, mm):
        matched_q = jnp.sum(mm, axis=1) > 0
        unmatched_col = (jnp.sum(mm, axis=0) == 0) & gt_valid
        cost_r = cost + _BIG * matched_q[:, None].astype(cost.dtype)
        pick = jnp.argmin(cost_r, axis=0)  # [K]
        claim = jax.nn.one_hot(pick, q, dtype=mm.dtype).T  # [Q, K]
        mm = jnp.where(unmatched_col[None, :], jnp.maximum(mm, claim), mm)
        return resolve_conflicts(mm)

    # each pass guarantees progress; K passes are always enough
    mm = jax.lax.fori_loop(0, k, repair, mm)
    return mm


def _match_single(prob, boxes, gt_labels, gt_boxes, gt_valid):
    cost, ious = build_match_cost(prob, boxes, gt_labels, gt_boxes, gt_valid)
    mm = dynamic_k_matching(cost, ious, gt_valid, n_candidate_k=10)
    selected = jnp.sum(mm, axis=1) > 0
    gt_index = jnp.argmax(mm, axis=1)
    cost_matched = jnp.where(mm > 0, cost, _INF)
    matched_query_per_gt = jnp.argmin(cost_matched, axis=0)
    return selected, gt_index, matched_query_per_gt, mm


def match(
    pred_logits: Array,  # [B, Q, C]
    pred_boxes: Array,   # [B, Q, 4] cxcywh
    gt_labels: Array,    # [B, K]
    gt_boxes: Array,     # [B, K, 4] cxcywh
    gt_valid: Array,     # [B, K] bool
) -> MatchResult:
    prob = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    sel, gidx, mq, mm = jax.vmap(_match_single)(
        prob, pred_boxes.astype(jnp.float32), gt_labels, gt_boxes, gt_valid
    )
    return MatchResult(sel, gidx, mq, mm)


def pos_neg_masks(
    ref_prob: Array,     # [Q, C] sigmoid scores on the reference frame
    ref_boxes: Array,    # [Q, 4] cxcywh predicted boxes on the reference frame
    gt_labels: Array,    # [K]
    gt_boxes: Array,     # [K, 4] — reference-frame gt boxes
    gt_valid: Array,     # [K] bool
) -> Tuple[Array, Array]:
    """Contrastive pos/neg query sets per gt (reference: pos_neg_select.py:76 get_pos_idx).

    pos[k, q]: q is in the dynamic-k(10) match of gt k.
    neg[k, q]: q is NOT in the dynamic-k(100) match of gt k.
    """
    cost, ious = build_match_cost(ref_prob, ref_boxes, gt_labels, gt_boxes, gt_valid)
    mm_pos = dynamic_k_matching(cost, ious, gt_valid, n_candidate_k=10)
    mm_neg = dynamic_k_matching(cost, ious, gt_valid, n_candidate_k=100)
    return mm_pos.T > 0, ~(mm_neg.T > 0)
