"""Fixed-shape NMS (reference surface: detectron2/layers/nms.py, torchvision nms).

TPU-idiomatic greedy NMS: instead of returning a dynamic index list, returns a
boolean keep mask over a padded box set. Suppression is the standard sequential
greedy rule computed with a fori_loop over the score-sorted IoU matrix.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..structures.boxes import pairwise_iou
from ..structures.masks import mask_iou_pairwise

Array = jnp.ndarray


def nms_mask(
    boxes: Array,
    scores: Array,
    iou_threshold: float,
    valid: Optional[Array] = None,
) -> Array:
    """Greedy NMS over [N, 4] xyxy boxes; returns keep mask [N] (original order).

    Matches torchvision.ops.nms semantics on the valid subset.
    """
    n = boxes.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    s = scores if valid is None else jnp.where(valid, scores, neg_inf)
    order = jnp.argsort(-s)  # descending
    sorted_boxes = boxes[order]
    iou = pairwise_iou(sorted_boxes, sorted_boxes)

    def body(i, keep):
        suppress = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), dtype=bool))
    if valid is not None:
        keep_sorted = keep_sorted & valid[order]
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: Array,
    scores: Array,
    idxs: Array,
    iou_threshold: float,
    valid: Optional[Array] = None,
) -> Array:
    """Class-aware NMS via the coordinate-offset trick (torchvision batched_nms)."""
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    max_coord = jnp.max(jnp.abs(boxes)) + 1
    offsets = idxs.astype(boxes.dtype) * (2 * max_coord)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid=valid)


def mask_nms_keep(
    mask_logits: Array,
    scores: Array,
    nms_thr: float,
    valid: Optional[Array] = None,
) -> Array:
    """Sequential mask-IoU NMS in the *given order* (reference: idol/models/tracker.py:26).

    Note the reference's mask_nms iterates in input order (inputs arrive pre-sorted
    by the caller), not score order; we reproduce that exactly. ``scores`` is kept
    in the signature for parity but unused, as in the reference.
    """
    del scores
    n = mask_logits.shape[0]
    masks = (jax.nn.sigmoid(mask_logits) > 0.5).reshape(n, -1)
    iou = mask_iou_pairwise(masks, masks)

    def body(i, keep):
        suppress = (iou[i] > nms_thr) & (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    keep = jax.lax.fori_loop(0, n, body, jnp.ones((n,), dtype=bool))
    if valid is not None:
        keep = keep & valid
    return keep
