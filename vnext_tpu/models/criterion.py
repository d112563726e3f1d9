"""SetCriterion: fixed-shape DETR-style losses for IDOL/SeqFormer.

Capability parity with idol/models/deformable_detr.py:236 (SetCriterion: focal class
loss :261, L1+gIoU boxes :314, focal+dice masks :354, contrastive ReID :418) — recast
over padded GT slots and padded matched-instance slots so every loss is a masked
fixed-shape reduction inside jit.

Distributed note: the reference all-reduces its loss normalizers across GPUs
(deformable_detr.py:491). Here losses are written as *global* batch reductions;
under pjit over a data mesh XLA inserts the psum automatically, so no explicit
collective is needed.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.losses import dice_loss, sigmoid_focal_loss, sigmoid_focal_loss_elementwise
from ..structures.boxes import box_cxcywh_to_xyxy, elementwise_giou_loss
from .matcher import MatchResult

Array = jnp.ndarray


class Targets(NamedTuple):
    """Padded per-frame ground truth. K = fixed instance capacity."""

    labels: Array      # [B, K] int32 class ids (padding arbitrary)
    boxes: Array       # [B, K, 4] normalized cxcywh
    masks_s4: Array    # [B, K, H/4, W/4] bool — GT masks pre-sampled at mask_out_stride
    valid: Array       # [B, K] bool
    inst_id: Array     # [B, K] int32 instance/track ids (-1 = absent)


def loss_labels(
    logits: Array, match: MatchResult, targets: Targets, num_classes: int,
    focal_alpha: float = 0.25,
) -> Array:
    """Focal classification loss over all queries (reference :261 loss_labels)."""
    b, q, _ = logits.shape
    gt_cls = jnp.take_along_axis(targets.labels, match.gt_index, axis=1)  # [B, Q]
    target_classes = jnp.where(match.selected_query, gt_cls, num_classes)
    onehot = jax.nn.one_hot(target_classes, num_classes + 1, dtype=jnp.float32)[..., :-1]
    num_boxes = jnp.maximum(jnp.sum(match.selected_query), 1).astype(jnp.float32)
    # reference: sigmoid_focal_loss(...).mean(1).sum()/num_boxes * Q, which over
    # [B, Q, C] equals a plain elementwise sum / num_boxes
    loss = sigmoid_focal_loss_elementwise(
        logits.astype(jnp.float32), onehot, alpha=focal_alpha
    )
    return jnp.sum(loss) / num_boxes


def loss_boxes(boxes: Array, match: MatchResult, targets: Targets) -> Dict[str, Array]:
    """L1 + gIoU on matched (query, gt) pairs (reference :314 loss_boxes)."""
    gt_boxes = jnp.take_along_axis(targets.boxes, match.gt_index[..., None], axis=1)  # [B, Q, 4]
    sel = match.selected_query.astype(jnp.float32)
    num = jnp.maximum(jnp.sum(sel), 1.0)
    l1 = jnp.abs(boxes.astype(jnp.float32) - gt_boxes).sum(-1)
    giou = elementwise_giou_loss(
        box_cxcywh_to_xyxy(boxes.astype(jnp.float32)), box_cxcywh_to_xyxy(gt_boxes)
    )
    return {
        "loss_bbox": jnp.sum(l1 * sel) / num,
        "loss_giou": jnp.sum(giou * sel) / num,
    }


def loss_masks(
    mask_logits: Array,   # [B, N, H4, W4] dynamic-head outputs for padded inst slots
    inst_gt_index: Array,  # [B, N] gt slot of each inst slot
    inst_valid: Array,     # [B, N] bool
    targets: Targets,
) -> Dict[str, Array]:
    """Focal + dice mask losses on matched instance slots (reference :354 loss_masks)."""
    b, n = inst_gt_index.shape
    gt = jnp.take_along_axis(
        targets.masks_s4.astype(mask_logits.dtype), inst_gt_index[..., None, None], axis=1
    )  # [B, N, H4, W4]
    num = jnp.maximum(jnp.sum(inst_valid), 1).astype(jnp.float32)
    flat_logits = mask_logits.reshape(b * n, -1).astype(jnp.float32)
    flat_gt = gt.reshape(b * n, -1).astype(jnp.float32)
    flat_valid = inst_valid.reshape(b * n)
    return {
        "loss_mask": sigmoid_focal_loss(flat_logits, flat_gt, num, valid=flat_valid),
        "loss_dice": dice_loss(flat_logits, flat_gt, num, valid=flat_valid),
    }


def loss_reid(
    key_embeds: Array,     # [B, Q, C] reid embeddings on the key frame (last layer)
    ref_embeds: Array,     # [B, Q, C] reid embeddings on the reference frame
    matched_query_per_gt: Array,  # [B, K] key query matched to each gt
    pos_mask: Array,       # [B, K, Q] ref queries that are positives for each gt
    neg_mask: Array,       # [B, K, Q] ref queries that are negatives for each gt
    item_valid: Array,     # [B, K] bool — gt visible in both frames
) -> Dict[str, Array]:
    """Contrastive ReID loss (reference :418 loss_reid + pos_neg_select.py:13).

    Per (image, gt): s = <ref_embed_q, key_embed_matched>. The reference's
    logsumexp-over-pairs objective log(1 + sum_{i in pos, j in neg} e^{s_j - s_i})
    factorizes as softplus(LSE_neg(s) + LSE_pos(-s)); both LSEs are masked.

    The auxiliary cosine loss samples min(10*|pos|, |neg|) negatives uniformly in
    the reference; we use its exact expectation (deterministic, jit-friendly):
    [sum_pos (cos-1)^2 + n_samp * mean_neg cos^2] / (|pos| + n_samp).
    """
    key_sel = jnp.take_along_axis(key_embeds, matched_query_per_gt[..., None], axis=1)  # [B,K,C]
    scores = jnp.einsum("bqc,bkc->bkq", ref_embeds.astype(jnp.float32), key_sel.astype(jnp.float32))

    def masked_lse(x, m):
        x = jnp.where(m, x, -jnp.inf)
        return jax.scipy.special.logsumexp(x, axis=-1)

    has_pos = jnp.any(pos_mask, axis=-1)
    lse_neg = masked_lse(scores, neg_mask)                      # [B, K]
    lse_pos_inv = masked_lse(-scores, pos_mask)                 # [B, K]
    contras = jax.nn.softplus(lse_neg + lse_pos_inv)
    contras = jnp.where(has_pos & item_valid, contras, 0.0)

    # aux cosine
    key_n = key_sel / jnp.maximum(jnp.linalg.norm(key_sel, axis=-1, keepdims=True), 1e-12)
    ref_n = ref_embeds / jnp.maximum(jnp.linalg.norm(ref_embeds, axis=-1, keepdims=True), 1e-12)
    cos = jnp.einsum("bqc,bkc->bkq", ref_n.astype(jnp.float32), key_n.astype(jnp.float32))
    n_pos = jnp.sum(pos_mask, axis=-1).astype(jnp.float32)
    n_neg = jnp.maximum(jnp.sum(neg_mask, axis=-1).astype(jnp.float32), 1.0)
    n_samp = jnp.where(n_pos > 0, jnp.minimum(10.0 * n_pos, n_neg), 10.0)
    pos_term = jnp.sum(jnp.where(pos_mask, (cos - 1.0) ** 2, 0.0), axis=-1)
    neg_term = n_samp * jnp.sum(jnp.where(neg_mask, cos**2, 0.0), axis=-1) / n_neg
    aux = (pos_term + neg_term) / jnp.maximum(n_pos + n_samp, 1.0)
    aux = jnp.where(item_valid, aux, 0.0)

    num_items = jnp.maximum(jnp.sum(item_valid), 1).astype(jnp.float32)
    return {
        "loss_reid": jnp.sum(contras) / num_items,
        "loss_reid_aux": jnp.sum(aux) / num_items,
    }


def default_weight_dict(
    class_weight=2.0, l1_weight=5.0, giou_weight=2.0, mask_weight=2.0,
    dice_weight=5.0, reid_weight=2.0, dec_layers=6, deep_supervision=True,
) -> Dict[str, float]:
    """Loss weights (reference: idol/idol.py:178-186)."""
    w = {
        "loss_ce": class_weight,
        "loss_bbox": l1_weight,
        "loss_giou": giou_weight,
        "loss_reid": reid_weight,
        "loss_reid_aux": reid_weight * 1.5,
        "loss_mask": mask_weight,
        "loss_dice": dice_weight,
    }
    if deep_supervision:
        base = dict(w)
        for i in range(dec_layers - 1):
            w.update({f"{k}_{i}": v for k, v in base.items()})
    return w
