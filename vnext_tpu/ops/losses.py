"""Detection/segmentation losses (jnp, mask-aware fixed-shape versions).

Numerics match the reference (projects/IDOL/idol/models/segmentation_condInst.py:657,675
dice_loss / sigmoid_focal_loss), extended with explicit validity masks so padded
queries/instances contribute exactly zero.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def sigmoid_bce_with_logits(logits: Array, targets: Array) -> Array:
    """Elementwise binary cross entropy with logits (stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss_elementwise(
    logits: Array, targets: Array, alpha: float = 0.25, gamma: float = 2.0
) -> Array:
    prob = jax.nn.sigmoid(logits)
    ce = sigmoid_bce_with_logits(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def sigmoid_focal_loss(
    logits: Array,
    targets: Array,
    num_boxes: Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
    valid: Optional[Array] = None,
) -> Array:
    """mean-over-last-dims then sum/num_boxes, as in the reference.

    logits/targets: [N, ...]; valid: optional [N] mask zeroing padded rows.
    """
    loss = sigmoid_focal_loss_elementwise(logits, targets, alpha, gamma)
    per_row = loss.reshape(loss.shape[0], -1).mean(axis=1)
    if valid is not None:
        per_row = per_row * valid.astype(per_row.dtype)
    return per_row.sum() / num_boxes


def dice_loss(
    logits: Array, targets: Array, num_boxes: Array, valid: Optional[Array] = None
) -> Array:
    """DICE loss over [N, ...] rows (reference: segmentation_condInst.py:657)."""
    inputs = jax.nn.sigmoid(logits).reshape(logits.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1).astype(inputs.dtype)
    numerator = 2 * (inputs * targets).sum(axis=1)
    denominator = inputs.sum(axis=-1) + targets.sum(axis=-1)
    loss = 1 - (numerator + 1) / (denominator + 1)
    if valid is not None:
        loss = loss * valid.astype(loss.dtype)
    return loss.sum() / num_boxes


def diou_loss(boxes1: Array, boxes2: Array, eps: float = 1e-7) -> Array:
    """Distance-IoU loss, elementwise over [..., 4] xyxy pairs (capability
    parity with detectron2/layers/losses.py:9 diou_loss):
    1 - IoU + d^2(centers)/c^2(enclosing diagonal)."""
    x1, y1, x2, y2 = [boxes1[..., i] for i in range(4)]
    x1g, y1g, x2g, y2g = [boxes2[..., i] for i in range(4)]

    xi1 = jnp.maximum(x1, x1g)
    yi1 = jnp.maximum(y1, y1g)
    xi2 = jnp.minimum(x2, x2g)
    yi2 = jnp.minimum(y2, y2g)
    inter = jnp.clip(xi2 - xi1, 0) * jnp.clip(yi2 - yi1, 0)
    union = (x2 - x1) * (y2 - y1) + (x2g - x1g) * (y2g - y1g) - inter
    iou = inter / (union + eps)

    xc1 = jnp.minimum(x1, x1g)
    yc1 = jnp.minimum(y1, y1g)
    xc2 = jnp.maximum(x2, x2g)
    yc2 = jnp.maximum(y2, y2g)
    diag = (xc2 - xc1) ** 2 + (yc2 - yc1) ** 2 + eps
    d2 = ((x1 + x2 - x1g - x2g) ** 2 + (y1 + y2 - y1g - y2g) ** 2) / 4.0
    return 1.0 - iou + d2 / diag


def ciou_loss(boxes1: Array, boxes2: Array, eps: float = 1e-7) -> Array:
    """Complete-IoU loss (detectron2/layers/losses.py:64 ciou_loss): DIoU plus
    the aspect-ratio consistency term alpha*v (v gradient treats alpha as a
    constant, matching the reference's detached weighting)."""
    x1, y1, x2, y2 = [boxes1[..., i] for i in range(4)]
    x1g, y1g, x2g, y2g = [boxes2[..., i] for i in range(4)]
    w, h = x2 - x1, y2 - y1
    wg, hg = x2g - x1g, y2g - y1g

    base = diou_loss(boxes1, boxes2, eps)
    xi1 = jnp.maximum(x1, x1g)
    yi1 = jnp.maximum(y1, y1g)
    xi2 = jnp.minimum(x2, x2g)
    yi2 = jnp.minimum(y2, y2g)
    inter = jnp.clip(xi2 - xi1, 0) * jnp.clip(yi2 - yi1, 0)
    union = w * h + wg * hg - inter
    iou = inter / (union + eps)

    v = (4.0 / jnp.pi**2) * (jnp.arctan(wg / (hg + eps)) - jnp.arctan(w / (h + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + eps))
    return base + alpha * v
