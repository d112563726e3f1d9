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
