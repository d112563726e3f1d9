"""Dense-detector building blocks: anchors, box transforms, IoU matcher.

Capability parity with detectron2/modeling/anchor_generator.py
(DefaultAnchorGenerator), box_regression.py (Box2BoxTransform) and matcher.py:127
(Matcher with allow_low_quality_matches) — all fixed-shape jnp.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.boxes import pairwise_iou

Array = jnp.ndarray


def generate_cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """[len(sizes)*len(ratios), 4] xyxy anchors centered at (0, 0)."""
    anchors = []
    for size in sizes:
        area = size**2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, np.float32)


def anchors_for_level(
    feat_h: int, feat_w: int, stride: int, cell_anchors: np.ndarray
) -> Array:
    """[H*W*A, 4] anchors for one feature level (grid of shifted cell anchors)."""
    shifts_x = (np.arange(feat_w) + 0.5) * stride
    shifts_y = (np.arange(feat_h) + 0.5) * stride
    sx, sy = np.meshgrid(shifts_x, shifts_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    out = shifts[:, None, :] + cell_anchors[None, :, :]
    return jnp.asarray(out.reshape(-1, 4), jnp.float32)


class Box2BoxTransform:
    """(dx, dy, dw, dh) anchor-relative box parameterization (box_regression.py)."""

    def __init__(self, weights: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
                 scale_clamp: float = math.log(1000.0 / 16)):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src_boxes: Array, target_boxes: Array) -> Array:
        sw = src_boxes[..., 2] - src_boxes[..., 0]
        sh = src_boxes[..., 3] - src_boxes[..., 1]
        sx = src_boxes[..., 0] + 0.5 * sw
        sy = src_boxes[..., 1] + 0.5 * sh
        tw = target_boxes[..., 2] - target_boxes[..., 0]
        th = target_boxes[..., 3] - target_boxes[..., 1]
        tx = target_boxes[..., 0] + 0.5 * tw
        ty = target_boxes[..., 1] + 0.5 * th
        wx, wy, ww, wh = self.weights
        return jnp.stack(
            [
                wx * (tx - sx) / jnp.maximum(sw, 1e-6),
                wy * (ty - sy) / jnp.maximum(sh, 1e-6),
                ww * jnp.log(jnp.maximum(tw, 1e-6) / jnp.maximum(sw, 1e-6)),
                wh * jnp.log(jnp.maximum(th, 1e-6) / jnp.maximum(sh, 1e-6)),
            ],
            axis=-1,
        )

    def apply_deltas(self, deltas: Array, boxes: Array) -> Array:
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        cx = boxes[..., 0] + 0.5 * w
        cy = boxes[..., 1] + 0.5 * h
        wx, wy, ww, wh = self.weights
        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.clip(deltas[..., 2] / ww, None, self.scale_clamp)
        dh = jnp.clip(deltas[..., 3] / wh, None, self.scale_clamp)
        pcx = dx * w + cx
        pcy = dy * h + cy
        pw = jnp.exp(dw) * w
        ph = jnp.exp(dh) * h
        return jnp.stack(
            [pcx - pw / 2, pcy - ph / 2, pcx + pw / 2, pcy + ph / 2], axis=-1
        )


def iou_matcher(
    gt_boxes: Array,          # [K, 4] xyxy
    gt_valid: Array,          # [K]
    anchors: Array,           # [N, 4]
    thresholds: Tuple[float, float] = (0.4, 0.5),
    allow_low_quality_matches: bool = True,
) -> Tuple[Array, Array]:
    """Returns (matched_gt_idx [N], match_labels [N]: 1 fg / 0 bg / -1 ignore).

    detectron2 Matcher semantics: iou >= hi -> fg, < lo -> bg, in between -> ignore;
    low-quality matches force each gt's best anchor to fg.
    """
    iou = pairwise_iou(gt_boxes, anchors)                # [K, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = jnp.max(iou, axis=0)                  # [N]
    matched_idx = jnp.argmax(iou, axis=0)
    lo, hi = thresholds
    labels = jnp.where(matched_vals >= hi, 1, jnp.where(matched_vals < lo, 0, -1))
    if allow_low_quality_matches:
        best_per_gt = jnp.max(iou, axis=1, keepdims=True)  # [K, 1]
        is_best = (iou >= best_per_gt - 1e-5) & (best_per_gt > 0) & gt_valid[:, None]
        force_fg = jnp.any(is_best, axis=0)
        labels = jnp.where(force_fg, 1, labels)
    return matched_idx, labels
