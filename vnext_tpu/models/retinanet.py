"""RetinaNet meta-architecture (flax, NHWC, fixed-shape).

Capability parity with detectron2/modeling/meta_arch/retinanet.py:29: ResNet+FPN
(p3..p7), shared 4-conv cls/box towers, focal classification loss + smooth-L1 box
regression on IoU-matched anchors, top-k + class-aware NMS inference — all as
dense fixed-shape computations (anchor matching is a single vectorized pass; no
subsampling needed with focal loss).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import sigmoid_focal_loss_elementwise
from ..ops.nms import batched_nms_mask
from .backbones.fpn import FPN
from .backbones.resnet import ResNet
from .dense_heads import (
    Box2BoxTransform,
    anchors_for_level,
    generate_cell_anchors,
    iou_matcher,
)

Array = jnp.ndarray


class DetTargets(NamedTuple):
    """Padded detection GT: boxes in absolute xyxy."""

    labels: Array   # [B, K]
    boxes: Array    # [B, K, 4]
    valid: Array    # [B, K]


class RetinaNetHead(nn.Module):
    num_classes: int
    num_anchors: int
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array]) -> Tuple[List[Array], List[Array]]:
        cls_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"cls_conv{i}")
            for i in range(self.num_convs)
        ]
        box_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"box_conv{i}")
            for i in range(self.num_convs)
        ]
        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        cls_out = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding="SAME",
            bias_init=bias_init, dtype=self.dtype, name="cls_score",
        )
        box_out = nn.Conv(
            self.num_anchors * 4, (3, 3), padding="SAME", dtype=self.dtype, name="bbox_pred"
        )
        logits, deltas = [], []
        for f in features:
            c = f
            b = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in box_convs:
                b = nn.relu(conv(b))
            logits.append(cls_out(c))
            deltas.append(box_out(b))
        return logits, deltas


class RetinaNet(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    fpn_channels: int = 256
    anchor_sizes: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    iou_thresholds: Tuple[float, float] = (0.4, 0.5)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    test_score_thresh: float = 0.05
    test_topk: int = 1000
    test_nms_thresh: float = 0.5
    max_detections: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(
            depth=self.backbone_depth, out_features=("res3", "res4", "res5"),
            dtype=self.dtype, name="backbone",
        )
        self.fpn = FPN(
            in_features=("res3", "res4", "res5"), out_channels=self.fpn_channels,
            top_block="p6p7", dtype=self.dtype, name="fpn",
        )
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=len(self.anchor_sizes[0]) * len(self.aspect_ratios),
            channels=self.fpn_channels,
            dtype=self.dtype,
            name="head",
        )
        self.box2box = Box2BoxTransform()

    def _features(self, images: Array) -> List[Array]:
        feats = self.fpn(self.backbone(images))
        return [feats[f"p{i}"] for i in range(3, 8)]

    def _anchors(self, features: List[Array]) -> Array:
        all_anchors = []
        for lvl, f in enumerate(features):
            cell = generate_cell_anchors(self.anchor_sizes[lvl], self.aspect_ratios)
            all_anchors.append(
                anchors_for_level(f.shape[1], f.shape[2], self.strides[lvl], cell)
            )
        return jnp.concatenate(all_anchors, axis=0)  # [N, 4]

    def __call__(self, images: Array, targets: DetTargets, train: bool = True) -> Dict[str, Array]:
        features = self._features(images)
        logits_l, deltas_l = self.head(features)
        anchors = self._anchors(features)
        n = anchors.shape[0]
        logits = jnp.concatenate(
            [l.reshape(l.shape[0], -1, self.num_classes) for l in logits_l], axis=1
        ).astype(jnp.float32)
        deltas = jnp.concatenate(
            [d.reshape(d.shape[0], -1, 4) for d in deltas_l], axis=1
        ).astype(jnp.float32)

        def match_one(gt_boxes, gt_valid):
            return iou_matcher(gt_boxes, gt_valid, anchors, self.iou_thresholds)

        matched_idx, match_labels = jax.vmap(match_one)(targets.boxes, targets.valid)

        gt_cls = jnp.take_along_axis(targets.labels, matched_idx, axis=1)
        fg = match_labels == 1
        valid_anchor = match_labels >= 0
        onehot = jax.nn.one_hot(
            jnp.where(fg, gt_cls, self.num_classes), self.num_classes + 1
        )[..., :-1]
        cls_loss = sigmoid_focal_loss_elementwise(
            logits, onehot, self.focal_alpha, self.focal_gamma
        )
        num_fg = jnp.maximum(jnp.sum(fg), 1).astype(jnp.float32)
        loss_cls = jnp.sum(cls_loss * valid_anchor[..., None]) / num_fg

        gt_boxes = jnp.take_along_axis(targets.boxes, matched_idx[..., None], axis=1)
        gt_deltas = self.box2box.get_deltas(anchors[None], gt_boxes)
        diff = jnp.abs(deltas - gt_deltas)
        beta = self.smooth_l1_beta
        sl1 = jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
        loss_box = jnp.sum(sl1.sum(-1) * fg) / num_fg
        return {"loss_cls": loss_cls, "loss_box_reg": loss_box}

    def inference(self, images: Array) -> Dict[str, Array]:
        """Fixed-shape inference: per-image top-k candidates + class-aware NMS.

        Returns padded detections: boxes [B, max_det, 4], scores/classes/valid.
        """
        features = self._features(images)
        logits_l, deltas_l = self.head(features)
        anchors = self._anchors(features)
        b = images.shape[0]
        logits = jnp.concatenate(
            [l.reshape(b, -1, self.num_classes) for l in logits_l], axis=1
        ).astype(jnp.float32)
        deltas = jnp.concatenate([d.reshape(b, -1, 4) for d in deltas_l], axis=1).astype(
            jnp.float32
        )
        boxes_all = self.box2box.apply_deltas(deltas, anchors[None])

        k = min(self.test_topk, logits.shape[1])

        def per_image(lg, bx):
            scores = jax.nn.sigmoid(lg)
            best_score = jnp.max(scores, axis=1)
            best_cls = jnp.argmax(scores, axis=1)
            topv, topi = jax.lax.top_k(best_score, k)
            cand_boxes = bx[topi]
            cand_cls = best_cls[topi]
            valid = topv > self.test_score_thresh
            keep = batched_nms_mask(cand_boxes, topv, cand_cls, self.test_nms_thresh, valid=valid)
            score_keep = jnp.where(keep, topv, -1.0)
            outv, outi = jax.lax.top_k(score_keep, self.max_detections)
            return (
                cand_boxes[outi],
                outv,
                cand_cls[outi],
                outv > 0,
            )

        boxes, scores, classes, valid = jax.vmap(per_image)(logits, boxes_all)
        return {"boxes": boxes, "scores": scores, "classes": classes, "valid": valid}
