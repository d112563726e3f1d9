"""FCOS meta-architecture (flax, NHWC, fixed-shape, anchor-free).

Capability parity with detectron2/modeling/meta_arch/fcos.py:26: per-location
classification + distance-to-boundary (l, t, r, b) regression + centerness over
FPN levels p3..p7; GT assignment by center containment and per-level scale
ranges — a single dense vectorized pass (no anchors at all).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import sigmoid_bce_with_logits, sigmoid_focal_loss_elementwise
from ..ops.nms import batched_nms_mask
from ..structures.boxes import elementwise_giou_loss
from .backbones.fpn import FPN
from .backbones.resnet import ResNet
from .retinanet import DetTargets

Array = jnp.ndarray

INF = 1e8


class FCOSHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array]):
        cls_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"cls_conv{i}")
            for i in range(self.num_convs)
        ]
        box_convs = [
            nn.Conv(self.channels, (3, 3), padding="SAME", dtype=self.dtype, name=f"box_conv{i}")
            for i in range(self.num_convs)
        ]
        bias_init = nn.initializers.constant(-math.log((1 - self.prior_prob) / self.prior_prob))
        cls_out = nn.Conv(self.num_classes, (3, 3), padding="SAME", bias_init=bias_init,
                          dtype=self.dtype, name="cls_score")
        box_out = nn.Conv(4, (3, 3), padding="SAME", dtype=self.dtype, name="bbox_pred")
        ctr_out = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="centerness")
        scales = self.param("scales", nn.initializers.ones, (len(features),))

        logits, regs, ctrs = [], [], []
        for lvl, f in enumerate(features):
            c = f
            b = f
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in box_convs:
                b = nn.relu(conv(b))
            logits.append(cls_out(c))
            regs.append(jax.nn.relu(box_out(b).astype(jnp.float32) * scales[lvl]))
            ctrs.append(ctr_out(b))
        return logits, regs, ctrs


class FCOS(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    fpn_channels: int = 256
    strides: Sequence[int] = (8, 16, 32, 64, 128)
    size_ranges: Sequence[Tuple[float, float]] = (
        (-1, 64), (64, 128), (128, 256), (256, 512), (512, INF)
    )
    center_sample_radius: float = 1.5
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    test_score_thresh: float = 0.05
    test_topk: int = 1000
    test_nms_thresh: float = 0.6
    max_detections: int = 100
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.backbone_depth, out_features=("res3", "res4", "res5"),
                               dtype=self.dtype, name="backbone")
        self.fpn = FPN(in_features=("res3", "res4", "res5"), out_channels=self.fpn_channels,
                       top_block="p6p7", dtype=self.dtype, name="fpn")
        self.head = FCOSHead(num_classes=self.num_classes, channels=self.fpn_channels,
                             dtype=self.dtype, name="head")

    def _features(self, images):
        feats = self.fpn(self.backbone(images))
        return [feats[f"p{i}"] for i in range(3, 8)]

    def _points(self, features) -> Tuple[Array, Array, Array]:
        """Flattened (x, y) centers, per-point stride, per-point level size range."""
        pts, strides, ranges = [], [], []
        for lvl, f in enumerate(features):
            h, w = f.shape[1:3]
            s = self.strides[lvl]
            ys = (jnp.arange(h) + 0.5) * s
            xs = (jnp.arange(w) + 0.5) * s
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            pts.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1))
            strides.append(jnp.full((h * w,), s, jnp.float32))
            lo, hi = self.size_ranges[lvl]
            ranges.append(jnp.tile(jnp.asarray([[lo, hi]], jnp.float32), (h * w, 1)))
        return jnp.concatenate(pts), jnp.concatenate(strides), jnp.concatenate(ranges)

    def _assign(self, points, strides, ranges, gt_boxes, gt_labels, gt_valid):
        """Per-point GT assignment (center sampling + scale range + min area)."""
        x = points[:, 0:1]  # [N, 1]
        y = points[:, 1:2]
        l = x - gt_boxes[None, :, 0]
        t = y - gt_boxes[None, :, 1]
        r = gt_boxes[None, :, 2] - x
        b = gt_boxes[None, :, 3] - y
        reg = jnp.stack([l, t, r, b], axis=-1)      # [N, K, 4]
        in_box = jnp.min(reg, axis=-1) > 0

        cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
        cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
        radius = self.center_sample_radius * strides[:, None]
        in_center = (jnp.abs(x - cx[None]) < radius) & (jnp.abs(y - cy[None]) < radius)

        max_reg = jnp.max(reg, axis=-1)
        in_range = (max_reg >= ranges[:, 0:1]) & (max_reg <= ranges[:, 1:2])

        area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
        candidate = in_box & in_center & in_range & gt_valid[None, :]
        area_masked = jnp.where(candidate, area[None, :], INF)
        matched = jnp.argmin(area_masked, axis=1)   # [N]
        fg = jnp.any(candidate, axis=1)
        return matched, fg, reg

    def __call__(self, images: Array, targets: DetTargets, train: bool = True) -> Dict[str, Array]:
        features = self._features(images)
        logits_l, regs_l, ctrs_l = self.head(features)
        points, strides, ranges = self._points(features)
        b = images.shape[0]
        logits = jnp.concatenate([x.reshape(b, -1, self.num_classes) for x in logits_l], 1).astype(jnp.float32)
        regs = jnp.concatenate([x.reshape(b, -1, 4) for x in regs_l], 1)
        ctrs = jnp.concatenate([x.reshape(b, -1) for x in ctrs_l], 1).astype(jnp.float32)

        matched, fg, reg_all = jax.vmap(
            lambda gb, gl, gv: self._assign(points, strides, ranges, gb, gl, gv)
        )(targets.boxes, targets.labels, targets.valid)

        gt_cls = jnp.take_along_axis(targets.labels, matched, axis=1)
        onehot = jax.nn.one_hot(jnp.where(fg, gt_cls, self.num_classes), self.num_classes + 1)[..., :-1]
        num_fg = jnp.maximum(jnp.sum(fg), 1).astype(jnp.float32)
        loss_cls = jnp.sum(
            sigmoid_focal_loss_elementwise(logits, onehot, self.focal_alpha, self.focal_gamma)
        ) / num_fg

        gt_reg = jnp.take_along_axis(reg_all, matched[..., None, None], axis=2)[:, :, 0]  # [B,N,4]
        # giou on decoded boxes, weighted by centerness target
        px = points[None, :, 0]
        py = points[None, :, 1]
        pred_boxes = jnp.stack(
            [px - regs[..., 0] * strides[None], py - regs[..., 1] * strides[None],
             px + regs[..., 2] * strides[None], py + regs[..., 3] * strides[None]], -1
        )
        gt_boxes_pt = jnp.stack(
            [px - gt_reg[..., 0], py - gt_reg[..., 1], px + gt_reg[..., 2], py + gt_reg[..., 3]], -1
        )
        lr = jnp.stack([gt_reg[..., 0], gt_reg[..., 2]], -1)
        tb = jnp.stack([gt_reg[..., 1], gt_reg[..., 3]], -1)
        ctr_target = jnp.sqrt(
            jnp.clip(lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6), 0, 1)
            * jnp.clip(tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6), 0, 1)
        )
        giou = elementwise_giou_loss(pred_boxes, gt_boxes_pt)
        denom = jnp.maximum(jnp.sum(ctr_target * fg), 1e-6)
        loss_box = jnp.sum(giou * ctr_target * fg) / denom
        loss_ctr = jnp.sum(sigmoid_bce_with_logits(ctrs, ctr_target) * fg) / num_fg
        return {"loss_fcos_cls": loss_cls, "loss_fcos_loc": loss_box, "loss_fcos_ctr": loss_ctr}

    def inference(self, images: Array) -> Dict[str, Array]:
        features = self._features(images)
        logits_l, regs_l, ctrs_l = self.head(features)
        points, strides, _ = self._points(features)
        b = images.shape[0]
        logits = jnp.concatenate([x.reshape(b, -1, self.num_classes) for x in logits_l], 1).astype(jnp.float32)
        regs = jnp.concatenate([x.reshape(b, -1, 4) for x in regs_l], 1)
        ctrs = jnp.concatenate([x.reshape(b, -1) for x in ctrs_l], 1).astype(jnp.float32)

        px = points[None, :, 0]
        py = points[None, :, 1]
        boxes = jnp.stack(
            [px - regs[..., 0] * strides[None], py - regs[..., 1] * strides[None],
             px + regs[..., 2] * strides[None], py + regs[..., 3] * strides[None]], -1
        )
        k = min(self.test_topk, logits.shape[1])

        def per_image(lg, bx, ct):
            scores = jnp.sqrt(jax.nn.sigmoid(lg) * jax.nn.sigmoid(ct)[:, None])
            best = jnp.max(scores, 1)
            cls = jnp.argmax(scores, 1)
            topv, topi = jax.lax.top_k(best, k)
            cand = bx[topi]
            ccls = cls[topi]
            valid = topv > self.test_score_thresh
            keep = batched_nms_mask(cand, topv, ccls, self.test_nms_thresh, valid=valid)
            sc = jnp.where(keep, topv, -1.0)
            outv, outi = jax.lax.top_k(sc, self.max_detections)
            return cand[outi], outv, ccls[outi], outv > 0

        boxes_o, scores_o, cls_o, valid_o = jax.vmap(per_image)(logits, boxes, ctrs)
        return {"boxes": boxes_o, "scores": scores_o, "classes": cls_o, "valid": valid_o}
