"""Additional ROI heads beyond StandardROIHeads.

Capability parity with detectron2/modeling/roi_heads/:
- roi_heads.py:430 Res5ROIHeads — the C4 layout: ROIs pooled from res4, the
  shared res5 stage acts as the box head, masks branch off the res5 output;
- keypoint_head.py:216 KRCNNConvDeconvUpsampleHead + keypoint_rcnn_loss:44 /
  keypoint_rcnn_inference (heatmap cross-entropy over flattened per-keypoint
  grids; decode via the Keypoints structure);
- rotated_fast_rcnn.py:270 RROIHeads — 5-param rotated boxes pooled with
  ROIAlignRotated, Box2BoxTransformRotated deltas, rotated NMS at inference.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.interpolate import resize_bilinear
from ..ops.roi_align import roi_align
from ..ops.roi_align_rotated import roi_align_rotated
from ..ops.rotated_boxes import nms_rotated_mask, pairwise_iou_rotated
from ..structures.keypoints import Keypoints
from .backbones.resnet import Bottleneck

Array = jnp.ndarray


class Res5ROIHeads(nn.Module):
    """C4 heads: pool [14x14] from res4 (stride 16), run the res5 stage
    (3 bottlenecks, first stride 2) as the shared head, mean-pool for the box
    predictor; the mask head consumes the res5 map directly."""

    num_classes: int = 80
    pooler_size: int = 14
    mask_on: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, res4: Array, rois: Array) -> Dict[str, Array]:
        """res4: [B, H, W, 1024]; rois: [B, R, 4] absolute xyxy."""
        b, r, _ = rois.shape
        batch_col = jnp.broadcast_to(jnp.arange(b)[:, None], (b, r)).reshape(-1, 1)
        flat = jnp.concatenate([batch_col.astype(jnp.float32), rois.reshape(-1, 4)], 1)
        pooled = roi_align(res4, flat, (self.pooler_size, self.pooler_size),
                           spatial_scale=1.0 / 16, sampling_ratio=2)
        x = pooled
        for i in range(3):
            x = Bottleneck(mid_channels=512, out_channels=2048,
                           stride=2 if i == 0 else 1, dtype=self.dtype,
                           name=f"res5_{i}")(x)                  # [B*R, 7, 7, 2048]
        feat = jnp.mean(x, axis=(1, 2))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls_score")(feat)
        box_deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(feat)
        out = {
            "cls_logits": cls_logits.reshape(b, r, -1).astype(jnp.float32),
            "box_deltas": box_deltas.reshape(b, r, -1).astype(jnp.float32),
        }
        if self.mask_on:
            m = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype,
                                         name="mask_deconv")(x))
            m = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="mask_pred")(m)
            out["mask_logits"] = m.reshape(b, r, *m.shape[1:]).astype(jnp.float32)
        return out


class KRCNNConvDeconvUpsampleHead(nn.Module):
    """8x conv(512) -> deconv x2 -> bilinear x2 -> K heatmap logits."""

    num_keypoints: int = 17
    conv_dims: Sequence[int] = (512,) * 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: Array) -> Array:
        """pooled: [N, s, s, C] -> heatmap logits [N, 4s, 4s, K]."""
        x = pooled
        for i, c in enumerate(self.conv_dims):
            x = nn.relu(nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                                name=f"conv_fcn{i + 1}")(x))
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             dtype=self.dtype, name="score_lowres")(x)
        n, h, w, k = x.shape
        x = resize_bilinear(x.transpose(0, 3, 1, 2), 2 * h, 2 * w)
        return x.transpose(0, 2, 3, 1).astype(jnp.float32)


def keypoint_rcnn_loss(heatmap_logits: Array, keypoints: Array, rois: Array,
                       fg_mask: Array) -> Array:
    """Cross-entropy over the flattened SxS grid per visible keypoint.

    heatmap_logits: [N, S, S, K]; keypoints: [N, K, 3] absolute (x, y, vis);
    rois: [N, 4]; fg_mask: [N] foreground-ROI weights.
    """
    n, s, _, k = heatmap_logits.shape
    idx, valid = Keypoints(keypoints).to_heatmap(rois, heatmap_size=s)  # [N, K]
    logits = heatmap_logits.transpose(0, 3, 1, 2).reshape(n, k, s * s)
    logp = jax.nn.log_softmax(logits, -1)
    ce = -jnp.take_along_axis(logp, jnp.clip(idx, 0, s * s - 1)[..., None], -1)[..., 0]
    w = valid.astype(jnp.float32) * fg_mask[:, None].astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def keypoint_rcnn_inference(heatmap_logits: Array, rois: Array) -> Array:
    """[N, K, 3] (x, y, score) decoded from per-ROI heatmaps."""
    return Keypoints.from_heatmap(heatmap_logits, rois)


class Box2BoxTransformRotated:
    """(dx, dy, dw, dh, da) deltas for (cx, cy, w, h, angle_deg) boxes
    (reference box_regression.py Box2BoxTransformRotated; angles normalized to
    (-180, 180])."""

    def __init__(self, weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0, 1.0),
                 scale_clamp: float = math.log(1000.0 / 16)):
        self.weights = weights
        self.scale_clamp = scale_clamp

    def get_deltas(self, src: Array, target: Array) -> Array:
        wx, wy, ww, wh, wa = self.weights
        dx = wx * (target[..., 0] - src[..., 0]) / jnp.maximum(src[..., 2], 1e-6)
        dy = wy * (target[..., 1] - src[..., 1]) / jnp.maximum(src[..., 3], 1e-6)
        dw = ww * jnp.log(jnp.maximum(target[..., 2], 1e-6) / jnp.maximum(src[..., 2], 1e-6))
        dh = wh * jnp.log(jnp.maximum(target[..., 3], 1e-6) / jnp.maximum(src[..., 3], 1e-6))
        da_deg = target[..., 4] - src[..., 4]
        da_deg = (da_deg + 180.0) % 360.0 - 180.0
        da = wa * da_deg * jnp.pi / 180.0
        return jnp.stack([dx, dy, dw, dh, da], -1)

    def apply_deltas(self, deltas: Array, boxes: Array) -> Array:
        wx, wy, ww, wh, wa = self.weights
        cx = boxes[..., 0] + deltas[..., 0] / wx * boxes[..., 2]
        cy = boxes[..., 1] + deltas[..., 1] / wy * boxes[..., 3]
        w = boxes[..., 2] * jnp.exp(jnp.clip(deltas[..., 2] / ww, -self.scale_clamp,
                                             self.scale_clamp))
        h = boxes[..., 3] * jnp.exp(jnp.clip(deltas[..., 3] / wh, -self.scale_clamp,
                                             self.scale_clamp))
        a = boxes[..., 4] + deltas[..., 4] / wa * 180.0 / jnp.pi
        a = (a + 180.0) % 360.0 - 180.0
        return jnp.stack([cx, cy, w, h, a], -1)


class RROIHeads(nn.Module):
    """Rotated-box ROI heads: ROIAlignRotated pooling + 5-param regression."""

    num_classes: int = 10
    pooler_size: int = 7
    fc_dim: int = 1024
    test_nms_thresh: float = 0.3
    test_score_thresh: float = 0.05
    max_detections: int = 100
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Array, rois: Array, spatial_scale: float,
                 train: bool = True) -> Dict[str, Array]:
        """features: [B, H, W, C] single level; rois: [B, R, 5] (cx,cy,w,h,a)."""
        b, r, _ = rois.shape
        batch_col = jnp.broadcast_to(jnp.arange(b)[:, None], (b, r)).reshape(-1, 1)
        flat = jnp.concatenate([batch_col.astype(jnp.float32), rois.reshape(-1, 5)], 1)
        pooled = roi_align_rotated(features, flat, (self.pooler_size, self.pooler_size),
                                   spatial_scale=spatial_scale, sampling_ratio=2)
        x = pooled.reshape(b * r, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(5, dtype=self.dtype, name="bbox_pred")(x)  # class-agnostic
        out = {
            "cls_logits": cls_logits.reshape(b, r, -1).astype(jnp.float32),
            "box_deltas": deltas.reshape(b, r, 5).astype(jnp.float32),
        }
        if not train:
            transform = Box2BoxTransformRotated()
            boxes = transform.apply_deltas(out["box_deltas"], rois)
            probs = jax.nn.softmax(out["cls_logits"], -1)[..., :-1]

            def per_image(bx, pr):
                best = jnp.max(pr, -1)
                cls = jnp.argmax(pr, -1)
                valid = best > self.test_score_thresh
                keep = nms_rotated_mask(bx, best, self.test_nms_thresh, valid=valid)
                sc = jnp.where(keep, best, -1.0)
                outv, outi = jax.lax.top_k(sc, min(self.max_detections, bx.shape[0]))
                return bx[outi], outv, cls[outi], outv > 0

            boxes, scores, classes, valid = jax.vmap(per_image)(boxes, probs)
            out.update({"boxes": boxes, "scores": scores, "classes": classes,
                        "valid": valid})
        return out

    @staticmethod
    def losses(cls_logits: Array, box_deltas: Array, rois: Array,
               gt_boxes: Array, gt_labels: Array, gt_valid: Array,
               num_classes: int, iou_thresh: float = 0.5) -> Dict[str, Array]:
        """Rotated-IoU matching + CE and smooth-L1-style delta regression."""
        def match_one(rb, gb, gv):
            iou = pairwise_iou_rotated(rb, gb)                  # [R, K]
            iou = jnp.where(gv[None, :], iou, -1.0)
            best = jnp.argmax(iou, 1)
            best_iou = jnp.max(iou, 1)
            return best, best_iou >= iou_thresh

        matched, fg = jax.vmap(match_one)(rois, gt_boxes, gt_valid)
        gt_cls = jnp.take_along_axis(gt_labels, matched, axis=1)
        target_cls = jnp.where(fg, gt_cls, num_classes)
        ce = -jax.nn.log_softmax(cls_logits, -1)
        cls_loss = jnp.take_along_axis(ce, target_cls[..., None], -1)[..., 0]
        matched_boxes = jnp.take_along_axis(gt_boxes, matched[..., None], axis=1)
        gt_deltas = Box2BoxTransformRotated().get_deltas(rois, matched_boxes)
        reg = jnp.abs(box_deltas - gt_deltas).sum(-1)
        n_fg = jnp.maximum(jnp.sum(fg), 1.0)
        return {
            "loss_cls_rotated": jnp.mean(cls_loss),
            "loss_box_reg_rotated": jnp.sum(reg * fg) / n_fg,
        }
