"""GeneralizedRCNN (flax, NHWC, fixed-shape): RPN + ROI box/mask heads.

Capability parity with detectron2/modeling/meta_arch/rcnn.py:24 (GeneralizedRCNN),
proposal_generator/rpn.py (RPN), roi_heads/roi_heads.py (StandardROIHeads with
FastRCNNOutputLayers + mask head) — recast TPU-first:

- proposals live in fixed-capacity padded slots (top-k pre-NMS, masked NMS,
  top-k post-NMS) instead of variable-length lists;
- fg/bg proposal subsampling uses a jittable top-k-of-randomized-priority trick
  instead of host-side random permutation;
- ROI pooling is the matmul-form roi_align (ops/roi_align.py) with per-ROI FPN
  level assignment folded in as a weighted sum over levels (each ROI has nonzero
  weight only on its assigned level), keeping everything dense.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.losses import sigmoid_bce_with_logits
from ..ops.nms import batched_nms_mask, nms_mask
from ..ops.roi_align import roi_align
from ..structures.boxes import clip_boxes
from .backbones.fpn import FPN
from .backbones.resnet import ResNet
from .dense_heads import (
    Box2BoxTransform,
    anchors_for_level,
    generate_cell_anchors,
    iou_matcher,
)
from .retinanet import DetTargets

Array = jnp.ndarray


class RPN(nn.Module):
    """Region proposal network over FPN levels (reference rpn.py:533)."""

    in_channels: int = 256
    num_anchors: int = 3
    pre_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 1000
    post_nms_topk: int = 512
    nms_thresh: float = 0.7
    strides: Sequence[int] = (4, 8, 16, 32, 64)
    anchor_sizes: Sequence[Sequence[float]] = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array], image_sizes: Array, train: bool):
        """Returns (proposals [B, R, 4], proposal_logits [B, R], anchors, raw outputs)."""
        conv = nn.Conv(self.in_channels, (3, 3), padding="SAME", dtype=self.dtype, name="conv")
        obj_head = nn.Conv(self.num_anchors, (1, 1), dtype=self.dtype, name="objectness")
        box_head = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype, name="anchor_deltas")

        logits_all, deltas_all, anchors_all = [], [], []
        for lvl, f in enumerate(features):
            t = nn.relu(conv(f))
            logits_all.append(obj_head(t).reshape(f.shape[0], -1))
            deltas_all.append(box_head(t).reshape(f.shape[0], -1, 4))
            cell = generate_cell_anchors(self.anchor_sizes[lvl], self.aspect_ratios)
            anchors_all.append(anchors_for_level(f.shape[1], f.shape[2], self.strides[lvl], cell))
        logits = jnp.concatenate(logits_all, 1).astype(jnp.float32)      # [B, N]
        deltas = jnp.concatenate(deltas_all, 1).astype(jnp.float32)      # [B, N, 4]
        anchors = jnp.concatenate(anchors_all, 0)                         # [N, 4]

        box2box = Box2BoxTransform()
        boxes = box2box.apply_deltas(deltas, anchors[None])              # [B, N, 4]
        pre_k = min(self.pre_nms_topk_train if train else self.pre_nms_topk_test,
                    logits.shape[1])

        def per_image(lg, bx, hw):
            topv, topi = jax.lax.top_k(lg, pre_k)
            cand = clip_boxes(bx[topi], (hw[0], hw[1]))
            keep = nms_mask(cand, topv, self.nms_thresh)
            sc = jnp.where(keep, topv, -jnp.inf)
            outv, outi = jax.lax.top_k(sc, self.post_nms_topk)
            return cand[outi], outv

        proposals, prop_logits = jax.vmap(per_image)(logits, boxes, image_sizes)
        return proposals, prop_logits, anchors, logits, deltas

    @staticmethod
    def losses(logits, deltas, anchors, targets: DetTargets,
               pos_fraction: float = 0.5, batch_per_image: int = 256, rng=None):
        """Objectness BCE + smooth-L1 on sampled anchors (reference rpn losses)."""
        def match_one(gt_boxes, gt_valid):
            return iou_matcher(gt_boxes, gt_valid, anchors, thresholds=(0.3, 0.7))

        matched_idx, labels = jax.vmap(match_one)(targets.boxes, targets.valid)
        fg = labels == 1
        bg = labels == 0
        # randomized-priority subsampling (fixed shapes): take top `k` of
        # uniform-random priorities within each class
        if rng is None:
            rng = jax.random.PRNGKey(0)
        pri = jax.random.uniform(rng, fg.shape)
        n_pos = int(batch_per_image * pos_fraction)
        fg_pri = jnp.where(fg, pri, -1.0)
        bg_pri = jnp.where(bg, pri, -1.0)
        fg_sel = jax.vmap(lambda p: jax.lax.top_k(p, n_pos)[1])(fg_pri)
        bg_sel = jax.vmap(lambda p: jax.lax.top_k(p, batch_per_image - n_pos)[1])(bg_pri)
        fg_mask = jnp.take_along_axis(fg, fg_sel, axis=1)
        bg_mask = jnp.take_along_axis(bg, bg_sel, axis=1)

        lg_fg = jnp.take_along_axis(logits, fg_sel, axis=1)
        lg_bg = jnp.take_along_axis(logits, bg_sel, axis=1)
        obj_loss = (
            jnp.sum(sigmoid_bce_with_logits(lg_fg, jnp.ones_like(lg_fg)) * fg_mask)
            + jnp.sum(sigmoid_bce_with_logits(lg_bg, jnp.zeros_like(lg_bg)) * bg_mask)
        )
        gt_boxes = jnp.take_along_axis(targets.boxes, matched_idx[..., None], axis=1)
        gt_deltas = Box2BoxTransform().get_deltas(anchors[None], gt_boxes)
        gt_deltas_fg = jnp.take_along_axis(gt_deltas, fg_sel[..., None], axis=1)
        deltas_fg = jnp.take_along_axis(deltas, fg_sel[..., None], axis=1)
        diff = jnp.abs(deltas_fg - gt_deltas_fg)
        loc_loss = jnp.sum(diff.sum(-1) * fg_mask)
        # reference rpn.py:421-426 normalizes BOTH losses by
        # batch_size_per_image * num_images (not by the sampled/fg count)
        norm = float(batch_per_image) * fg.shape[0]
        return {
            "loss_rpn_cls": obj_loss / norm,
            "loss_rpn_loc": loc_loss / norm,
        }


def assign_fpn_levels(rois: Array, k0: int = 4, kmin: int = 2, kmax: int = 5) -> Array:
    """Per-ROI FPN level (reference poolers.py:22 assign_boxes_to_levels)."""
    w = rois[..., 2] - rois[..., 0]
    h = rois[..., 3] - rois[..., 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(k0 + jnp.log2(scale / 224.0 + 1e-8))
    return jnp.clip(lvl, kmin, kmax).astype(jnp.int32)


class StandardROIHeads(nn.Module):
    """Box (+ optional mask) ROI heads (reference roi_heads.py:877)."""

    num_classes: int = 80
    pooler_size: int = 7
    fc_dim: int = 1024
    pooler_levels: Tuple[int, int] = (2, 5)   # p2..p5
    mask_on: bool = False
    keypoint_on: bool = False
    num_keypoints: int = 17
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, Array], rois: Array) -> Dict[str, Array]:
        """features: {'p2'..'p5': [B,H,W,C]}; rois: [B, R, 4] absolute xyxy.

        Returns class logits [B, R, C+1], box deltas [B, R, C*4] (+ mask logits).
        """
        b, r, _ = rois.shape
        lvl = assign_fpn_levels(rois, kmin=self.pooler_levels[0], kmax=self.pooler_levels[1])
        batch_col = jnp.broadcast_to(jnp.arange(b)[:, None], (b, r)).reshape(-1, 1)
        flat_rois = jnp.concatenate([batch_col.astype(jnp.float32), rois.reshape(-1, 4)], 1)

        pooled = 0.0
        for level in range(self.pooler_levels[0], self.pooler_levels[1] + 1):
            f = features[f"p{level}"]
            p = roi_align(f, flat_rois, (self.pooler_size, self.pooler_size),
                          spatial_scale=1.0 / (2**level), sampling_ratio=2)
            w = (lvl.reshape(-1) == level).astype(p.dtype)[:, None, None, None]
            pooled = pooled + p * w                       # [B*R, s, s, C]

        x = pooled.reshape(b * r, -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls_score")(x)
        box_deltas = nn.Dense(self.num_classes * 4, dtype=self.dtype, name="bbox_pred")(x)
        out = {
            "cls_logits": cls_logits.reshape(b, r, -1).astype(jnp.float32),
            "box_deltas": box_deltas.reshape(b, r, -1).astype(jnp.float32),
        }
        if self.mask_on:
            m = pooled
            for i in range(4):
                m = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                                    name=f"mask_fcn{i+1}")(m))
            m = nn.relu(nn.ConvTranspose(256, (2, 2), strides=(2, 2), dtype=self.dtype,
                                         name="mask_deconv")(m))
            m = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="mask_pred")(m)
            out["mask_logits"] = m.reshape(b, r, *m.shape[1:]).astype(jnp.float32)
        if self.keypoint_on:
            from .roi_heads_extra import KRCNNConvDeconvUpsampleHead

            kp = KRCNNConvDeconvUpsampleHead(
                num_keypoints=self.num_keypoints, conv_dims=(256,) * 4,
                dtype=self.dtype, name="keypoint_head",
            )(pooled)                                   # [B*R, 4s, 4s, K]
            out["keypoint_logits"] = kp.reshape(b, r, *kp.shape[1:])
        return out


class GeneralizedRCNN(nn.Module):
    num_classes: int = 80
    backbone_depth: int = 50
    fpn_channels: int = 256
    proposals_per_image: int = 512
    roi_batch_per_image: int = 128
    roi_pos_fraction: float = 0.25
    mask_on: bool = False
    keypoint_on: bool = False
    num_keypoints: int = 17
    test_score_thresh: float = 0.05
    test_nms_thresh: float = 0.5
    max_detections: int = 100
    cascade_on: bool = False  # ROI_HEADS.NAME == "CascadeROIHeads"
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.backbone_depth,
                               out_features=("res2", "res3", "res4", "res5"),
                               dtype=self.dtype, name="backbone")
        self.fpn = FPN(in_features=("res2", "res3", "res4", "res5"),
                       out_channels=self.fpn_channels, top_block="maxpool",
                       dtype=self.dtype, name="fpn")
        self.rpn = RPN(in_channels=self.fpn_channels,
                       post_nms_topk=self.proposals_per_image,
                       strides=(4, 8, 16, 32, 64), dtype=self.dtype, name="rpn")
        if self.cascade_on:
            # multi-stage refinement heads (reference cascade_rcnn.py:29);
            # box-only — the reference's cascade mask branch pools on the
            # last stage's boxes, which inference_masks_on_boxes covers
            assert not (self.mask_on or self.keypoint_on), (
                "CascadeROIHeads here is box-only; use inference_masks_on_boxes "
                "for mask-on-final-boxes flows")
            from .cascade_rcnn import CascadeROIHeads

            self.roi_heads = CascadeROIHeads(
                num_classes=self.num_classes,
                batch_per_image=self.roi_batch_per_image,
                pos_fraction=self.roi_pos_fraction,
                dtype=self.dtype, name="roi_heads")
        else:
            self.roi_heads = StandardROIHeads(num_classes=self.num_classes,
                                              mask_on=self.mask_on,
                                              keypoint_on=self.keypoint_on,
                                              num_keypoints=self.num_keypoints,
                                              dtype=self.dtype,
                                              name="roi_heads")
        self.box2box = Box2BoxTransform(weights=(10.0, 10.0, 5.0, 5.0))

    def _features(self, images):
        return self.fpn(self.backbone(images))

    def __call__(self, images: Array, image_sizes: Array, targets: DetTargets,
                 train: bool = True, rng_key=None, gt_masks: Array = None,
                 gt_keypoints: Array = None) -> Dict[str, Array]:
        """gt_masks (required when ``mask_on``): [B, K, H, W] float bitmasks;
        gt_keypoints (required when ``keypoint_on``): [B, K, num_kp, 3]
        absolute (x, y, vis) — both aligned with ``targets`` slots."""
        feats = self._features(images)
        return self.losses_on_features(feats, image_sizes, targets, train,
                                       rng_key, gt_masks, gt_keypoints)

    def losses_on_features(self, feats: Dict[str, Array], image_sizes: Array,
                           targets: DetTargets, train: bool = True, rng_key=None,
                           gt_masks: Array = None, gt_keypoints: Array = None) -> Dict[str, Array]:
        """Training losses given precomputed FPN features (lets PanopticFPN share
        one backbone pass between the instance and semantic branches)."""
        fpn_list = [feats[f"p{i}"] for i in range(2, 7)]
        proposals, _, anchors, rpn_logits, rpn_deltas = self.rpn(fpn_list, image_sizes, train)
        losses = RPN.losses(rpn_logits, rpn_deltas, anchors, targets,
                            rng=rng_key if rng_key is not None else jax.random.PRNGKey(0))

        if self.cascade_on:
            losses.update(self.roi_heads(
                feats, proposals, image_sizes, targets, train=True,
                rng_key=rng_key if rng_key is not None else jax.random.PRNGKey(1)))
            return losses

        # sample a fixed ROI batch: proposals + gt boxes, matched by IoU
        b = proposals.shape[0]
        rois = jnp.concatenate([proposals, targets.boxes], axis=1)

        def match_one(gt_boxes, gt_valid, r):
            return iou_matcher(gt_boxes, gt_valid, r, thresholds=(0.5, 0.5),
                               allow_low_quality_matches=False)

        matched_idx, labels = jax.vmap(match_one)(targets.boxes, targets.valid, rois)
        fg = labels == 1
        bg = labels == 0
        key = rng_key if rng_key is not None else jax.random.PRNGKey(1)
        pri = jax.random.uniform(jax.random.fold_in(key, 7), fg.shape)
        n_pos = int(self.roi_batch_per_image * self.roi_pos_fraction)
        fg_sel = jax.vmap(lambda p: jax.lax.top_k(p, n_pos)[1])(jnp.where(fg, pri, -1.0))
        bg_sel = jax.vmap(lambda p: jax.lax.top_k(p, self.roi_batch_per_image - n_pos)[1])(
            jnp.where(bg, pri, -1.0)
        )
        sel = jnp.concatenate([fg_sel, bg_sel], axis=1)                   # [B, Rb]
        sel_fg = jnp.concatenate(
            [jnp.take_along_axis(fg, fg_sel, 1), jnp.zeros_like(jnp.take_along_axis(bg, bg_sel, 1))],
            axis=1,
        )
        sel_valid = jnp.concatenate(
            [jnp.take_along_axis(fg, fg_sel, 1), jnp.take_along_axis(bg, bg_sel, 1)], axis=1
        )
        sel_rois = jnp.take_along_axis(rois, sel[..., None], axis=1)
        sel_gt_idx = jnp.take_along_axis(matched_idx, sel, axis=1)

        head_out = self.roi_heads(feats, sel_rois)
        gt_cls = jnp.take_along_axis(targets.labels, sel_gt_idx, axis=1)
        target_cls = jnp.where(sel_fg, gt_cls, self.num_classes)  # bg = last class
        ce = -jax.nn.log_softmax(head_out["cls_logits"], -1)
        cls_loss = jnp.take_along_axis(ce, target_cls[..., None], -1)[..., 0]
        n_valid = jnp.maximum(jnp.sum(sel_valid), 1.0)
        losses["loss_cls"] = jnp.sum(cls_loss * sel_valid) / n_valid

        gt_boxes = jnp.take_along_axis(targets.boxes, sel_gt_idx[..., None], axis=1)
        gt_deltas = self.box2box.get_deltas(sel_rois, gt_boxes)
        box_deltas = head_out["box_deltas"].reshape(b, -1, self.num_classes, 4)
        pred_deltas = jnp.take_along_axis(
            box_deltas, jnp.clip(target_cls, 0, self.num_classes - 1)[..., None, None], axis=2
        )[:, :, 0]
        diff = jnp.abs(pred_deltas - gt_deltas)
        losses["loss_box_reg"] = jnp.sum(diff.sum(-1) * sel_fg) / jnp.maximum(jnp.sum(sel_fg), 1.0)

        if self.mask_on:
            assert gt_masks is not None, "mask_on=True requires gt_masks"
            # Crop each fg ROI's matched GT bitmask to the mask-head output size
            # (reference mask_head.py:30 mask_rcnn_loss crop_and_resize): treat
            # the [B*K, H, W, 1] mask stack as a feature batch and roi_align with
            # batch index b*K + matched_gt_idx, so every ROI pools exactly its
            # matched instance.
            from ..ops.roi_align import roi_align_per_item

            k = gt_masks.shape[1]
            rb = sel_rois.shape[1]
            m_size = head_out["mask_logits"].shape[2]          # 2 * pooler_size
            mask_bank = gt_masks.reshape(-1, *gt_masks.shape[2:])  # [B*K, H, W]
            flat_idx = (jnp.arange(b)[:, None] * k + sel_gt_idx).reshape(-1)
            gt_crop = roi_align_per_item(
                mask_bank, sel_rois.reshape(-1, 4), flat_idx, (m_size, m_size),
                spatial_scale=1.0, sampling_ratio=2)
            gt_crop = (gt_crop.reshape(b, rb, m_size, m_size) > 0.5).astype(jnp.float32)
            # per-ROI logits of the GT class channel
            cls_ch = jnp.clip(gt_cls, 0, self.num_classes - 1)
            m_logits = jnp.take_along_axis(
                head_out["mask_logits"], cls_ch[:, :, None, None, None], axis=-1
            )[..., 0]                                           # [B, Rb, m, m]
            per_roi = sigmoid_bce_with_logits(m_logits, gt_crop).mean((-2, -1))
            losses["loss_mask"] = jnp.sum(per_roi * sel_fg) / jnp.maximum(jnp.sum(sel_fg), 1.0)

        if self.keypoint_on:
            assert gt_keypoints is not None, "keypoint_on=True requires gt_keypoints"
            from .roi_heads_extra import keypoint_rcnn_loss

            # gather each selected ROI's matched instance keypoints [B, Rb, Kp, 3]
            sel_kps = jnp.take_along_axis(
                gt_keypoints, sel_gt_idx[..., None, None], axis=1
            )
            rb = sel_rois.shape[1]
            losses["loss_keypoint"] = keypoint_rcnn_loss(
                head_out["keypoint_logits"].reshape(
                    b * rb, *head_out["keypoint_logits"].shape[2:]
                ),
                sel_kps.reshape(b * rb, *sel_kps.shape[2:]),
                sel_rois.reshape(b * rb, 4),
                sel_fg.reshape(b * rb),
            )
        return losses

    def inference(self, images: Array, image_sizes: Array) -> Dict[str, Array]:
        feats = self._features(images)
        return self.inference_on_features(feats, image_sizes)

    def inference_on_features(self, feats: Dict[str, Array], image_sizes: Array) -> Dict[str, Array]:
        fpn_list = [feats[f"p{i}"] for i in range(2, 7)]
        proposals, _, _, _, _ = self.rpn(fpn_list, image_sizes, train=False)

        if self.cascade_on:
            # stage-ensembled scores + last-stage boxes (reference
            # cascade_rcnn.py:238 predict_probs averaging), then the same
            # fixed-shape per-class NMS as the standard path but with the
            # class-agnostic refined boxes
            casc = self.roi_heads(feats, proposals, image_sizes, train=False)

            def per_image_cascade(boxes_r, scores_rc, hw):
                r, c = scores_rc.shape
                k = min(4 * self.max_detections, r * c)
                top_sc, top_idx = jax.lax.top_k(scores_rc.reshape(-1), k)
                pi = top_idx // c
                cls = top_idx % c
                boxes = boxes_r[pi]
                valid = top_sc > self.test_score_thresh
                keep = batched_nms_mask(boxes, top_sc, cls,
                                        self.test_nms_thresh, valid=valid)
                sc = jnp.where(keep, top_sc, -1.0)
                outv, outi = jax.lax.top_k(sc, self.max_detections)
                return boxes[outi], outv, cls[outi], outv > 0

            boxes, scores, classes, valid = jax.vmap(per_image_cascade)(
                casc["boxes"], casc["scores"], image_sizes)
            return {"boxes": boxes, "scores": scores, "classes": classes,
                    "valid": valid}

        head_out = self.roi_heads(feats, proposals)
        b, r = proposals.shape[:2]
        probs = jax.nn.softmax(head_out["cls_logits"], -1)[..., :-1]       # [B, R, C]
        box_deltas = head_out["box_deltas"].reshape(b, r, self.num_classes, 4)

        def per_image(prop, pr, bd, hw):
            # fast_rcnn_inference semantics (reference fast_rcnn.py:462):
            # every (proposal, class) pair is an independent candidate —
            # fixed-shape version keeps the top 4*max_detections candidates
            # of the flattened R*C score matrix before per-class NMS.
            r, c = pr.shape
            k = min(4 * self.max_detections, r * c)
            top_sc, top_idx = jax.lax.top_k(pr.reshape(-1), k)
            pi = top_idx // c
            cls = top_idx % c
            deltas = bd[pi, cls]                                   # [k, 4]
            boxes = clip_boxes(
                self.box2box.apply_deltas(deltas, prop[pi]), (hw[0], hw[1])
            )
            valid = top_sc > self.test_score_thresh
            keep = batched_nms_mask(boxes, top_sc, cls, self.test_nms_thresh, valid=valid)
            sc = jnp.where(keep, top_sc, -1.0)
            outv, outi = jax.lax.top_k(sc, self.max_detections)
            return boxes[outi], outv, cls[outi], outv > 0, pi[outi]

        boxes, scores, classes, valid, det_idx = jax.vmap(per_image)(
            proposals, probs, box_deltas, image_sizes
        )
        out = {"boxes": boxes, "scores": scores, "classes": classes, "valid": valid}
        if self.mask_on:
            # gather mask logits of the kept detections, predicted-class channel
            ml = head_out["mask_logits"]                      # [B, R, m, m, C]
            det_ml = jnp.take_along_axis(
                ml, det_idx[:, :, None, None, None], axis=1
            )
            det_ml = jnp.take_along_axis(
                det_ml, jnp.clip(classes, 0, self.num_classes - 1)[:, :, None, None, None],
                axis=-1,
            )[..., 0]
            out["mask_probs"] = jax.nn.sigmoid(det_ml)        # [B, D, m, m]
        if self.keypoint_on:
            from .roi_heads_extra import keypoint_rcnn_inference

            kl = head_out["keypoint_logits"]                  # [B, R, S, S, Kp]
            det_kl = jnp.take_along_axis(
                kl, det_idx[:, :, None, None, None], axis=1
            )
            det_boxes = out["boxes"]
            d = det_boxes.shape[1]
            out["keypoints"] = jax.vmap(keypoint_rcnn_inference)(
                det_kl, det_boxes
            )                                                  # [B, D, Kp, 3]
        return out


    def inference_masks_on_boxes(
        self, images: Array, boxes: Array, classes: Array
    ) -> Array:
        """Run only the mask branch on GIVEN detection boxes.

        The second TTA pass (reference test_time_augmentation.py:229-233
        _batch_inference with detected_instances) re-runs the mask head on the
        merged boxes in each augmented frame. boxes: [B, D, 4] xyxy in this
        image's coordinates; classes: [B, D]. Returns mask probs [B, D, m, m].
        """
        feats = self._features(images)
        head_out = self.roi_heads(feats, boxes)
        ml = head_out["mask_logits"]  # [B, D, m, m, C]
        sel = jnp.take_along_axis(
            ml, jnp.clip(classes, 0, self.num_classes - 1)[:, :, None, None, None],
            axis=-1,
        )[..., 0]
        return jax.nn.sigmoid(sel)


class ProposalNetwork(nn.Module):
    """Backbone + RPN only (reference meta_arch/rcnn.py:247 ProposalNetwork):
    trains/evaluates region proposals without ROI heads."""

    backbone_depth: int = 50
    fpn_channels: int = 256
    proposals_per_image: int = 512
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.backbone_depth,
                               out_features=("res2", "res3", "res4", "res5"),
                               dtype=self.dtype, name="backbone")
        self.fpn = FPN(in_features=("res2", "res3", "res4", "res5"),
                       out_channels=self.fpn_channels, top_block="maxpool",
                       dtype=self.dtype, name="fpn")
        self.rpn = RPN(in_channels=self.fpn_channels,
                       post_nms_topk=self.proposals_per_image,
                       strides=(4, 8, 16, 32, 64), dtype=self.dtype, name="rpn")

    def __call__(self, images: Array, image_sizes: Array, targets: DetTargets = None,
                 train: bool = True, rng_key=None):
        feats = self.fpn(self.backbone(images))
        fpn_list = [feats[f"p{i}"] for i in range(2, 7)]
        proposals, logits, anchors, rpn_logits, rpn_deltas = self.rpn(
            fpn_list, image_sizes, train
        )
        if train:
            return RPN.losses(rpn_logits, rpn_deltas, anchors, targets,
                              rng=rng_key if rng_key is not None else jax.random.PRNGKey(0))
        return {"proposal_boxes": proposals, "objectness_logits": logits}


class PanopticFPN(GeneralizedRCNN):
    """Instance branch (Mask R-CNN) + semantic branch over one shared FPN
    (reference meta_arch/panoptic_fpn.py:21). Inference returns detections,
    per-detection mask probs, and the sem-seg argmax; host-side fusion is
    ``semantic_seg.combine_semantic_and_instance_outputs``."""

    sem_seg_classes: int = 54
    sem_seg_ignore_value: int = 255
    sem_seg_loss_weight: float = 0.5

    def setup(self):
        super().setup()
        from .semantic_seg import SemSegFPNHead

        self.sem_seg_head = SemSegFPNHead(num_classes=self.sem_seg_classes,
                                          dtype=self.dtype, name="sem_seg_head")

    def __call__(self, images: Array, image_sizes: Array, targets: DetTargets,
                 sem_seg_gt: Array = None, train: bool = True, rng_key=None,
                 gt_masks: Array = None) -> Dict[str, Array]:
        """sem_seg_gt: [B, H/4, W/4] int labels (ignore_value = void)."""
        feats = self._features(images)
        losses = self.losses_on_features(feats, image_sizes, targets, train,
                                         rng_key, gt_masks)
        sem_logits = self.sem_seg_head(feats)
        if sem_seg_gt is not None:
            valid = sem_seg_gt != self.sem_seg_ignore_value
            gt = jnp.where(valid, sem_seg_gt, 0)
            logp = jax.nn.log_softmax(sem_logits, -1)
            ce = -jnp.take_along_axis(logp, gt[..., None], -1)[..., 0]
            losses["loss_sem_seg"] = (
                self.sem_seg_loss_weight
                * jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
            )
        return losses

    def inference(self, images: Array, image_sizes: Array) -> Dict[str, Array]:
        feats = self._features(images)
        out = self.inference_on_features(feats, image_sizes)
        out["sem_seg"] = jnp.argmax(self.sem_seg_head(feats), axis=-1)  # [B, H/4, W/4]
        return out
