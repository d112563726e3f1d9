"""Cascade R-CNN ROI heads (capability parity with
detectron2/modeling/roi_heads/cascade_rcnn.py:29 CascadeROIHeads).

Three box stages with increasing foreground-IoU thresholds; each stage
re-matches the (refined) proposals against GT at its own threshold and applies
class-agnostic box regression with progressively tighter delta weights. At
inference the per-stage class scores (each head scoring its own stage's boxes)
are averaged and the last stage's boxes are used — the reference's ensembling
scheme (cascade_rcnn.py:238 _run_stage / predict_probs averaging).

TPU-first shape discipline: proposals stay in fixed-capacity [B, R, 4] slots
through every stage; per-stage matching is a dense IoU argmax (no list ops),
and the fg/bg subsample is the same randomized-priority top-k trick as
StandardROIHeads.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import roi_align
from ..structures.boxes import clip_boxes
from .dense_heads import Box2BoxTransform, iou_matcher
from .rcnn import assign_fpn_levels
from .retinanet import DetTargets

Array = jnp.ndarray


class _CascadeBoxHead(nn.Module):
    """One stage's 2-fc box head: class logits + class-agnostic deltas."""

    num_classes: int
    fc_dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled: Array) -> Tuple[Array, Array]:
        x = pooled.reshape(pooled.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, dtype=self.dtype, name="fc2")(x))
        cls_logits = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls_score")(x)
        deltas = nn.Dense(4, dtype=self.dtype, name="bbox_pred")(x)  # class-agnostic
        return cls_logits.astype(jnp.float32), deltas.astype(jnp.float32)


class CascadeROIHeads(nn.Module):
    """Multi-stage box refinement over FPN features."""

    num_classes: int = 80
    stage_ious: Sequence[float] = (0.5, 0.6, 0.7)
    # reference cascade weights: 10/20/30 on xy, 5/10/15 on wh
    stage_weights: Sequence[Tuple[float, float, float, float]] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )
    pooler_size: int = 7
    fc_dim: int = 1024
    pooler_levels: Tuple[int, int] = (2, 5)
    batch_per_image: int = 128
    pos_fraction: float = 0.25
    dtype: Any = jnp.float32

    def setup(self):
        self.heads = [
            _CascadeBoxHead(self.num_classes, self.fc_dim, self.dtype, name=f"stage{i}")
            for i in range(len(self.stage_ious))
        ]
        self.transforms = [Box2BoxTransform(w) for w in self.stage_weights]

    def _pool(self, features: Dict[str, Array], rois: Array) -> Array:
        """Multi-level roi_align with per-ROI FPN level weighting → [B*R, s, s, C]."""
        b, r, _ = rois.shape
        lvl = assign_fpn_levels(rois, kmin=self.pooler_levels[0], kmax=self.pooler_levels[1])
        batch_col = jnp.broadcast_to(jnp.arange(b)[:, None], (b, r)).reshape(-1, 1)
        flat = jnp.concatenate([batch_col.astype(jnp.float32), rois.reshape(-1, 4)], 1)
        pooled = 0.0
        for level in range(self.pooler_levels[0], self.pooler_levels[1] + 1):
            p = roi_align(features[f"p{level}"], flat,
                          (self.pooler_size, self.pooler_size),
                          spatial_scale=1.0 / (2**level), sampling_ratio=2)
            w = (lvl.reshape(-1) == level).astype(p.dtype)[:, None, None, None]
            pooled = pooled + p * w
        return pooled

    def __call__(self, features: Dict[str, Array], proposals: Array,
                 image_sizes: Array, targets: DetTargets = None,
                 train: bool = True, rng_key=None) -> Dict[str, Array]:
        if train:
            return self._forward_train(features, proposals, image_sizes, targets, rng_key)
        return self._forward_inference(features, proposals, image_sizes)

    def _subsample(self, labels: Array, rng) -> Tuple[Array, Array, Array]:
        """Randomized-priority fg/bg top-k: returns (sel idx, fg mask, valid mask)."""
        fg = labels == 1
        bg = labels == 0
        pri = jax.random.uniform(rng, fg.shape)
        n_pos = int(self.batch_per_image * self.pos_fraction)
        fg_sel = jax.vmap(lambda p: jax.lax.top_k(p, n_pos)[1])(jnp.where(fg, pri, -1.0))
        bg_sel = jax.vmap(lambda p: jax.lax.top_k(p, self.batch_per_image - n_pos)[1])(
            jnp.where(bg, pri, -1.0)
        )
        sel = jnp.concatenate([fg_sel, bg_sel], axis=1)
        sel_fg = jnp.concatenate(
            [jnp.take_along_axis(fg, fg_sel, 1),
             jnp.zeros_like(jnp.take_along_axis(bg, bg_sel, 1))], axis=1)
        sel_valid = jnp.concatenate(
            [jnp.take_along_axis(fg, fg_sel, 1), jnp.take_along_axis(bg, bg_sel, 1)], axis=1)
        return sel, sel_fg, sel_valid

    def _forward_train(self, features, proposals, image_sizes, targets, rng_key):
        if rng_key is None:
            rng_key = jax.random.PRNGKey(0)
        losses: Dict[str, Array] = {}
        # stage 0 gets gt boxes appended (like StandardROIHeads); later stages
        # work on the refined boxes of the sampled batch
        rois = jnp.concatenate([proposals, targets.boxes], axis=1)
        for k, thr in enumerate(self.stage_ious):
            matched_idx, labels = jax.vmap(
                lambda gb, gv, r, t=thr: iou_matcher(gb, gv, r, thresholds=(t, t),
                                                     allow_low_quality_matches=False)
            )(targets.boxes, targets.valid, rois)
            if k == 0:
                sel, sel_fg, sel_valid = self._subsample(labels, jax.random.fold_in(rng_key, k))
                rois = jnp.take_along_axis(rois, sel[..., None], axis=1)
                matched_idx = jnp.take_along_axis(matched_idx, sel, axis=1)
            else:
                # reference behavior: stages > 0 re-label without re-sampling
                sel_fg = labels == 1
                sel_valid = labels >= 0
            gt_cls = jnp.take_along_axis(targets.labels, matched_idx, axis=1)
            target_cls = jnp.where(sel_fg, gt_cls, self.num_classes)

            pooled = self._pool(features, rois)
            cls_logits, deltas = self.heads[k](pooled)
            b, r = rois.shape[:2]
            cls_logits = cls_logits.reshape(b, r, -1)
            deltas = deltas.reshape(b, r, 4)

            ce = -jax.nn.log_softmax(cls_logits, -1)
            cls_loss = jnp.take_along_axis(ce, target_cls[..., None], -1)[..., 0]
            n_valid = jnp.maximum(jnp.sum(sel_valid), 1.0)
            losses[f"loss_cls_stage{k}"] = jnp.sum(cls_loss * sel_valid) / n_valid

            gt_boxes = jnp.take_along_axis(targets.boxes, matched_idx[..., None], axis=1)
            gt_deltas = self.transforms[k].get_deltas(rois, gt_boxes)
            diff = jnp.abs(deltas - gt_deltas)
            losses[f"loss_box_reg_stage{k}"] = (
                jnp.sum(diff.sum(-1) * sel_fg) / jnp.maximum(jnp.sum(sel_fg), 1.0)
            )
            # refine boxes for the next stage (stop-gradient, like the
            # reference's detached stage handoff)
            refined = self.transforms[k].apply_deltas(jax.lax.stop_gradient(deltas), rois)
            rois = jax.vmap(lambda bx, hw: clip_boxes(bx, (hw[0], hw[1])))(refined, image_sizes)
        return losses

    def _forward_inference(self, features, proposals, image_sizes):
        rois = proposals
        stage_scores: List[Array] = []
        b, r = rois.shape[:2]
        for k in range(len(self.stage_ious)):
            pooled = self._pool(features, rois)
            cls_logits, deltas = self.heads[k](pooled)
            cls_logits = cls_logits.reshape(b, r, -1)
            deltas = deltas.reshape(b, r, 4)
            stage_scores.append(jax.nn.softmax(cls_logits, -1))
            refined = self.transforms[k].apply_deltas(deltas, rois)
            rois = jax.vmap(lambda bx, hw: clip_boxes(bx, (hw[0], hw[1])))(refined, image_sizes)
        scores = sum(stage_scores) / len(stage_scores)              # [B, R, C+1]
        return {"boxes": rois, "scores": scores[..., :-1]}
