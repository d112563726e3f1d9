"""Test-time augmentation for detectors.

Capability parity with detectron2/modeling/test_time_augmentation.py:307
(GeneralizedRCNNWithTTA): run inference over multi-scale + horizontal-flip
variants, map detections back to the original frame, merge with NMS. Written as
a generic wrapper over any model exposing a padded-detections ``inference``
(RetinaNet / FCOS here; extendable to ROI heads).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolate import resize_bilinear
from ..ops.nms import batched_nms_mask

Array = jnp.ndarray


class DetectorWithTTA:
    def __init__(
        self,
        infer_fn: Callable[[Array], Dict[str, Array]],
        min_sizes: Sequence[int] = (400, 500, 600),
        flip: bool = True,
        nms_thresh: float = 0.5,
        max_detections: int = 100,
    ):
        """infer_fn: images [B, H, W, 3] -> {boxes [B, N, 4], scores, classes, valid}."""
        self._infer = infer_fn
        self.min_sizes = list(min_sizes)
        self.flip = flip
        self.nms_thresh = nms_thresh
        self.max_detections = max_detections

    def _augmented_batches(self, images: Array):
        """Yields (augmented images, inverse-transform fn for boxes)."""
        b, h, w, _ = images.shape
        for short in self.min_sizes:
            scale = short / min(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            resized = resize_bilinear(images.transpose(0, 3, 1, 2), nh, nw).transpose(0, 2, 3, 1)
            sx, sy = w / nw, h / nh

            def unmap(boxes, sx=sx, sy=sy):
                return boxes * jnp.asarray([sx, sy, sx, sy])

            yield resized, unmap
            if self.flip:
                flipped = resized[:, :, ::-1]

                def unmap_flip(boxes, sx=sx, sy=sy, nw=nw):
                    x1 = (nw - boxes[..., 2]) * sx
                    x2 = (nw - boxes[..., 0]) * sx
                    return jnp.stack([x1, boxes[..., 1] * sy, x2, boxes[..., 3] * sy], -1)

                yield flipped, unmap_flip

    def __call__(self, images: Array) -> Dict[str, Array]:
        all_boxes, all_scores, all_classes, all_valid = [], [], [], []
        for aug, unmap in self._augmented_batches(images):
            out = self._infer(aug)
            all_boxes.append(unmap(out["boxes"]))
            all_scores.append(out["scores"])
            all_classes.append(out["classes"])
            all_valid.append(out["valid"])
        boxes = jnp.concatenate(all_boxes, axis=1)
        scores = jnp.concatenate(all_scores, axis=1)
        classes = jnp.concatenate(all_classes, axis=1)
        valid = jnp.concatenate(all_valid, axis=1)

        def merge(bx, sc, cl, va):
            keep = batched_nms_mask(bx, sc, cl, self.nms_thresh, valid=va)
            s = jnp.where(keep, sc, -1.0)
            outv, outi = jax.lax.top_k(s, self.max_detections)
            return bx[outi], outv, cl[outi], outv > 0

        b, s, c, v = jax.vmap(merge)(boxes, scores, classes, valid)
        return {"boxes": b, "scores": s, "classes": c, "valid": v}


class GeneralizedRCNNWithTTA(DetectorWithTTA):
    """Full R-CNN TTA (reference test_time_augmentation.py:101):

    1. detect boxes in every scale/flip variant, map them back to the original
       frame, and merge the union with class-aware NMS (inherited);
    2. map the MERGED boxes into each augmented frame, re-run only the mask
       head there (:229 _batch_inference with detected_instances), flip masks
       from flipped variants back (:298 _reduce_pred_masks) and average.
    """

    def __init__(self, model, params, image_sizes, **kwargs):
        self.model = model
        self.params = params
        self.image_sizes = image_sizes

        def infer(images):
            out = model.apply(
                {"params": params}, images,
                self._scaled_sizes(images.shape[1:3]),
                method=type(model).inference,
            )
            return out

        super().__init__(infer, **kwargs)

    def _scaled_sizes(self, hw):
        import jax.numpy as jnp

        return jnp.tile(jnp.asarray([[hw[0], hw[1]]], jnp.int32),
                        (self.image_sizes.shape[0], 1))

    def __call__(self, images: Array) -> Dict[str, Array]:
        merged = super().__call__(images)
        if not getattr(self.model, "mask_on", False):
            return merged

        b, h, w, _ = images.shape
        boxes, classes = merged["boxes"], merged["classes"]
        mask_sum = None
        count = 0
        for aug, unmap, remap in self._augmented_with_remap(images):
            boxes_aug = remap(boxes)
            probs = self.model.apply(
                {"params": self.params}, aug, boxes_aug, classes,
                method=type(self.model).inference_masks_on_boxes,
            )
            if getattr(remap, "flipped", False):
                probs = probs[:, :, :, ::-1]
            mask_sum = probs if mask_sum is None else mask_sum + probs
            count += 1
        merged["mask_probs"] = mask_sum / count
        return merged

    def _augmented_with_remap(self, images: Array):
        """Like _augmented_batches but also yields the forward box map
        (original frame -> augmented frame), used to transplant merged boxes."""
        b, h, w, _ = images.shape
        for short in self.min_sizes:
            scale = short / min(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            resized = resize_bilinear(
                images.transpose(0, 3, 1, 2), nh, nw
            ).transpose(0, 2, 3, 1)
            fx, fy = nw / w, nh / h

            def remap(boxes, fx=fx, fy=fy):
                return boxes * jnp.asarray([fx, fy, fx, fy])

            remap.flipped = False
            yield resized, None, remap
            if self.flip:
                def remap_flip(boxes, fx=fx, fy=fy, nw=nw):
                    x1 = nw - boxes[..., 2] * fx
                    x2 = nw - boxes[..., 0] * fx
                    return jnp.stack(
                        [x1, boxes[..., 1] * fy, x2, boxes[..., 3] * fy], -1
                    )

                remap_flip.flipped = True
                yield resized[:, :, ::-1], None, remap_flip
