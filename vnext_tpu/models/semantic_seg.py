"""Semantic segmentation head + PanopticFPN (flax, NHWC).

Capability parity with detectron2/modeling/meta_arch/semantic_seg.py:34
(SemanticSegmentor + SemSegFPNHead) and panoptic_fpn.py:21 (PanopticFPN:
instance branch + semantic branch + greedy panoptic fusion).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interpolate import resize_bilinear
from .backbones.fpn import FPN
from .backbones.resnet import ResNet

Array = jnp.ndarray


class SemSegFPNHead(nn.Module):
    """Scale heads summing upsampled FPN levels -> per-pixel class logits."""

    num_classes: int
    in_features: Sequence[str] = ("p2", "p3", "p4", "p5")
    conv_dim: int = 128
    common_stride: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: Dict[str, Array]) -> Array:
        target_h = features[self.in_features[0]].shape[1]
        target_w = features[self.in_features[0]].shape[2]
        summed = 0.0
        for i, name in enumerate(self.in_features):
            x = features[name]
            # conv + GN + relu, then upsample to the finest level
            x = nn.Conv(self.conv_dim, (3, 3), padding="SAME", dtype=self.dtype,
                        name=f"head_{name}_conv")(x)
            x = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"head_{name}_norm")(x))
            if x.shape[1] != target_h or x.shape[2] != target_w:
                x = resize_bilinear(x.transpose(0, 3, 1, 2), target_h, target_w).transpose(0, 2, 3, 1)
            summed = summed + x
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="predictor")(
            summed
        ).astype(jnp.float32)


class SemanticSegmentor(nn.Module):
    """ResNet + FPN + SemSegFPNHead with per-pixel cross entropy."""

    num_classes: int = 54
    backbone_depth: int = 50
    fpn_channels: int = 256
    ignore_value: int = 255
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = ResNet(depth=self.backbone_depth,
                               out_features=("res2", "res3", "res4", "res5"),
                               dtype=self.dtype, name="backbone")
        self.fpn = FPN(in_features=("res2", "res3", "res4", "res5"),
                       out_channels=self.fpn_channels, top_block="none",
                       dtype=self.dtype, name="fpn")
        self.head = SemSegFPNHead(num_classes=self.num_classes, dtype=self.dtype, name="sem_seg_head")

    def logits(self, images: Array) -> Array:
        """[B, H/4, W/4, num_classes] per-pixel logits."""
        return self.head(self.fpn(self.backbone(images)))

    def __call__(self, images: Array, sem_seg_gt: Array, train: bool = True) -> Dict[str, Array]:
        """sem_seg_gt: [B, H/4, W/4] int labels with ignore_value for void."""
        logits = self.logits(images)
        valid = sem_seg_gt != self.ignore_value
        gt = jnp.where(valid, sem_seg_gt, 0)
        logp = jax.nn.log_softmax(logits, -1)
        ce = -jnp.take_along_axis(logp, gt[..., None], -1)[..., 0]
        loss = jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return {"loss_sem_seg": loss}

    def inference(self, images: Array) -> Array:
        return jnp.argmax(self.logits(images), axis=-1)


def combine_semantic_and_instance_outputs(
    sem_seg: np.ndarray,               # [H, W] class ids (stuff+thing trained jointly)
    instance_masks: np.ndarray,        # [N, H, W] bool
    instance_scores: np.ndarray,       # [N]
    instance_classes: np.ndarray,      # [N]
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_score_thresh: float = 0.5,
) -> Tuple[np.ndarray, list]:
    """Greedy panoptic fusion (reference panoptic_fpn.py:118
    combine_semantic_and_instance_outputs): instances by score first, then
    large-enough stuff regions."""
    h, w = sem_seg.shape
    panoptic = np.zeros((h, w), np.int32)
    segments = []
    current_id = 0
    order = np.argsort(-instance_scores)
    for i in order:
        if instance_scores[i] < instances_score_thresh:
            break
        mask = instance_masks[i] & (panoptic == 0)
        orig_area = instance_masks[i].sum()
        if orig_area == 0:
            continue
        if mask.sum() / orig_area < overlap_threshold:
            continue
        current_id += 1
        panoptic[mask] = current_id
        segments.append({"id": current_id, "isthing": True,
                         "score": float(instance_scores[i]),
                         "category_id": int(instance_classes[i])})
    for cls in np.unique(sem_seg):
        mask = (sem_seg == cls) & (panoptic == 0)
        if mask.sum() < stuff_area_limit:
            continue
        current_id += 1
        panoptic[mask] = current_id
        segments.append({"id": current_id, "isthing": False, "category_id": int(cls)})
    return panoptic, segments
