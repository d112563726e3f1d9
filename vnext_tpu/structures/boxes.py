"""Box containers and pairwise box ops (jnp, fixed-shape).

Reference surface: detectron2/structures/boxes.py (Boxes, BoxMode:13, pairwise_iou)
and projects/IDOL/idol/util/box_ops.py (cxcywh conversions, generalized_box_iou).
All functions are pure jnp and differentiable where meaningful, so they can be used
inside jit-compiled train steps.
"""

from __future__ import annotations

import enum
import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class BoxMode(enum.IntEnum):
    """Coordinate interpretation of a (..., 4) or (..., 5) box array."""

    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box, from_mode: "BoxMode", to_mode: "BoxMode"):
        """Convert box arrays between modes (reference: structures/boxes.py:13)."""
        if from_mode == to_mode:
            return box
        original_type = type(box)
        arr = jnp.asarray(box, dtype=jnp.float32)

        if from_mode == BoxMode.XYWHA_ABS and to_mode == BoxMode.XYXY_ABS:
            if arr.shape[-1] != 5:
                raise ValueError("XYWHA_ABS boxes must have shape (..., 5)")
            xc, yc, w, h, a = jnp.split(arr, 5, axis=-1)
            theta = a * math.pi / 180.0
            c = jnp.abs(jnp.cos(theta))
            s = jnp.abs(jnp.sin(theta))
            new_w = c * w + s * h
            new_h = c * h + s * w
            out = jnp.concatenate(
                [xc - new_w / 2, yc - new_h / 2, xc + new_w / 2, yc + new_h / 2], axis=-1
            )
        elif from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYWHA_ABS:
            x, y, w, h = jnp.split(arr, 4, axis=-1)
            out = jnp.concatenate([x + w / 2, y + h / 2, w, h, jnp.zeros_like(w)], axis=-1)
        elif to_mode == BoxMode.XYXY_ABS and from_mode == BoxMode.XYWH_ABS:
            x, y, w, h = jnp.split(arr, 4, axis=-1)
            out = jnp.concatenate([x, y, x + w, y + h], axis=-1)
        elif from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            x1, y1, x2, y2 = jnp.split(arr, 4, axis=-1)
            out = jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)
        else:
            raise NotImplementedError(f"Conversion {from_mode} -> {to_mode} not supported")

        if original_type in (list, tuple):
            return original_type(np.asarray(out).tolist())
        return out


def box_cxcywh_to_xyxy(x: Array) -> Array:
    xc, yc, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(x: Array) -> Array:
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(boxes: Array) -> Array:
    """Area of (..., 4) xyxy boxes."""
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0) * jnp.clip(boxes[..., 3] - boxes[..., 1], 0)


def pairwise_intersection(boxes1: Array, boxes2: Array) -> Array:
    """[N, M] intersection areas between two xyxy box sets."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: Array, boxes2: Array, eps: float = 0.0) -> Array:
    """[N, M] IoU between xyxy box sets (reference: structures/boxes.py pairwise_iou)."""
    inter = pairwise_intersection(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, jnp.finfo(jnp.float32).tiny + eps)


# torchvision.ops.box_iou parity alias used by the matcher
box_iou = pairwise_iou


def generalized_box_iou(boxes1: Array, boxes2: Array) -> Array:
    """[N, M] GIoU between xyxy box sets (reference: idol/util/box_ops.py)."""
    iou = pairwise_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    enclosing = wh[..., 0] * wh[..., 1]
    inter = pairwise_intersection(boxes1, boxes2)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    union = area1[:, None] + area2[None, :] - inter
    return iou - (enclosing - union) / jnp.maximum(enclosing, jnp.finfo(jnp.float32).tiny)


def elementwise_giou_loss(boxes1: Array, boxes2: Array) -> Array:
    """Per-pair (aligned) GIoU loss 1 - GIoU for matched boxes, both (..., 4) xyxy."""
    x1 = jnp.maximum(boxes1[..., 0], boxes2[..., 0])
    y1 = jnp.maximum(boxes1[..., 1], boxes2[..., 1])
    x2 = jnp.minimum(boxes1[..., 2], boxes2[..., 2])
    y2 = jnp.minimum(boxes1[..., 3], boxes2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    union = area1 + area2 - inter
    iou = inter / jnp.maximum(union, jnp.finfo(jnp.float32).tiny)
    ex1 = jnp.minimum(boxes1[..., 0], boxes2[..., 0])
    ey1 = jnp.minimum(boxes1[..., 1], boxes2[..., 1])
    ex2 = jnp.maximum(boxes1[..., 2], boxes2[..., 2])
    ey2 = jnp.maximum(boxes1[..., 3], boxes2[..., 3])
    enclosing = jnp.clip(ex2 - ex1, 0) * jnp.clip(ey2 - ey1, 0)
    giou = iou - (enclosing - union) / jnp.maximum(enclosing, jnp.finfo(jnp.float32).tiny)
    return 1.0 - giou


def clip_boxes(boxes: Array, image_size: Tuple[int, int]) -> Array:
    """Clip xyxy boxes to [0, W] x [0, H]; image_size is (H, W)."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_boxes(boxes: Array, threshold: float = 0.0) -> Array:
    """Bool mask of boxes with both sides > threshold."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)


@jax.tree_util.register_pytree_node_class
class Boxes:
    """Thin pytree wrapper over an (N, 4) xyxy array (reference: structures/boxes.py Boxes)."""

    def __init__(self, tensor: Array):
        tensor = jnp.asarray(tensor, dtype=jnp.float32)
        if tensor.ndim != 2 or tensor.shape[-1] != 4:
            raise ValueError(f"Boxes tensor must be (N, 4), got {tensor.shape}")
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def area(self) -> Array:
        return box_area(self.tensor)

    def clip(self, image_size: Tuple[int, int]) -> "Boxes":
        return Boxes(clip_boxes(self.tensor, image_size))

    def nonempty(self, threshold: float = 0.0) -> Array:
        return nonempty_boxes(self.tensor, threshold)

    def get_centers(self) -> Array:
        return (self.tensor[:, :2] + self.tensor[:, 2:]) / 2

    def scale(self, scale_x: float, scale_y: float) -> "Boxes":
        scale = jnp.array([scale_x, scale_y, scale_x, scale_y], dtype=jnp.float32)
        return Boxes(self.tensor * scale)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "Boxes":
        t = self.tensor[item]
        if t.ndim == 1:
            t = t[None]
        return Boxes(t)

    def __repr__(self) -> str:
        return f"Boxes({self.tensor})"

    @classmethod
    def cat(cls, boxes_list) -> "Boxes":
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))


@jax.tree_util.register_pytree_node_class
class RotatedBoxes:
    """(N, 5) (cx, cy, w, h, angle_deg) boxes (reference: structures/rotated_boxes.py)."""

    def __init__(self, tensor: Array):
        tensor = jnp.asarray(tensor, dtype=jnp.float32)
        if tensor.ndim != 2 or tensor.shape[-1] != 5:
            raise ValueError(f"RotatedBoxes tensor must be (N, 5), got {tensor.shape}")
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def area(self) -> Array:
        return self.tensor[:, 2] * self.tensor[:, 3]

    def normalize_angles(self) -> "RotatedBoxes":
        a = (self.tensor[:, 4] + 180.0) % 360.0 - 180.0
        return RotatedBoxes(self.tensor.at[:, 4].set(a))

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "RotatedBoxes":
        t = self.tensor[item]
        if t.ndim == 1:
            t = t[None]
        return RotatedBoxes(t)

    @classmethod
    def cat(cls, boxes_list) -> "RotatedBoxes":
        return cls(jnp.concatenate([b.tensor for b in boxes_list], axis=0))
