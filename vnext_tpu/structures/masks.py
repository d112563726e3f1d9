"""Mask containers (reference surface: detectron2/structures/masks.py:88,259).

``BitMasks`` stores dense (N, H, W) bool masks; polygon rasterization converts the
COCO/YTVIS polygon annotation format to bitmasks on the host (numpy) during data
loading, so everything on device is fixed-shape dense.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def polygons_to_bitmask(polygons: Sequence[np.ndarray], height: int, width: int) -> np.ndarray:
    """Rasterize COCO-style polygons ([x0,y0,x1,y1,...] lists) into a bool mask.

    Pure numpy/PIL scanline implementation (no pycocotools dependency); matches the
    semantics of the reference's polygons_to_bitmask (structures/masks.py:18).
    """
    from PIL import Image, ImageDraw

    if len(polygons) == 0:
        return np.zeros((height, width), dtype=bool)
    img = Image.new("L", (width, height), 0)
    draw = ImageDraw.Draw(img)
    for p in polygons:
        p = np.asarray(p, dtype=np.float64).reshape(-1, 2)
        if len(p) < 3:
            continue
        draw.polygon([tuple(xy) for xy in p], outline=1, fill=1)
    return np.array(img, dtype=bool)


@jax.tree_util.register_pytree_node_class
class BitMasks:
    """Dense (N, H, W) bool/float masks as a pytree."""

    def __init__(self, tensor: Array):
        tensor = jnp.asarray(tensor)
        if tensor.ndim != 3:
            raise ValueError(f"BitMasks tensor must be (N, H, W), got {tensor.shape}")
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    @property
    def image_size(self) -> Tuple[int, int]:
        return self.tensor.shape[1:]

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "BitMasks":
        t = self.tensor[item]
        if t.ndim == 2:
            t = t[None]
        return BitMasks(t)

    def nonempty(self) -> Array:
        return jnp.any(self.tensor.reshape(self.tensor.shape[0], -1), axis=-1)

    def get_bounding_boxes(self) -> Array:
        """Tight xyxy boxes around each mask; empty masks produce zero boxes."""
        masks = self.tensor.astype(jnp.bool_)
        n, h, w = masks.shape
        any_col = jnp.any(masks, axis=1)  # [N, W]
        any_row = jnp.any(masks, axis=2)  # [N, H]
        xs = jnp.arange(w)
        ys = jnp.arange(h)
        big = jnp.iinfo(jnp.int32).max
        x1 = jnp.min(jnp.where(any_col, xs[None], big), axis=1)
        x2 = jnp.max(jnp.where(any_col, xs[None] + 1, 0), axis=1)
        y1 = jnp.min(jnp.where(any_row, ys[None], big), axis=1)
        y2 = jnp.max(jnp.where(any_row, ys[None] + 1, 0), axis=1)
        empty = ~jnp.any(any_col, axis=1)
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.float32)
        return jnp.where(empty[:, None], 0.0, boxes)

    @staticmethod
    def cat(masks_list: List["BitMasks"]) -> "BitMasks":
        return BitMasks(jnp.concatenate([m.tensor for m in masks_list], axis=0))

    def __repr__(self) -> str:
        return f"BitMasks(shape={self.tensor.shape}, dtype={self.tensor.dtype})"


def mask_iou_pairwise(masks1: Array, masks2: Array, eps: float = 1e-6) -> Array:
    """[N, M] IoU between two stacks of binary masks (used by trackers/mask-NMS).

    Matches the semantics of idol/models/tracker.py:17 (mask_iou).
    """
    m1 = masks1.reshape(masks1.shape[0], -1).astype(jnp.float32)
    m2 = masks2.reshape(masks2.shape[0], -1).astype(jnp.float32)
    inter = m1 @ m2.T
    area1 = m1.sum(-1)[:, None]
    area2 = m2.sum(-1)[None, :]
    union = area1 + area2 - inter
    return (inter + eps) / (union + eps)
