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


def polygon_area(x: np.ndarray, y: np.ndarray) -> float:
    """Shoelace-formula polygon area (reference structures/masks.py:16)."""
    return 0.5 * np.abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def rasterize_polygons_within_box(
    polygons: Sequence[np.ndarray], box: np.ndarray, mask_size: int
) -> np.ndarray:
    """Crop+resize polygons to a (mask_size, mask_size) bool mask.

    Mask R-CNN training-target generation; semantics mirror the reference
    (structures/masks.py:39): shift by the box origin, rescale to mask_size with a
    0.1-pixel floor on the box extent, rasterize.
    """
    box = np.asarray(box, dtype=np.float64)
    w, h = box[2] - box[0], box[3] - box[1]
    out = []
    for p in polygons:
        p = np.asarray(p, dtype=np.float64).copy()
        p[0::2] = (p[0::2] - box[0]) * (mask_size / max(w, 0.1))
        p[1::2] = (p[1::2] - box[1]) * (mask_size / max(h, 0.1))
        out.append(p)
    return polygons_to_bitmask(out, mask_size, mask_size)


class PolygonMasks:
    """Per-instance polygon segmentation container (reference structures/masks.py:259).

    Host-side (numpy) by design: polygons are ragged small arrays; rasterization to
    fixed-shape BitMasks happens in the data pipeline before anything touches device.
    ``polygons``: list (instances) of list (components) of float64 [x0,y0,...] arrays.
    """

    def __init__(self, polygons: List[List[np.ndarray]]):
        if not isinstance(polygons, list):
            raise ValueError(f"PolygonMasks expects list[list[ndarray]], got {type(polygons)}")

        def _process(per_instance):
            if not isinstance(per_instance, list):
                raise ValueError(f"Expect a list of polygons per instance, got {type(per_instance)}")
            per_instance = [np.asarray(p, dtype=np.float64).reshape(-1) for p in per_instance]
            for p in per_instance:
                if len(p) % 2 != 0 or len(p) < 6:
                    raise ValueError(f"Cannot create a polygon from {len(p)} coordinates.")
            return per_instance

        self.polygons: List[List[np.ndarray]] = [_process(pi) for pi in polygons]

    def get_bounding_boxes(self) -> np.ndarray:
        """Tight [N, 4] float32 xyxy boxes around each instance's polygons."""
        boxes = np.zeros((len(self.polygons), 4), dtype=np.float32)
        for idx, per_instance in enumerate(self.polygons):
            minxy = np.full(2, np.inf, dtype=np.float32)
            maxxy = np.zeros(2, dtype=np.float32)
            for p in per_instance:
                coords = p.reshape(-1, 2).astype(np.float32)
                minxy = np.minimum(minxy, coords.min(axis=0))
                maxxy = np.maximum(maxxy, coords.max(axis=0))
            boxes[idx, :2] = minxy
            boxes[idx, 2:] = maxxy
        return boxes

    def nonempty(self) -> np.ndarray:
        return np.asarray([len(pi) > 0 for pi in self.polygons], dtype=bool)

    def __getitem__(self, item) -> "PolygonMasks":
        if isinstance(item, int):
            selected = [self.polygons[item]]
        elif isinstance(item, slice):
            selected = self.polygons[item]
        elif isinstance(item, list):
            selected = [self.polygons[i] for i in item]
        else:
            item = np.asarray(item)
            if item.dtype == bool:
                item = np.nonzero(item)[0]
            selected = [self.polygons[int(i)] for i in item.tolist()]
        return PolygonMasks(selected)

    def __iter__(self):
        return iter(self.polygons)

    def __len__(self) -> int:
        return len(self.polygons)

    def __repr__(self) -> str:
        return f"PolygonMasks(num_instances={len(self.polygons)})"

    def crop_and_resize(self, boxes: np.ndarray, mask_size: int) -> np.ndarray:
        """[N, mask_size, mask_size] bool training targets, one per box."""
        boxes = np.asarray(boxes)
        assert len(boxes) == len(self), f"{len(boxes)} != {len(self)}"
        if len(self) == 0:
            return np.zeros((0, mask_size, mask_size), dtype=bool)
        return np.stack(
            [rasterize_polygons_within_box(poly, box, mask_size) for poly, box in zip(self.polygons, boxes)]
        )

    def area(self) -> np.ndarray:
        return np.asarray(
            [sum(polygon_area(p[0::2], p[1::2]) for p in pi) for pi in self.polygons],
            dtype=np.float64,
        )

    @staticmethod
    def cat(polymasks_list: List["PolygonMasks"]) -> "PolygonMasks":
        assert len(polymasks_list) > 0
        out = []
        for pm in polymasks_list:
            out.extend(pm.polygons)
        return PolygonMasks(out)


@jax.tree_util.register_pytree_node_class
class ROIMasks:
    """(N, M, M) per-ROI masks; paste onto boxes to get full-image BitMasks.

    Reference surface: structures/masks.py:464 (ROIMasks.to_bitmasks via
    paste_masks_in_image). Device-resident pytree; the paste is the batched
    fixed-shape op in ops/mask_ops.py.
    """

    def __init__(self, tensor: Array):
        tensor = jnp.asarray(tensor)
        if tensor.ndim != 3:
            raise ValueError("ROIMasks must take a masks of 3 dimension.")
        self.tensor = tensor

    def tree_flatten(self):
        return (self.tensor,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.tensor = children[0]
        return obj

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "ROIMasks":
        t = self.tensor[item]
        if t.ndim != 3:
            raise ValueError(f"Indexing ROIMasks with {item} gives shape {t.shape}")
        return ROIMasks(t)

    def __repr__(self) -> str:
        return f"ROIMasks(num_instances={len(self)})"

    def to_bitmasks(self, boxes: Array, height: int, width: int, threshold: float = 0.5) -> BitMasks:
        from vnext_tpu.ops.mask_ops import paste_masks_in_image

        pasted = paste_masks_in_image(self.tensor, boxes, (height, width), threshold=threshold)
        return BitMasks(pasted)


def _bitmasks_from_polygon_masks(polygon_masks, height: int, width: int) -> BitMasks:
    """BitMasks.from_polygon_masks (reference structures/masks.py:164)."""
    if isinstance(polygon_masks, PolygonMasks):
        polygon_masks = polygon_masks.polygons
    masks = [polygons_to_bitmask(p, height, width) for p in polygon_masks]
    if len(masks) == 0:
        return BitMasks(jnp.zeros((0, height, width), dtype=jnp.bool_))
    return BitMasks(jnp.asarray(np.stack(masks)))


def _bitmasks_from_roi_masks(roi_masks: ROIMasks, boxes: Array, height: int, width: int) -> BitMasks:
    """BitMasks.from_roi_masks (reference structures/masks.py:181)."""
    return roi_masks.to_bitmasks(boxes, height, width)


BitMasks.from_polygon_masks = staticmethod(_bitmasks_from_polygon_masks)
BitMasks.from_roi_masks = staticmethod(_bitmasks_from_roi_masks)


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
