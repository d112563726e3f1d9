"""Frame-to-frame bbox tracker toolkit.

Capability parity with detectron2/tracking/: BaseTracker (base_tracker.py:15),
BBoxIOUTracker (bbox_iou_tracker.py:17 — greedy IoU), HungarianTracker family
(hungarian_tracker.py:16, vanilla_hungarian_bbox_iou_tracker.py:17,
iou_weighted_hungarian_bbox_iou_tracker.py:14). Operates on plain numpy detection
dicts so it composes with any detector's outputs.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from scipy.optimize import linear_sum_assignment


def _pairwise_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None] - inter
    return inter / np.maximum(union, 1e-12)


class BaseTracker:
    """Protocol: update({"boxes": [N,4] xyxy, "classes": [N]}) -> adds "ids": [N]."""

    def __init__(self, track_iou_threshold: float = 0.5, max_lost_frames: int = 30):
        self._iou_thr = track_iou_threshold
        self._max_lost = max_lost_frames
        self._next_id = 0
        self._prev: Optional[Dict] = None
        self._lost: Dict[int, int] = {}

    def reset(self):
        self._next_id = 0
        self._prev = None
        self._lost = {}

    def update(self, instances: Dict) -> Dict:
        raise NotImplementedError

    def _new_id(self) -> int:
        i = self._next_id
        self._next_id += 1
        return i


class BBoxIOUTracker(BaseTracker):
    """Greedy highest-IoU association (reference bbox_iou_tracker.py:17)."""

    def update(self, instances: Dict) -> Dict:
        boxes = np.asarray(instances["boxes"], np.float64).reshape(-1, 4)
        classes = np.asarray(instances.get("classes", np.zeros(len(boxes))), np.int64)
        ids = np.full(len(boxes), -1, np.int64)
        if self._prev is not None and len(self._prev["boxes"]) and len(boxes):
            iou = _pairwise_iou(boxes, self._prev["boxes"])
            same_cls = classes[:, None] == self._prev["classes"][None]
            iou = np.where(same_cls, iou, 0.0)
            order = np.dstack(np.unravel_index(np.argsort(-iou, axis=None), iou.shape))[0]
            used_prev = set()
            for di, pi in order:
                if iou[di, pi] < self._iou_thr:
                    break
                if ids[di] != -1 or pi in used_prev:
                    continue
                ids[di] = self._prev["ids"][pi]
                used_prev.add(pi)
        for i in range(len(boxes)):
            if ids[i] == -1:
                ids[i] = self._new_id()
        self._prev = {"boxes": boxes, "classes": classes, "ids": ids}
        out = dict(instances)
        out["ids"] = ids
        return out


class VanillaHungarianBBoxIOUTracker(BaseTracker):
    """Optimal 1-1 association with cost = 1 - IoU (reference
    vanilla_hungarian_bbox_iou_tracker.py:17)."""

    def _cost(self, iou: np.ndarray) -> np.ndarray:
        return 1.0 - iou

    def update(self, instances: Dict) -> Dict:
        boxes = np.asarray(instances["boxes"], np.float64).reshape(-1, 4)
        classes = np.asarray(instances.get("classes", np.zeros(len(boxes))), np.int64)
        ids = np.full(len(boxes), -1, np.int64)
        if self._prev is not None and len(self._prev["boxes"]) and len(boxes):
            iou = _pairwise_iou(boxes, self._prev["boxes"])
            same_cls = classes[:, None] == self._prev["classes"][None]
            iou = np.where(same_cls, iou, 0.0)
            rows, cols = linear_sum_assignment(self._cost(iou))
            for r, c in zip(rows, cols):
                if iou[r, c] >= self._iou_thr:
                    ids[r] = self._prev["ids"][c]
        for i in range(len(boxes)):
            if ids[i] == -1:
                ids[i] = self._new_id()
        self._prev = {"boxes": boxes, "classes": classes, "ids": ids}
        out = dict(instances)
        out["ids"] = ids
        return out


class IOUWeightedHungarianBBoxIOUTracker(VanillaHungarianBBoxIOUTracker):
    """Hungarian with confidence-weighted IoU cost (reference
    iou_weighted_hungarian_bbox_iou_tracker.py:14)."""

    def update(self, instances: Dict) -> Dict:
        self._scores = np.asarray(instances.get("scores", []), np.float64)
        return super().update(instances)

    def _cost(self, iou: np.ndarray) -> np.ndarray:
        if self._scores is not None and len(self._scores) == iou.shape[0]:
            return 1.0 - iou * self._scores[:, None]
        return 1.0 - iou
