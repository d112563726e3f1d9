"""Rotated-box detection evaluation (capability parity with
detectron2/evaluation/rotated_coco_evaluation.py RotatedCOCOEvaluator: COCO-style
AP where box overlap is the exact rotated-polygon IoU).

Matching is the COCO greedy assignment per (class, image) over IoU thresholds
.50:.05:.95; the IoU itself comes from ops/rotated_boxes.pairwise_iou_rotated
(exact Sutherland–Hodgman clipping, evaluated on host via jit)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import jax
import numpy as np

from ..parallel.mesh import is_main_process, process_allgather
from .pascal_voc_eval import voc_ap
from .ytvis_eval import DatasetEvaluator

_IOU_THRESHS = np.arange(0.5, 1.0, 0.05)


@jax.jit
def _rotated_iou_matrix(a, b):
    from ..ops.rotated_boxes import pairwise_iou_rotated

    return pairwise_iou_rotated(a, b)


class RotatedCOCOEvaluator(DatasetEvaluator):
    """AP/AP50/AP75 for (cx, cy, w, h, angle) detections.

    process() expects outputs {boxes [N,5], scores, classes, valid} and inputs
    carrying "annotations" [{category_id, bbox (5,)}].
    """

    def __init__(self, class_names: Optional[List[str]] = None):
        self._class_names = class_names
        self._dets: Dict[int, List[dict]] = defaultdict(list)
        self._gt: Dict[int, Dict] = defaultdict(dict)

    def reset(self):
        self._dets = defaultdict(list)
        self._gt = defaultdict(dict)

    def process(self, inputs: List[dict], outputs: List[dict]):
        for record, output in zip(inputs, outputs):
            img_id = record["image_id"]
            by_cls = defaultdict(list)
            for a in record.get("annotations", []):
                by_cls[a["category_id"]].append(a["bbox"])
            for c, boxes in by_cls.items():
                self._gt[c][img_id] = np.asarray(boxes, np.float32)
            boxes = np.asarray(output["boxes"], np.float32)
            scores = np.asarray(output["scores"])
            classes = np.asarray(output["classes"])
            valid = np.asarray(output.get("valid", scores > 0))
            for i in np.flatnonzero(valid):
                self._dets[int(classes[i])].append(
                    {"image_id": img_id, "score": float(scores[i]), "box": boxes[i]}
                )

    def _eval_class(self, gt_by_image: Dict, dets: List[dict]) -> np.ndarray:
        """AP at each IoU threshold for one class."""
        npos = sum(len(v) for v in gt_by_image.values())
        dets = sorted(dets, key=lambda d: -d["score"])
        ious = {}  # image_id -> [n_det_in_img? per det] computed lazily per det
        aps = np.zeros(len(_IOU_THRESHS))
        if not dets or npos == 0:
            return aps
        # precompute per-image IoU of its detections vs its GT
        det_iou = []
        for d in dets:
            g = gt_by_image.get(d["image_id"])
            if g is None or not len(g):
                det_iou.append(np.zeros(0))
            else:
                det_iou.append(
                    np.asarray(_rotated_iou_matrix(d["box"][None], g))[0]
                )
        for t_i, thr in enumerate(_IOU_THRESHS):
            matched = {k: np.zeros(len(v), bool) for k, v in gt_by_image.items()}
            tp = np.zeros(len(dets))
            fp = np.zeros(len(dets))
            for i, d in enumerate(dets):
                iou = det_iou[i].copy()
                if len(iou):
                    iou[matched[d["image_id"]]] = -1.0  # already-claimed GT
                    j = int(np.argmax(iou))
                    if iou[j] >= thr:
                        matched[d["image_id"]][j] = True
                        tp[i] = 1
                        continue
                fp[i] = 1
            tp_c, fp_c = np.cumsum(tp), np.cumsum(fp)
            rec = tp_c / npos
            prec = tp_c / np.maximum(tp_c + fp_c, 1e-9)
            aps[t_i] = voc_ap(rec, prec)
        return aps

    def evaluate(self) -> Optional[Dict[str, Dict[str, float]]]:
        gathered = process_allgather((dict(self._dets), dict(self._gt)))
        if not is_main_process():
            return None
        dets: Dict[int, List[dict]] = defaultdict(list)
        gt: Dict[int, Dict] = defaultdict(dict)
        for d, g in gathered:
            for c, lst in d.items():
                dets[c].extend(lst)
            for c, per_img in g.items():
                gt[c].update(per_img)
        per_class = {c: self._eval_class(gt[c], dets.get(c, [])) for c in gt}
        if not per_class:
            return {"bbox": {"AP": 0.0, "AP50": 0.0, "AP75": 0.0}}
        all_aps = np.stack(list(per_class.values()))       # [C, T]
        res = {
            "AP": 100 * float(all_aps.mean()),
            "AP50": 100 * float(all_aps[:, 0].mean()),
            "AP75": 100 * float(all_aps[:, 5].mean()),
        }
        if self._class_names:
            for c, aps in per_class.items():
                res[f"AP-{self._class_names[c]}"] = 100 * float(aps.mean())
        return {"bbox": res}
