"""Semantic segmentation evaluator (capability parity with
detectron2/evaluation/sem_seg_evaluation.py: SemSegEvaluator — confusion-matrix
mIoU / fwIoU / pACC / mACC and per-class IoU)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..parallel.mesh import is_main_process, process_allgather
from .ytvis_eval import DatasetEvaluator


class SemSegEvaluator(DatasetEvaluator):
    """Accumulates an (C+1)x(C+1) confusion matrix over per-pixel predictions.

    ``process`` expects per-image outputs {"sem_seg": [H, W] int predicted class}
    and inputs carrying "sem_seg_gt" ([H, W] int, ``ignore_label`` for void).
    """

    def __init__(self, num_classes: int, ignore_label: int = 255,
                 class_names: Optional[List[str]] = None):
        self._num_classes = num_classes
        self._ignore_label = ignore_label
        self._class_names = class_names or [str(i) for i in range(num_classes)]
        self._conf: np.ndarray = np.zeros((num_classes, num_classes), np.int64)

    def reset(self):
        self._conf = np.zeros((self._num_classes, self._num_classes), np.int64)

    def process(self, inputs: List[dict], outputs: List[dict]):
        for record, output in zip(inputs, outputs):
            pred = np.asarray(output["sem_seg"], np.int64).reshape(-1)
            gt = np.asarray(record["sem_seg_gt"], np.int64).reshape(-1)
            valid = gt != self._ignore_label
            pred = np.clip(pred[valid], 0, self._num_classes - 1)
            gt = gt[valid]
            self._conf += np.bincount(
                gt * self._num_classes + pred, minlength=self._num_classes**2
            ).reshape(self._num_classes, self._num_classes)

    def evaluate(self) -> Optional[Dict[str, Dict[str, float]]]:
        chunks = process_allgather(self._conf)
        if not is_main_process():
            return None
        conf = np.sum(np.stack(chunks), axis=0) if len(chunks) > 1 else chunks[0]
        tp = np.diag(conf).astype(np.float64)
        pos_gt = conf.sum(1).astype(np.float64)
        pos_pred = conf.sum(0).astype(np.float64)
        union = pos_gt + pos_pred - tp
        class_present = pos_gt > 0
        iou = np.full(self._num_classes, np.nan)
        iou[union > 0] = tp[union > 0] / union[union > 0]
        acc = np.full(self._num_classes, np.nan)
        acc[pos_gt > 0] = tp[pos_gt > 0] / pos_gt[pos_gt > 0]
        miou = float(np.nanmean(iou[class_present])) if class_present.any() else 0.0
        freq = pos_gt / max(pos_gt.sum(), 1.0)
        fwiou = float(np.nansum(np.where(np.isnan(iou), 0.0, iou) * freq))
        pacc = float(tp.sum() / max(pos_gt.sum(), 1.0))
        macc = float(np.nanmean(acc[class_present])) if class_present.any() else 0.0
        res = {"mIoU": 100 * miou, "fwIoU": 100 * fwiou,
               "pACC": 100 * pacc, "mACC": 100 * macc}
        for i, name in enumerate(self._class_names):
            if class_present[i]:
                res[f"IoU-{name}"] = 100 * float(iou[i]) if not np.isnan(iou[i]) else 0.0
        return {"sem_seg": res}
