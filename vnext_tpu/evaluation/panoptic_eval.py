"""Panoptic quality evaluation (capability parity with
detectron2/evaluation/panoptic_evaluation.py COCOPanopticEvaluator, whose math
lives in panopticapi: PQ = SQ x RQ with IoU>0.5 matching over segments).

Implemented directly on (id-map, segments_info) pairs with a single
intersection histogram per image — no panopticapi dependency."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from ..parallel.mesh import is_main_process, process_allgather
from .ytvis_eval import DatasetEvaluator

VOID = 0


def pq_single_image(pan_gt: np.ndarray, segments_gt: List[dict],
                    pan_pred: np.ndarray, segments_pred: List[dict],
                    stats: Dict[int, np.ndarray]) -> None:
    """Accumulate per-category [iou_sum, tp, fp, fn] into ``stats``.

    pan_*: [H, W] int segment-id maps (0 = void); segments_*: [{"id",
    "category_id", optional "iscrowd"}].
    """
    gt_info = {s["id"]: s for s in segments_gt}
    pred_info = {s["id"]: s for s in segments_pred}
    gt_area = {i: int(a) for i, a in zip(*np.unique(pan_gt, return_counts=True))}
    pred_area = {i: int(a) for i, a in zip(*np.unique(pan_pred, return_counts=True))}

    # joint histogram of (gt_id, pred_id) pixel pairs
    combo = pan_gt.astype(np.int64) * (2**32) + pan_pred.astype(np.int64)
    ids, counts = np.unique(combo, return_counts=True)
    inter = {(int(i // 2**32), int(i % 2**32)): int(c) for i, c in zip(ids, counts)}

    matched_gt, matched_pred = set(), set()
    for (gid, pid), c in inter.items():
        if gid not in gt_info or pid not in pred_info:
            continue
        g, p = gt_info[gid], pred_info[pid]
        if g.get("iscrowd", 0) or g["category_id"] != p["category_id"]:
            continue
        # panopticapi convention: only the prediction's overlap with VOID GT is
        # excluded from the union
        union = gt_area[gid] + pred_area[pid] - c - inter.get((VOID, pid), 0)
        iou = c / max(union, 1)
        if iou > 0.5:
            cat = g["category_id"]
            stats.setdefault(cat, np.zeros(4))
            stats[cat] += [iou, 1, 0, 0]
            matched_gt.add(gid)
            matched_pred.add(pid)
    crowd_by_cat = {g["category_id"]: gid for gid, g in gt_info.items() if g.get("iscrowd", 0)}
    for gid, g in gt_info.items():
        if gid in matched_gt or g.get("iscrowd", 0):
            continue
        stats.setdefault(g["category_id"], np.zeros(4))
        stats[g["category_id"]] += [0, 0, 0, 1]
    for pid, p in pred_info.items():
        if pid in matched_pred:
            continue
        # predictions mostly covered by void or same-class crowd are ignored
        ignored = inter.get((VOID, pid), 0)
        crowd_gid = crowd_by_cat.get(p["category_id"])
        if crowd_gid is not None:
            ignored += inter.get((crowd_gid, pid), 0)
        if ignored / max(pred_area.get(pid, 1), 1) > 0.5:
            continue
        stats.setdefault(p["category_id"], np.zeros(4))
        stats[p["category_id"]] += [0, 0, 1, 0]


class COCOPanopticEvaluator(DatasetEvaluator):
    """PQ/SQ/RQ over panoptic predictions.

    ``process`` expects outputs {"panoptic_seg": ([H, W] id map,
    segments_info)}; inputs carry GT as "pan_seg" ([H, W] id map) +
    "segments_info".
    """

    def __init__(self, thing_ids: Optional[set] = None):
        self._thing_ids = thing_ids
        self._stats: Dict[int, np.ndarray] = {}

    def reset(self):
        self._stats = {}

    def process(self, inputs: List[dict], outputs: List[dict]):
        for record, output in zip(inputs, outputs):
            pan_pred, segments_pred = output["panoptic_seg"]
            pq_single_image(
                np.asarray(record["pan_seg"]), record["segments_info"],
                np.asarray(pan_pred), segments_pred, self._stats,
            )

    def evaluate(self) -> Optional[Dict[str, Dict[str, float]]]:
        chunks = process_allgather(self._stats)
        if not is_main_process():
            return None
        stats: Dict[int, np.ndarray] = defaultdict(lambda: np.zeros(4))
        for c in chunks:
            for cat, v in c.items():
                stats[cat] += v

        def agg(cats):
            pqs, sqs, rqs, n = [], [], [], 0
            for cat in cats:
                iou_sum, tp, fp, fn = stats[cat]
                if tp + fp + fn == 0:
                    continue
                n += 1
                sq = iou_sum / tp if tp else 0.0
                rq = tp / (tp + 0.5 * fp + 0.5 * fn)
                pqs.append(sq * rq); sqs.append(sq); rqs.append(rq)
            if not n:
                return 0.0, 0.0, 0.0
            return (100 * float(np.mean(pqs)), 100 * float(np.mean(sqs)),
                    100 * float(np.mean(rqs)))

        pq, sq, rq = agg(stats.keys())
        res = {"PQ": pq, "SQ": sq, "RQ": rq}
        if self._thing_ids is not None:
            th = [c for c in stats if c in self._thing_ids]
            st = [c for c in stats if c not in self._thing_ids]
            res["PQ_th"], res["SQ_th"], res["RQ_th"] = agg(th)
            res["PQ_st"], res["SQ_st"], res["RQ_st"] = agg(st)
        return {"panoptic_seg": res}
