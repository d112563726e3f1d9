"""LVIS instance evaluation (capability parity with
detectron2/evaluation/lvis_evaluation.py LVISEvaluator): COCO-style AP plus the
LVIS frequency-group breakdown APr/APc/APf (rare <10 imgs, common 10-100,
frequent >100 — read from the GT json's per-category "frequency" field)."""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Optional

from ..parallel.mesh import is_main_process, process_allgather
from .coco_eval import COCOEvaluator

logger = logging.getLogger("vnext_tpu")


class LVISEvaluator(COCOEvaluator):
    """COCOEvaluator + per-frequency-group AP (predictions are NOT score
    thresholded in LVIS; callers should pass up to 300 detections/image)."""

    def evaluate(self) -> Optional[Dict[str, Dict[str, float]]]:
        chunks = process_allgather(self._predictions)
        if not is_main_process():
            return None
        predictions = [p for c in chunks for p in c]
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(os.path.join(self._output_dir, "lvis_instances_results.json"), "w") as f:
                json.dump(predictions, f)

        json_file = self._metadata.get("json_file")
        if not json_file or not os.path.exists(json_file):
            logger.info("No GT json for %s; results written only", self._dataset_name)
            return {}
        with open(json_file) as f:
            gt = json.load(f)
        # LVIS categories carry "synonyms"; normalize to COCO-ish records
        for c in gt.get("categories", []):
            c.setdefault("name", (c.get("synonyms") or ["?"])[0])

        results = self._evaluate_predictions(gt, predictions)

        groups = {"r": set(), "c": set(), "f": set()}
        for c in gt.get("categories", []):
            freq = c.get("frequency")
            if freq in groups:
                groups[freq].add(c["id"])
        if any(groups.values()):
            for tag, cat_ids in groups.items():
                if not cat_ids:
                    continue
                sub_gt = dict(gt)
                sub_gt["annotations"] = [
                    a for a in gt.get("annotations", []) if a["category_id"] in cat_ids
                ]
                sub_gt["categories"] = [
                    c for c in gt.get("categories", []) if c["id"] in cat_ids
                ]
                sub_pred = [p for p in predictions if p["category_id"] in cat_ids]
                sub = self._evaluate_predictions(sub_gt, sub_pred)
                for task, stats in sub.items():
                    if "AP" in stats:
                        results[task][f"AP{tag}"] = stats["AP"]
        return results
