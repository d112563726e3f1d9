"""YTVIS evaluator: collect per-video predictions, emit results.json, optional local mAP.

Capability parity with projects/IDOL/idol/data/ytvis_eval.py (YTVISEvaluator:
process at :174 instances_to_coco_json_video, evaluate at :110-171 writes
``results.json`` for the challenge server). Additionally wires in the local
tube-IoU mAP evaluator (ytvos_eval.py) — matching InstMove's vendored
ytvoseval capability — when GT annotations are present.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

from ..data.catalog import MetadataCatalog
from ..parallel.mesh import is_main_process, process_allgather
from .rle import rle_encode
from .ytvos_eval import YTVOSeval

logger = logging.getLogger("vnext_tpu")


class DatasetEvaluator:
    """Evaluator protocol (reference: evaluation/evaluator.py:15)."""

    def reset(self):
        pass

    def process(self, inputs, outputs):
        pass

    def evaluate(self):
        pass


class YTVISEvaluator(DatasetEvaluator):
    def __init__(
        self,
        dataset_name: str,
        output_dir: Optional[str] = None,
        local_eval: bool = True,
    ):
        self._dataset_name = dataset_name
        self._output_dir = output_dir
        self._local_eval = local_eval
        self._metadata = MetadataCatalog.get(dataset_name)
        self._reverse_id_map = None
        id_map = self._metadata.get("thing_dataset_id_to_contiguous_id")
        if id_map:
            self._reverse_id_map = {v: k for k, v in id_map.items()}
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process(self, inputs: List[dict], outputs: List[dict]):
        """inputs: video records; outputs: IDOLVideoInference video_output dicts."""
        for record, output in zip(inputs, outputs):
            video_id = record["video_id"]
            for score, label, inst_masks in zip(
                output["pred_scores"], output["pred_labels"], output["pred_masks"]
            ):
                segms = []
                for m in inst_masks:
                    if m is None:
                        segms.append(None)
                    else:
                        segms.append(rle_encode(np.asarray(m, bool)))
                category_id = (
                    self._reverse_id_map[int(label)] if self._reverse_id_map else int(label) + 1
                )
                self._predictions.append(
                    {
                        "video_id": int(video_id),
                        "score": float(score),
                        "category_id": int(category_id),
                        "segmentations": segms,
                    }
                )

    def evaluate(self) -> Optional[Dict[str, float]]:
        all_preds = process_allgather(self._predictions)
        if not is_main_process():
            return None
        predictions = [p for chunk in all_preds for p in chunk]

        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            path = os.path.join(self._output_dir, "results.json")
            with open(path, "w") as f:
                json.dump(predictions, f)
            logger.info("YTVIS results written to %s (%d predictions)", path, len(predictions))

        if not self._local_eval:
            return {}

        json_file = self._metadata.get("json_file")
        if not json_file or not os.path.exists(json_file):
            logger.info("No GT json for %s; skipping local mAP", self._dataset_name)
            return {}
        with open(json_file) as f:
            gt = json.load(f)
        if not gt.get("annotations"):
            logger.info("GT json has no annotations (test server split); skipping local mAP")
            return {}
        gt = _normalize_gt(gt)
        stats = YTVOSeval(gt, predictions).evaluate()
        logger.info("YTVIS local eval: %s", stats)
        return {"segm": stats}


def _normalize_gt(gt: dict) -> dict:
    """Rasterize polygon GT segmentations to RLE so tube IoU works uniformly."""
    from ..structures.masks import polygons_to_bitmask

    h_by_vid = {v["id"]: (v["height"], v["width"]) for v in gt["videos"]}
    for ann in gt.get("annotations", []) or []:
        h, w = h_by_vid[ann["video_id"]]
        fixed = []
        for segm in ann["segmentations"]:
            if segm is None or isinstance(segm, dict):
                fixed.append(segm)
            else:
                mask = polygons_to_bitmask([np.asarray(p) for p in segm], h, w)
                fixed.append(rle_encode(mask))
        ann["segmentations"] = fixed
    return gt


def build_evaluator(cfg, dataset_name: str, output_dir: Optional[str] = None):
    """Evaluator factory (reference surface: train_net.py Trainer.build_evaluator)."""
    evaluator_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "ytvis")
    if evaluator_type == "ytvis":
        return YTVISEvaluator(dataset_name, output_dir or cfg.OUTPUT_DIR)
    raise NotImplementedError(f"Evaluator type {evaluator_type} not yet implemented")
