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


def video_output_to_json(
    output: dict,
    video_id: int,
    height: Optional[int] = None,
    width: Optional[int] = None,
    reverse_id_map: Optional[dict] = None,
) -> List[dict]:
    """Serialize one video's predictions to YTVIS results.json entries
    (reference: idol/data/ytvis_eval.py:174 instances_to_coco_json_video +
    the :153 contiguous->dataset category remap, default 0-based -> 1-based)."""
    if height is None or width is None:
        height, width = output["image_size"]
    results = []
    for score, label, inst_masks in zip(
        output["pred_scores"], output["pred_labels"], output["pred_masks"]
    ):
        segms = []
        for m in inst_masks:
            if m is None:
                # reference encodes an all-zero full-size mask for absent
                # frames (ytvis_eval.py:197-200), not null
                segms.append(rle_encode(np.zeros((height, width), bool)))
            else:
                segms.append(rle_encode(np.asarray(m, bool)))
        category_id = (
            reverse_id_map[int(label)] if reverse_id_map else int(label) + 1
        )
        results.append(
            {
                "video_id": int(video_id),
                "score": float(score),
                "category_id": int(category_id),
                "segmentations": segms,
            }
        )
    return results


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
            self._predictions.extend(
                video_output_to_json(
                    output,
                    video_id=record["video_id"],
                    height=record["height"],
                    width=record["width"],
                    reverse_id_map=self._reverse_id_map,
                )
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
    """Evaluator factory keyed on the dataset's ``evaluator_type`` metadata.

    Mirrors the reference's per-type dispatch (tools/train_net.py:82
    Trainer.build_evaluator), covering every evaluator this framework ships;
    multiple evaluators for one dataset are combined with DatasetEvaluators.
    """
    meta = MetadataCatalog.get(dataset_name)
    evaluator_type = meta.get("evaluator_type", "ytvis")
    output_dir = output_dir or cfg.OUTPUT_DIR

    if evaluator_type == "ytvis":
        return YTVISEvaluator(dataset_name, output_dir)
    if evaluator_type in ("coco", "coco_panoptic_seg"):
        from .coco_eval import COCOEvaluator
        from .evaluator import DatasetEvaluators
        from .panoptic_eval import COCOPanopticEvaluator

        tasks = ("bbox",)
        if cfg.MODEL.MASK_ON:
            tasks = tasks + ("segm",)
        if cfg.MODEL.KEYPOINT_ON:
            tasks = tasks + ("keypoints",)
        evaluators = [COCOEvaluator(dataset_name, tasks=tasks, output_dir=output_dir)]
        if evaluator_type == "coco_panoptic_seg":
            thing_ids = set(
                (meta.get("thing_dataset_id_to_contiguous_id") or {}).values()
            ) or None
            evaluators.append(COCOPanopticEvaluator(thing_ids=thing_ids))
        return evaluators[0] if len(evaluators) == 1 else DatasetEvaluators(evaluators)
    if evaluator_type == "lvis":
        from .lvis_eval import LVISEvaluator

        tasks = ("bbox", "segm") if cfg.MODEL.MASK_ON else ("bbox",)
        return LVISEvaluator(dataset_name, tasks=tasks, output_dir=output_dir)
    if evaluator_type == "sem_seg":
        from .sem_seg_eval import SemSegEvaluator

        return SemSegEvaluator(
            num_classes=len(meta.get("stuff_classes") or []) or cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            ignore_label=meta.get("ignore_label", 255),
        )
    if evaluator_type == "pascal_voc":
        from .pascal_voc_eval import PascalVOCDetectionEvaluator

        return PascalVOCDetectionEvaluator(
            class_names=list(meta.get("thing_classes") or []),
            use_07_metric=meta.get("year", 2007) == 2007,
        )
    if evaluator_type == "cityscapes_instance":
        from .cityscapes_eval import CityscapesInstanceEvaluator

        return CityscapesInstanceEvaluator(class_names=meta.get("thing_classes"))
    if evaluator_type == "cityscapes_sem_seg":
        from .cityscapes_eval import CityscapesSemSegEvaluator

        return CityscapesSemSegEvaluator(class_names=meta.get("stuff_classes"))
    if evaluator_type == "rotated_coco":
        from .rotated_coco_eval import RotatedCOCOEvaluator

        return RotatedCOCOEvaluator(class_names=meta.get("thing_classes"))
    raise NotImplementedError(
        f"no evaluator for type {evaluator_type!r} (dataset {dataset_name})"
    )
