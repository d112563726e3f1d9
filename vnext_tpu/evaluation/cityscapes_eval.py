"""Cityscapes evaluation (capability parity with
detectron2/evaluation/cityscapes_evaluation.py CityscapesInstanceEvaluator /
CityscapesSemSegEvaluator).

The reference shells out to cityscapesscripts over dumped txt/png files; here
instance AP reuses the shared tube-mAP accumulator (each image = a 1-frame
video, GT taken straight from the dataset records' RLE bitmasks) and semantic
mIoU reuses SemSegEvaluator with GT decoded from the *_labelTrainIds.png files."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..parallel.mesh import is_main_process, process_allgather
from .rle import rle_encode
from .sem_seg_eval import SemSegEvaluator
from .ytvis_eval import DatasetEvaluator
from .ytvos_eval import YTVOSeval


class CityscapesInstanceEvaluator(DatasetEvaluator):
    """Mask AP over the 8 Cityscapes thing classes.

    process() expects outputs {scores, classes, valid, masks [N, H, W]} and the
    dataset records from data/datasets/cityscapes.py (RLE GT inline)."""

    def __init__(self, class_names: Optional[List[str]] = None):
        self._class_names = class_names
        self._gt_annos: List[dict] = []
        self._videos: List[dict] = []
        self._preds: List[dict] = []
        self._next_ann = 1

    def reset(self):
        self.__init__(self._class_names)

    def process(self, inputs: List[dict], outputs: List[dict]):
        for record, output in zip(inputs, outputs):
            img_id = record["image_id"]
            self._videos.append({
                "id": img_id, "height": record["height"], "width": record["width"],
                "length": 1, "file_names": [record.get("file_name", "")],
            })
            for a in record.get("annotations", []):
                self._gt_annos.append({
                    "id": self._next_ann, "video_id": img_id,
                    "category_id": a["category_id"] + 1,
                    "segmentations": [a["segmentation"]], "iscrowd": 0,
                })
                self._next_ann += 1
            scores = np.asarray(output["scores"])
            classes = np.asarray(output["classes"])
            valid = np.asarray(output.get("valid", scores > 0))
            masks = output["masks"]
            for i in np.flatnonzero(valid):
                self._preds.append({
                    "video_id": img_id, "category_id": int(classes[i]) + 1,
                    "score": float(scores[i]),
                    "segmentations": [rle_encode(np.asarray(masks[i], bool))],
                })

    def evaluate(self) -> Optional[Dict[str, Dict[str, float]]]:
        chunks = process_allgather((self._videos, self._gt_annos, self._preds))
        if not is_main_process():
            return None
        videos, gts, preds = [], [], []
        for v, g, p in chunks:
            videos.extend(v)
            gts.extend(g)
            preds.extend(p)
        n_cls = len(self._class_names) if self._class_names else (
            max([g["category_id"] for g in gts], default=0)
        )
        gt = {
            "videos": videos,
            "categories": [
                {"id": i + 1, "name": self._class_names[i] if self._class_names else str(i)}
                for i in range(n_cls)
            ],
            "annotations": gts,
        }
        stats = YTVOSeval(gt, preds).evaluate()
        return {"segm": stats}


class CityscapesSemSegEvaluator(SemSegEvaluator):
    """mIoU over the 19 train classes; GT read from each record's
    sem_seg_file_name (labelTrainIds encoding, 255 = ignore)."""

    def __init__(self, class_names: Optional[List[str]] = None):
        from ..data.datasets.cityscapes import CITYSCAPES_SEM_SEG_CLASSES

        names = class_names or list(CITYSCAPES_SEM_SEG_CLASSES)
        super().__init__(num_classes=len(names), ignore_label=255, class_names=names)

    def process(self, inputs: List[dict], outputs: List[dict]):
        from PIL import Image

        resolved = []
        for record in inputs:
            if "sem_seg_gt" in record:
                resolved.append(record)
            else:
                gt = np.asarray(Image.open(record["sem_seg_file_name"]))
                resolved.append({**record, "sem_seg_gt": gt})
        super().process(resolved, outputs)
