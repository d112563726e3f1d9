"""Cityscapes loading (reference surface: detectron2/data/datasets/cityscapes.py
load_cityscapes_instances/load_cityscapes_semantic and builtin_meta.py's
Cityscapes class tables).

The reference decodes instances with cityscapesscripts; here instances are read
straight from the ``*_instanceIds.png`` encoding (pixel = label_id * 1000 +
instance for things, plain label_id for stuff) and semantics from
``*_labelTrainIds.png`` — no extra dependency."""

from __future__ import annotations

import glob
import logging
import os
from typing import List

import numpy as np

from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger("vnext_tpu")

# (name, label_id) for the 8 instance ("thing") classes, contiguous order
CITYSCAPES_THING_CLASSES = (
    ("person", 24), ("rider", 25), ("car", 26), ("truck", 27),
    ("bus", 28), ("train", 31), ("motorcycle", 32), ("bicycle", 33),
)
CITYSCAPES_SEM_SEG_CLASSES = (
    "road", "sidewalk", "building", "wall", "fence", "pole", "traffic light",
    "traffic sign", "vegetation", "terrain", "sky", "person", "rider", "car",
    "truck", "bus", "train", "motorcycle", "bicycle",
)
_LABEL_TO_CONTIGUOUS = {lid: i for i, (_, lid) in enumerate(CITYSCAPES_THING_CLASSES)}


def _pairs(image_dir: str, gt_dir: str, gt_suffix: str) -> List[tuple]:
    """[(image_file, gt_file, image_id)] by the leftImg8bit naming convention."""
    out = []
    for img in sorted(glob.glob(os.path.join(image_dir, "*", "*_leftImg8bit.png"))):
        city = os.path.basename(os.path.dirname(img))
        base = os.path.basename(img)[: -len("_leftImg8bit.png")]
        gt = os.path.join(gt_dir, city, base + gt_suffix)
        out.append((img, gt, base))
    return out


def load_cityscapes_instances(image_dir: str, gt_dir: str) -> List[dict]:
    """Instance records from *_gtFine_instanceIds.png (eager decode: each
    instance becomes a bitmask RLE + tight bbox)."""
    from PIL import Image

    from ...evaluation.rle import rle_encode

    records = []
    for img_file, gt_file, image_id in _pairs(image_dir, gt_dir, "_gtFine_instanceIds.png"):
        inst_map = np.asarray(Image.open(gt_file))
        h, w = inst_map.shape[:2]
        objs = []
        for iid in np.unique(inst_map):
            if iid < 1000:  # stuff or unlabeled
                continue
            label_id = int(iid // 1000)
            if label_id not in _LABEL_TO_CONTIGUOUS:
                continue
            mask = inst_map == iid
            ys, xs = np.nonzero(mask)
            objs.append({
                "category_id": _LABEL_TO_CONTIGUOUS[label_id],
                "bbox": [float(xs.min()), float(ys.min()),
                         float(xs.max() + 1), float(ys.max() + 1)],
                "segmentation": rle_encode(mask),
                "iscrowd": 0,
                "id": int(iid),
            })
        records.append({
            "file_name": img_file, "image_id": image_id,
            "height": int(h), "width": int(w), "annotations": objs,
        })
    logger.info("Loaded %d Cityscapes images from %s", len(records), image_dir)
    return records


def load_cityscapes_semantic(image_dir: str, gt_dir: str) -> List[dict]:
    records = [
        {"file_name": img, "sem_seg_file_name": gt, "image_id": image_id}
        for img, gt, image_id in _pairs(image_dir, gt_dir, "_gtFine_labelTrainIds.png")
    ]
    logger.info("Loaded %d Cityscapes sem-seg images from %s", len(records), image_dir)
    return records


def register_cityscapes(name: str, image_dir: str, gt_dir: str,
                        task: str = "instance") -> None:
    if task == "instance":
        DatasetCatalog.register(name, lambda: load_cityscapes_instances(image_dir, gt_dir))
        MetadataCatalog.get(name).set(
            thing_classes=[n for n, _ in CITYSCAPES_THING_CLASSES],
            image_dir=image_dir, gt_dir=gt_dir, evaluator_type="cityscapes_instance",
        )
    else:
        DatasetCatalog.register(name, lambda: load_cityscapes_semantic(image_dir, gt_dir))
        MetadataCatalog.get(name).set(
            stuff_classes=list(CITYSCAPES_SEM_SEG_CLASSES),
            image_dir=image_dir, gt_dir=gt_dir, ignore_label=255,
            evaluator_type="cityscapes_sem_seg",
        )
