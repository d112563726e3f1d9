"""LVIS dataset loading (reference surface: detectron2/data/datasets/lvis.py).

LVIS v1 jsons are COCO-shaped with per-image ``neg_category_ids`` and frequency
bands on categories; annotations have no 'iscrowd'. Parsed directly from json.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger("vnext_tpu")


def load_lvis_json(json_file: str, image_root: str, dataset_name: Optional[str] = None) -> List[dict]:
    with open(json_file) as f:
        data = json.load(f)

    id_map = None
    if dataset_name is not None:
        meta = MetadataCatalog.get(dataset_name)
        cats = sorted(data.get("categories", []), key=lambda c: c["id"])
        if cats:
            meta.thing_classes = [c.get("synonyms", [c.get("name", str(c["id"]))])[0] for c in cats]
            meta.class_frequencies = [c.get("frequency", "f") for c in cats]
            id_map = {c["id"]: i for i, c in enumerate(cats)}
            meta.thing_dataset_id_to_contiguous_id = id_map

    anns_by_image = {}
    for ann in data.get("annotations", []) or []:
        anns_by_image.setdefault(ann["image_id"], []).append(ann)

    records = []
    for img in sorted(data["images"], key=lambda im: im["id"]):
        # LVIS v1 stores the split in coco_url: '.../train2017/xxx.jpg'
        file_name = img.get("file_name")
        if file_name is None and "coco_url" in img:
            file_name = "/".join(img["coco_url"].split("/")[-2:])
        objs = []
        for ann in anns_by_image.get(img["id"], []):
            segm = ann.get("segmentation")
            if isinstance(segm, list):
                segm = [p for p in segm if len(p) % 2 == 0 and len(p) >= 6]
            objs.append(
                {
                    "iscrowd": 0,
                    "id": ann["id"],
                    "category_id": id_map[ann["category_id"]] if id_map else ann["category_id"],
                    "bbox": ann["bbox"],
                    "segmentation": segm,
                }
            )
        records.append(
            {
                "file_name": os.path.join(image_root, file_name),
                "height": img["height"],
                "width": img["width"],
                "image_id": img["id"],
                "not_exhaustive_category_ids": img.get("not_exhaustive_category_ids", []),
                "neg_category_ids": img.get("neg_category_ids", []),
                "annotations": objs,
            }
        )
    logger.info("Loaded %d LVIS images from %s", len(records), json_file)
    return records


def register_lvis_instances(name: str, metadata: dict, json_file: str, image_root: str) -> None:
    DatasetCatalog.register(name, lambda: load_lvis_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="lvis", **metadata
    )
