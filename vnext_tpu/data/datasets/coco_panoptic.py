"""COCO panoptic loading (reference surface:
detectron2/data/datasets/coco_panoptic.py register_coco_panoptic — panoptic
json + per-image id-map PNGs encoded as R + 256*G + 256^2*B)."""

from __future__ import annotations

import json
import logging
import os
from typing import List

import numpy as np

from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger("vnext_tpu")


def rgb2id(color: np.ndarray) -> np.ndarray:
    """panopticapi encoding: segment id = R + 256*G + 256**2*B."""
    color = color.astype(np.int64)
    if color.ndim == 3:
        return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]
    return color


def id2rgb(id_map: np.ndarray) -> np.ndarray:
    id_map = id_map.astype(np.int64)
    return np.stack(
        [id_map % 256, (id_map // 256) % 256, (id_map // 256**2) % 256], -1
    ).astype(np.uint8)


def load_coco_panoptic_json(json_file: str, image_root: str,
                            panoptic_root: str) -> List[dict]:
    with open(json_file) as f:
        data = json.load(f)
    records = []
    sizes = {im["id"]: im for im in data.get("images", [])}
    for ann in data["annotations"]:
        img = sizes.get(ann["image_id"], {})
        file_name = img.get("file_name", ann["file_name"].replace(".png", ".jpg"))
        records.append({
            "file_name": os.path.join(image_root, file_name),
            "image_id": ann["image_id"],
            "height": img.get("height"),
            "width": img.get("width"),
            "pan_seg_file_name": os.path.join(panoptic_root, ann["file_name"]),
            "segments_info": ann["segments_info"],
        })
    logger.info("Loaded %d panoptic records from %s", len(records), json_file)
    return records


def register_coco_panoptic(name: str, metadata: dict, image_root: str,
                           panoptic_root: str, panoptic_json: str) -> None:
    DatasetCatalog.register(
        name, lambda: load_coco_panoptic_json(panoptic_json, image_root, panoptic_root)
    )
    MetadataCatalog.get(name).set(
        panoptic_root=panoptic_root, image_root=image_root,
        panoptic_json=panoptic_json, evaluator_type="coco_panoptic_seg", **metadata
    )
