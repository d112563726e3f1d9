"""Pascal VOC detection loading (reference surface:
detectron2/data/datasets/pascal_voc.py — XML annotation parsing, per-split
ImageSets lists, 20-class metadata, 'difficult' flags)."""

from __future__ import annotations

import logging
import os
import xml.etree.ElementTree as ET
from typing import List

from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger("vnext_tpu")

CLASS_NAMES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)


def load_voc_instances(dirname: str, split: str,
                       class_names=CLASS_NAMES) -> List[dict]:
    """dirname contains Annotations/, ImageSets/Main/<split>.txt, JPEGImages/.

    Boxes are converted from VOC's 1-indexed inclusive pixel coords to
    0-indexed xyxy (the reference's origin-shift convention).
    """
    with open(os.path.join(dirname, "ImageSets", "Main", split + ".txt")) as f:
        fileids = [line.strip() for line in f if line.strip()]
    name_to_id = {n: i for i, n in enumerate(class_names)}

    records = []
    for fileid in fileids:
        anno_file = os.path.join(dirname, "Annotations", fileid + ".xml")
        tree = ET.parse(anno_file)
        size = tree.find("size")
        record = {
            "file_name": os.path.join(dirname, "JPEGImages", fileid + ".jpg"),
            "image_id": fileid,
            "height": int(size.find("height").text),
            "width": int(size.find("width").text),
        }
        objs = []
        for obj in tree.findall("object"):
            cls = obj.find("name").text
            if cls not in name_to_id:
                continue
            bb = obj.find("bndbox")
            box = [float(bb.find(k).text) for k in ("xmin", "ymin", "xmax", "ymax")]
            box[0] -= 1.0
            box[1] -= 1.0
            diff_node = obj.find("difficult")
            objs.append({
                "category_id": name_to_id[cls],
                "bbox": box,
                "difficult": bool(int(diff_node.text)) if diff_node is not None else False,
                "iscrowd": 0,
            })
        record["annotations"] = objs
        records.append(record)
    logger.info("Loaded %d VOC images from %s/%s", len(records), dirname, split)
    return records


def register_pascal_voc(name: str, dirname: str, split: str, year: int = 2012) -> None:
    DatasetCatalog.register(name, lambda: load_voc_instances(dirname, split))
    MetadataCatalog.get(name).set(
        thing_classes=list(CLASS_NAMES), dirname=dirname, year=year, split=split,
        evaluator_type="pascal_voc",
    )
