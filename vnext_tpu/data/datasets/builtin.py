"""Builtin registrations for LVIS / Pascal VOC / Cityscapes / COCO-panoptic
(reference surface: detectron2/data/datasets/builtin.py — predefined splits
rooted at the $VNEXT_DATASETS directory, registered lazily by name)."""

from __future__ import annotations

import os
from typing import Optional

from ..catalog import DatasetCatalog
from .cityscapes import register_cityscapes
from .coco_panoptic import register_coco_panoptic
from .lvis import register_lvis_instances
from .pascal_voc import register_pascal_voc

_PREDEFINED_LVIS = {
    "lvis_v1_train": ("coco/", "lvis/lvis_v1_train.json"),
    "lvis_v1_val": ("coco/", "lvis/lvis_v1_val.json"),
    "lvis_v1_test_dev": ("coco/", "lvis/lvis_v1_image_info_test_dev.json"),
    "lvis_v0.5_train": ("coco/", "lvis/lvis_v0.5_train.json"),
    "lvis_v0.5_val": ("coco/", "lvis/lvis_v0.5_val.json"),
    "lvis_v0.5_test": ("coco/", "lvis/lvis_v0.5_image_info_test.json"),
}

_PREDEFINED_VOC = [
    ("voc_2007_trainval", "VOC2007", "trainval", 2007),
    ("voc_2007_train", "VOC2007", "train", 2007),
    ("voc_2007_val", "VOC2007", "val", 2007),
    ("voc_2007_test", "VOC2007", "test", 2007),
    ("voc_2012_trainval", "VOC2012", "trainval", 2012),
    ("voc_2012_train", "VOC2012", "train", 2012),
    ("voc_2012_val", "VOC2012", "val", 2012),
]

_PREDEFINED_CITYSCAPES = {
    "cityscapes_fine_instance_seg_train": ("cityscapes/leftImg8bit/train", "cityscapes/gtFine/train", "instance"),
    "cityscapes_fine_instance_seg_val": ("cityscapes/leftImg8bit/val", "cityscapes/gtFine/val", "instance"),
    "cityscapes_fine_sem_seg_train": ("cityscapes/leftImg8bit/train", "cityscapes/gtFine/train", "sem_seg"),
    "cityscapes_fine_sem_seg_val": ("cityscapes/leftImg8bit/val", "cityscapes/gtFine/val", "sem_seg"),
}

_PREDEFINED_COCO_PANOPTIC = {
    "coco_2017_train_panoptic": (
        "coco/train2017", "coco/panoptic_train2017",
        "coco/annotations/panoptic_train2017.json",
    ),
    "coco_2017_val_panoptic": (
        "coco/val2017", "coco/panoptic_val2017",
        "coco/annotations/panoptic_val2017.json",
    ),
}


def _root(root: Optional[str]) -> str:
    return root or os.environ.get("VNEXT_DATASETS", "datasets")


def register_all_lvis(root: Optional[str] = None) -> None:
    root = _root(root)
    for name, (image_dir, json_path) in _PREDEFINED_LVIS.items():
        if name in DatasetCatalog:
            continue
        register_lvis_instances(
            name, {}, os.path.join(root, json_path), os.path.join(root, image_dir)
        )


def register_all_pascal_voc(root: Optional[str] = None) -> None:
    root = _root(root)
    for name, dirname, split, year in _PREDEFINED_VOC:
        if name in DatasetCatalog:
            continue
        register_pascal_voc(name, os.path.join(root, dirname), split, year)


def register_all_cityscapes(root: Optional[str] = None) -> None:
    root = _root(root)
    for name, (image_dir, gt_dir, task) in _PREDEFINED_CITYSCAPES.items():
        if name in DatasetCatalog:
            continue
        register_cityscapes(name, os.path.join(root, image_dir),
                            os.path.join(root, gt_dir), task=task)


def register_all_coco_panoptic(root: Optional[str] = None) -> None:
    root = _root(root)
    for name, (image_root, pan_root, pan_json) in _PREDEFINED_COCO_PANOPTIC.items():
        if name in DatasetCatalog:
            continue
        register_coco_panoptic(
            name, {}, os.path.join(root, image_root), os.path.join(root, pan_root),
            os.path.join(root, pan_json),
        )


def register_all_builtin(root: Optional[str] = None) -> None:
    """Register every predefined dataset family (COCO/YTVIS are registered by
    their own modules' register_all_* helpers)."""
    from .coco import register_all_coco
    from .ytvis import register_all_ytvis

    register_all_coco(root)
    register_all_ytvis(root)
    register_all_lvis(root)
    register_all_pascal_voc(root)
    register_all_cityscapes(root)
    register_all_coco_panoptic(root)
