"""Sem-seg / VOC / panoptic / LVIS evaluators and VOC/Cityscapes/panoptic loaders."""

import json
import os

import numpy as np
import pytest


def test_sem_seg_evaluator_exact():
    from vnext_tpu.evaluation.sem_seg_eval import SemSegEvaluator

    ev = SemSegEvaluator(num_classes=3, class_names=["a", "b", "c"])
    gt = np.zeros((4, 4), np.int64)
    gt[2:] = 1
    gt[0, 0] = 255  # ignored
    pred = gt.copy()
    pred[0, 0] = 2          # on ignored pixel: no effect
    pred[3, :2] = 0         # 2 of 8 class-1 pixels wrong
    ev.process([{"sem_seg_gt": gt}], [{"sem_seg": pred}])
    res = ev.evaluate()["sem_seg"]
    # class0: tp=7, union=7+2 -> 7/9; class1: tp=6, union=8 -> 0.75; c absent
    assert abs(res["IoU-a"] - 100 * 7 / 9) < 1e-6
    assert abs(res["IoU-b"] - 75.0) < 1e-6
    assert "IoU-c" not in res
    assert abs(res["mIoU"] - 100 * (7 / 9 + 0.75) / 2) < 1e-6
    assert abs(res["pACC"] - 100 * 13 / 15) < 1e-6

    perfect = SemSegEvaluator(num_classes=3)
    perfect.process([{"sem_seg_gt": gt}], [{"sem_seg": gt}])
    assert perfect.evaluate()["sem_seg"]["mIoU"] == 100.0


def test_voc_ap_exact():
    from vnext_tpu.evaluation.pascal_voc_eval import voc_ap

    # one fp then one tp over 1 GT: precision [0, 0.5], recall [0, 1]
    rec = np.asarray([0.0, 1.0])
    prec = np.asarray([0.0, 0.5])
    assert abs(voc_ap(rec, prec) - 0.5) < 1e-9
    # 11-point: p(0)=0.5 (max over rec>=0), p(0.1..1.0)=0.5 -> 0.5
    assert abs(voc_ap(rec, prec, use_07_metric=True) - 0.5) < 1e-9
    # perfect detector
    assert voc_ap(np.asarray([1.0]), np.asarray([1.0])) == 1.0


def test_voc_evaluator_end_to_end():
    from vnext_tpu.evaluation.pascal_voc_eval import PascalVOCDetectionEvaluator

    ev = PascalVOCDetectionEvaluator(["cat", "dog"], use_07_metric=False)
    inputs = [{
        "image_id": "im0",
        "annotations": [
            {"category_id": 0, "bbox": [10, 10, 30, 30]},
            {"category_id": 0, "bbox": [50, 50, 70, 70], "difficult": True},
            {"category_id": 1, "bbox": [0, 0, 20, 20]},
        ],
    }]
    outputs = [{
        "boxes": np.asarray([[10, 10, 30, 30], [50, 50, 70, 70], [100, 100, 120, 120]],
                            np.float64),
        "scores": np.asarray([0.9, 0.8, 0.7]),
        "classes": np.asarray([0, 0, 1]),
        "valid": np.asarray([True, True, True]),
    }]
    ev.process(inputs, outputs)
    res = ev.evaluate()["bbox"]
    # cat: tp on first GT, difficult match ignored -> AP 1.0 over 1 non-difficult GT
    assert abs(res["AP50-cat"] - 100.0) < 1e-6
    # dog: detection misses the GT -> AP 0
    assert res["AP50-dog"] == 0.0
    assert abs(res["AP50"] - 50.0) < 1e-6


def test_panoptic_pq():
    from vnext_tpu.evaluation.panoptic_eval import COCOPanopticEvaluator

    gt = np.zeros((10, 10), np.int32)
    gt[:5] = 1
    gt[5:] = 2
    segs_gt = [{"id": 1, "category_id": 7}, {"id": 2, "category_id": 3}]

    ev = COCOPanopticEvaluator(thing_ids={7})
    ev.process([{"pan_seg": gt, "segments_info": segs_gt}],
               [{"panoptic_seg": (gt, segs_gt)}])
    res = ev.evaluate()["panoptic_seg"]
    assert res["PQ"] == 100.0 and res["SQ"] == 100.0 and res["RQ"] == 100.0
    assert res["PQ_th"] == 100.0 and res["PQ_st"] == 100.0

    # partial: prediction shifts segment 1 down 2 rows -> IoU(seg1) = 3/7
    pred = np.zeros((10, 10), np.int32)
    pred[2:5] = 1
    pred[5:] = 2
    ev2 = COCOPanopticEvaluator()
    ev2.process([{"pan_seg": gt, "segments_info": segs_gt}],
                [{"panoptic_seg": (pred, segs_gt)}])
    res2 = ev2.evaluate()["panoptic_seg"]
    # seg1: IoU 30/50 = 0.6 > 0.5 matched; seg2 exact. PQ = (0.6 + 1)/2
    assert abs(res2["PQ"] - 100 * 0.8) < 1e-6


def test_dataset_evaluators_and_inference_loop():
    from vnext_tpu.evaluation.evaluator import DatasetEvaluators, inference_on_dataset
    from vnext_tpu.evaluation.sem_seg_eval import SemSegEvaluator

    gt = np.zeros((4, 4), np.int64)
    loader = [{"sem_seg_gt": gt} for _ in range(3)]
    ev = DatasetEvaluators([SemSegEvaluator(num_classes=2)])
    res = inference_on_dataset(lambda x: {"sem_seg": x["sem_seg_gt"]}, loader, ev,
                               warmup_iters=1)
    assert res["sem_seg"]["mIoU"] == 100.0


def test_voc_loader(tmp_path):
    from vnext_tpu.data.datasets.pascal_voc import load_voc_instances

    (tmp_path / "Annotations").mkdir()
    (tmp_path / "ImageSets" / "Main").mkdir(parents=True)
    (tmp_path / "ImageSets" / "Main" / "train.txt").write_text("img0\n")
    (tmp_path / "Annotations" / "img0.xml").write_text(
        "<annotation><size><width>100</width><height>80</height></size>"
        "<object><name>cat</name><difficult>1</difficult>"
        "<bndbox><xmin>11</xmin><ymin>21</ymin><xmax>30</xmax><ymax>40</ymax></bndbox>"
        "</object>"
        "<object><name>unknown</name>"
        "<bndbox><xmin>1</xmin><ymin>1</ymin><xmax>5</xmax><ymax>5</ymax></bndbox>"
        "</object></annotation>"
    )
    recs = load_voc_instances(str(tmp_path), "train")
    assert len(recs) == 1 and recs[0]["height"] == 80
    assert len(recs[0]["annotations"]) == 1  # unknown class dropped
    a = recs[0]["annotations"][0]
    assert a["bbox"] == [10.0, 20.0, 30.0, 40.0] and a["difficult"]
    assert a["category_id"] == 7  # 'cat' in CLASS_NAMES


def test_cityscapes_loader(tmp_path):
    from PIL import Image
    from vnext_tpu.data.datasets.cityscapes import load_cityscapes_instances
    from vnext_tpu.evaluation.rle import rle_decode

    img_dir = tmp_path / "leftImg8bit" / "city1"
    gt_dir = tmp_path / "gtFine" / "city1"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    Image.new("RGB", (16, 12)).save(img_dir / "aa_000_leftImg8bit.png")
    inst = np.zeros((12, 16), np.int32)
    inst[2:6, 3:9] = 26000  # car #0
    inst[8:11, 10:15] = 24001  # person #1
    inst[0, 0] = 7  # road (stuff) — skipped
    Image.fromarray(inst, mode="I").save(gt_dir / "aa_000_gtFine_instanceIds.png")

    recs = load_cityscapes_instances(str(tmp_path / "leftImg8bit"), str(tmp_path / "gtFine"))
    assert len(recs) == 1
    objs = sorted(recs[0]["annotations"], key=lambda o: o["id"])
    assert [o["category_id"] for o in objs] == [0, 2]  # person=0, car=2
    car = [o for o in objs if o["category_id"] == 2][0]
    assert car["bbox"] == [3.0, 2.0, 9.0, 6.0]
    assert rle_decode(car["segmentation"]).sum() == 4 * 6


def test_coco_panoptic_loader(tmp_path):
    from vnext_tpu.data.datasets.coco_panoptic import (
        id2rgb, load_coco_panoptic_json, rgb2id,
    )

    ids = np.asarray([[0, 1], [70000, 1]], np.int64)
    assert (rgb2id(id2rgb(ids)) == ids).all()

    data = {
        "images": [{"id": 5, "file_name": "0005.jpg", "height": 10, "width": 10}],
        "annotations": [{
            "image_id": 5, "file_name": "0005.png",
            "segments_info": [{"id": 1, "category_id": 3}],
        }],
    }
    p = tmp_path / "pan.json"
    p.write_text(json.dumps(data))
    recs = load_coco_panoptic_json(str(p), "/imgs", "/pan")
    assert recs[0]["file_name"] == "/imgs/0005.jpg"
    assert recs[0]["pan_seg_file_name"] == "/pan/0005.png"
    assert recs[0]["segments_info"][0]["category_id"] == 3


def test_lvis_evaluator_frequency_groups(tmp_path):
    from vnext_tpu.data.catalog import MetadataCatalog
    from vnext_tpu.evaluation.lvis_eval import LVISEvaluator

    gt = {
        "images": [{"id": 1, "height": 20, "width": 20}],
        "categories": [
            {"id": 1, "synonyms": ["rarecat"], "frequency": "r"},
            {"id": 2, "synonyms": ["freqdog"], "frequency": "f"},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [2, 2, 6, 6]},
            {"id": 2, "image_id": 1, "category_id": 2, "bbox": [10, 10, 8, 8]},
        ],
    }
    json_file = tmp_path / "lvis_gt.json"
    json_file.write_text(json.dumps(gt))
    name = "lvis_eval_test_ds"
    MetadataCatalog.get(name).set(
        json_file=str(json_file),
        thing_dataset_id_to_contiguous_id={1: 0, 2: 1},
    )
    ev = LVISEvaluator(name, tasks=("bbox",))
    ev.process(
        [{"image_id": 1, "height": 20, "width": 20}],
        [{
            "boxes": np.asarray([[2, 2, 8, 8], [10, 10, 18, 18]], np.float64),
            "scores": np.asarray([0.9, 0.8]),
            "classes": np.asarray([0, 1]),
            "valid": np.asarray([True, True]),
        }],
    )
    res = ev.evaluate()["bbox"]
    assert res["AP"] > 0.99       # both detections exact (0-1 scale)
    assert res["APr"] > 0.99 and res["APf"] > 0.99
    assert "APc" not in res       # no common-frequency categories present
