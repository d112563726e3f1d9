"""Golden-file test pinning results.json byte-compatibility.

The reference writer (projects/IDOL/idol/data/ytvis_eval.py:174
``instances_to_coco_json_video`` + ``process``/``evaluate``) emits one record
per (video, instance) with fields {video_id, score, category_id,
segmentations}, where each segmentation is a pycocotools compressed RLE
{"size": [h, w], "counts": <ascii>} with utf-8-decoded counts, absent frames
encoded as all-zero full-size masks, and category_id mapped back to dataset
ids via the reverse of thing_dataset_id_to_contiguous_id.

pycocotools is not installed in this environment, so the golden RLE strings
below are hand-derived from the COCO maskApi.c wire format (column-major run
lengths starting with a zero-run; 5-bit little-endian groups, char = 48 +
(group | 0x20-continuation); counts delta-coded against counts[i-2] from
index 3 on) — each derivation is shown in the comments.
"""

import json

import numpy as np

from vnext_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from vnext_tpu.evaluation.rle import compress_counts
from vnext_tpu.evaluation.ytvis_eval import YTVISEvaluator


def test_rle_string_known_vectors():
    # all-ones 2x2 mask, col-major counts [0, 4]:
    #   i=0 x=0  -> group 0        -> chr(48+0)  = "0"
    #   i=1 x=4  -> group 4        -> chr(48+4)  = "4"
    assert compress_counts([0, 4]) == "04"
    # counts [2, 5, 1]: i=2 is NOT delta-coded (delta starts at i=3)
    #   2 -> "2"; 5 -> "5"; 1 -> "1"
    assert compress_counts([2, 5, 1]) == "251"
    # counts [1, 2, 3, 4]: i=3 delta vs counts[1]: 4-2=2 -> "2"
    assert compress_counts([1, 2, 3, 4]) == "1232"
    # negative delta: counts [3, 1, 1, 1] -> i=3: 1-1=0 -> "0"; and
    # counts [3, 5, 1, 2] -> i=3: 2-5=-3: -3 & 0x1f = 29, >>5 -> -1,
    # group 29 has bit4 set and x==-1 -> stop: chr(48+29) = "M"
    assert compress_counts([3, 5, 1, 2]) == "351M"
    # multi-group: count 100 = 0b1100100: low5=00100 (4, cont) -> chr(48+4+32)
    # = "T"; next 0b11 = 3, bit4 clear, x==0 -> stop: "3"
    assert compress_counts([100]) == "T3"


def _register_tiny(name="ytvis_golden_tiny"):
    if name in DatasetCatalog.list():
        return name
    DatasetCatalog.register(name, lambda: [])
    MetadataCatalog.get(name).set(
        thing_classes=["cat", "dog"],
        # dataset ids deliberately non-contiguous to exercise the reverse map
        thing_dataset_id_to_contiguous_id={7: 0, 9: 1},
        evaluator_type="ytvis",
    )
    return name


def test_results_json_golden(tmp_path):
    name = _register_tiny()
    ev = YTVISEvaluator(name, output_dir=str(tmp_path), local_eval=False)
    ev.reset()

    h, w = 3, 4
    m0 = np.zeros((h, w), bool)
    m0[0, :2] = True  # col-major runs: [0,1,2,1,8] -> compress
    m1 = np.ones((h, w), bool)  # [0, 12]
    record = {"video_id": 5, "height": h, "width": w, "length": 2}
    output = {
        "pred_scores": [0.75, 0.5],
        "pred_labels": [1, 0],
        "pred_masks": [[m0, m1], [m0, None]],
    }
    ev.process([record], [output])
    ev.evaluate()

    got = json.load(open(tmp_path / "results.json"))
    # hand-derived counts:
    #   m0 col-major: (0,0)=1 run... flatten col-major: col0 = [1,0,0],
    #   col1 = [1,0,0], cols 2,3 zero -> values 1,0,0,1,0,0,0,...:
    #   counts [0,1,2,1,8]; compress: 0,1,2, i=3: 1-1=0 -> "0",
    #   i=4: 8-2=6 -> "6"  => "01206"
    #   m1: [0,12]: "0<" (12 -> chr(60) = "<")
    #   zeros(3,4): [12]: "<"
    golden = [
        {
            "video_id": 5,
            "score": 0.75,
            "category_id": 9,
            "segmentations": [
                {"size": [3, 4], "counts": "01206"},
                {"size": [3, 4], "counts": "0<"},
            ],
        },
        {
            "video_id": 5,
            "score": 0.5,
            "category_id": 7,
            "segmentations": [
                {"size": [3, 4], "counts": "01206"},
                {"size": [3, 4], "counts": "<"},
            ],
        },
    ]
    assert got == golden, got
