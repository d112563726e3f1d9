import numpy as np
import pytest

from vnext_tpu.evaluation.rle import (
    compress_counts,
    decompress_counts,
    mask_to_counts,
    rle_area,
    rle_decode,
    rle_encode,
    rle_iou,
)
from vnext_tpu.evaluation.ytvos_eval import YTVOSeval, tube_iou


def _random_mask(rng, h=31, w=17):
    return rng.rand(h, w) > 0.6


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        m = _random_mask(rng)
        rle = rle_encode(m)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(rle_decode(rle), m)


def test_rle_empty_and_full():
    for m in (np.zeros((8, 8), bool), np.ones((8, 8), bool)):
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)


def test_counts_column_major():
    m = np.zeros((3, 2), bool)
    m[0, 0] = True  # first pixel in F-order
    assert mask_to_counts(m) == [0, 1, 5]
    m2 = np.zeros((3, 2), bool)
    m2[0, 1] = True  # pixel index 3 in F-order
    assert mask_to_counts(m2) == [3, 1, 2]


def test_compress_delta_scheme_roundtrip():
    for counts in ([0, 1, 5], [3, 1, 2], [0, 100, 3, 100, 3, 50], [1000000, 5, 2]):
        assert decompress_counts(compress_counts(counts)) == counts


def test_rle_area_and_iou():
    m1 = np.zeros((10, 10), bool)
    m1[:5] = True
    m2 = np.zeros((10, 10), bool)
    m2[2:7] = True
    r1, r2 = rle_encode(m1), rle_encode(m2)
    assert rle_area(r1) == 50
    expected = np.logical_and(m1, m2).sum() / np.logical_or(m1, m2).sum()
    assert abs(rle_iou(r1, r2) - expected) < 1e-9


def test_tube_iou_with_missing_frames():
    m = np.zeros((8, 8), bool)
    m[:4] = True
    r = rle_encode(m)
    # identical on frame 0; det missing on frame 1 while gt present
    iou = tube_iou([r, None], [r, r])
    assert abs(iou - 32 / 64) < 1e-9
    assert tube_iou([r, r], [r, r]) == 1.0
    assert tube_iou([None], [None]) == 0.0


def _make_gt_and_perfect_results():
    h, w = 32, 32
    masks = []
    for off in (0, 10):
        m = np.zeros((h, w), bool)
        m[off : off + 8, 4:20] = True
        masks.append(rle_encode(m))
    gt = {
        "videos": [{"id": 1, "height": h, "width": w, "length": 2,
                    "file_names": ["a", "b"]}],
        "categories": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}],
        "annotations": [
            {"id": 1, "video_id": 1, "category_id": 1,
             "segmentations": [masks[0], masks[0]], "iscrowd": 0},
            {"id": 2, "video_id": 1, "category_id": 2,
             "segmentations": [masks[1], None], "iscrowd": 0},
        ],
    }
    results = [
        {"video_id": 1, "category_id": 1, "score": 0.9,
         "segmentations": [masks[0], masks[0]]},
        {"video_id": 1, "category_id": 2, "score": 0.8,
         "segmentations": [masks[1], None]},
    ]
    return gt, results


def test_ytvos_eval_perfect_predictions():
    gt, results = _make_gt_and_perfect_results()
    stats = YTVOSeval(gt, results).evaluate()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AR@1"] == pytest.approx(1.0)


def test_ytvos_eval_no_predictions():
    gt, _ = _make_gt_and_perfect_results()
    stats = YTVOSeval(gt, []).evaluate()
    assert stats["AP"] == pytest.approx(0.0)


def test_ytvos_eval_wrong_category():
    gt, results = _make_gt_and_perfect_results()
    for r in results:
        r["category_id"] = 3 - r["category_id"]  # swap categories
    stats = YTVOSeval(gt, results).evaluate()
    assert stats["AP"] == pytest.approx(0.0)


def test_ytvos_eval_half_iou_detection():
    gt, results = _make_gt_and_perfect_results()
    # degrade det 1: mask shifted so tube IoU ~ 1/3 (<0.5) -> misses all thresholds
    h, w = 32, 32
    m = np.zeros((h, w), bool)
    m[4:12, 4:20] = True
    results[0]["segmentations"] = [rle_encode(m)] * 2
    stats = YTVOSeval(gt, results).evaluate()
    assert 0.0 < stats["AP"] < 1.0


def test_coco_evaluator_roundtrip(tmp_path):
    import json
    from vnext_tpu.data import DatasetCatalog, MetadataCatalog, register_coco_instances
    from vnext_tpu.evaluation.coco_eval import COCOEvaluator

    gt = {
        "images": [{"id": 1, "height": 32, "width": 32, "file_name": "a.jpg"}],
        "categories": [{"id": 1, "name": "x"}, {"id": 2, "name": "y"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [4, 4, 12, 10],
             "segmentation": [], "iscrowd": 0, "area": 120},
            {"id": 2, "image_id": 1, "category_id": 2, "bbox": [20, 18, 8, 8],
             "segmentation": [], "iscrowd": 0, "area": 64},
        ],
    }
    p = tmp_path / "coco.json"
    p.write_text(json.dumps(gt))
    name = "coco_eval_test"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    register_coco_instances(name, {}, str(p), str(tmp_path))
    DatasetCatalog.get(name)  # populate metadata id map

    ev = COCOEvaluator(name, tasks=("bbox",), output_dir=str(tmp_path))
    ev.reset()
    record = {"image_id": 1, "height": 32, "width": 32}
    perfect = {
        "boxes": np.asarray([[4.0, 4, 16, 14], [20, 18, 28, 26]]),
        "scores": np.asarray([0.9, 0.8]),
        "classes": np.asarray([0, 1]),  # contiguous ids
        "valid": np.asarray([True, True]),
    }
    ev.process([record], [perfect])
    res = ev.evaluate()
    assert res["bbox"]["AP"] == pytest.approx(1.0)

    # wrong classes -> AP 0
    ev.reset()
    wrong = dict(perfect)
    wrong["classes"] = np.asarray([1, 0])
    ev.process([record], [wrong])
    res = ev.evaluate()
    assert res["bbox"]["AP"] == pytest.approx(0.0)


def test_native_rle_ops_match_python():
    from vnext_tpu.evaluation import native
    from vnext_tpu.evaluation.rle import mask_to_counts
    from vnext_tpu.evaluation.ytvos_eval import _rle_intersection_union, tube_iou

    if not native.available():
        pytest.skip("no C toolchain")
    rng = np.random.RandomState(0)
    for _ in range(5):
        m1 = rng.rand(23, 17) > 0.5
        m2 = rng.rand(23, 17) > 0.6
        r1 = {"size": [23, 17], "counts": mask_to_counts(m1)}
        r2 = {"size": [23, 17], "counts": mask_to_counts(m2)}
        i_py, u_py = _rle_intersection_union(r1, r2)
        i_c, u_c = native.rle_intersection_union_native(r1["counts"], r2["counts"])
        assert abs(i_py - i_c) < 1e-9 and abs(u_py - u_c) < 1e-9

    # tube matrix vs python tube_iou incl. missing frames + crowd
    dets = [[r1, r2], [r2, None]]
    gts = [[r1, r1], [None, r2]]
    mat = native.tube_iou_matrix_native(dets, gts, [False, True])
    for d in range(2):
        for g in range(2):
            ref = tube_iou(dets[d], gts[g], iscrowd=(g == 1))
            assert abs(mat[d, g] - ref) < 1e-9, (d, g, mat[d, g], ref)


def test_ytvos_eval_native_matches_python_path():
    from vnext_tpu.evaluation import native

    if not native.available():
        pytest.skip("no C toolchain")
    gt, results = _make_gt_and_perfect_results()
    stats_native = YTVOSeval(gt, results).evaluate()
    # force python path
    import vnext_tpu.evaluation.native as nat

    old = nat._LIB, nat._TRIED
    nat._LIB, nat._TRIED = None, True
    try:
        stats_py = YTVOSeval(gt, results).evaluate()
    finally:
        nat._LIB, nat._TRIED = old
    for k in stats_native:
        if stats_native[k] == stats_native[k]:  # skip NaN
            assert abs(stats_native[k] - stats_py[k]) < 1e-9, k


def test_verify_final_loss_bounds():
    """TEST.FINAL_LOSS_BOUND makes quick-schedule training falsifiable."""
    import pytest

    from vnext_tpu.config import get_cfg
    from vnext_tpu.evaluation import verify_final_loss
    from vnext_tpu.utils.events import EventStorage

    class FakeTrainer:
        storage = None

    cfg = get_cfg()
    cfg.TEST.FINAL_LOSS_BOUND = 10.0
    t = FakeTrainer()
    with EventStorage(0) as st:
        st.put_scalar("total_loss", 8.5)
        t.storage = st
    assert verify_final_loss(cfg, t)
    with EventStorage(0) as st:
        st.put_scalar("total_loss", 123.0)  # corrupted-model blowup
        t.storage = st
    with pytest.raises(AssertionError):
        verify_final_loss(cfg, t)
    with EventStorage(0) as st:
        st.put_scalar("total_loss", float("nan"))
        t.storage = st
    with pytest.raises(AssertionError):
        verify_final_loss(cfg, t)
    # disabled -> no-op
    cfg.TEST.FINAL_LOSS_BOUND = 0.0
    assert verify_final_loss(cfg, t)


def test_verify_results_tight_tolerance_fails():
    import pytest

    from vnext_tpu.config import get_cfg
    from vnext_tpu.evaluation import verify_results

    cfg = get_cfg()
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP", 0.0, 0.02]]
    assert verify_results(cfg, {"bbox": {"AP": 0.0}})
    with pytest.raises(AssertionError):
        verify_results(cfg, {"bbox": {"AP": 0.5}})
