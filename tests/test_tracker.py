"""Tracker tests (reference style: tests/tracking/* — synthetic detections,
identity continuity asserted)."""

import numpy as np

from vnext_tpu.tracking import IDOLTracker


def _det(cx, cy, score, embed_dir, h=16, w=16, emb_dim=8):
    bbox = np.asarray([cx, cy, 0.2, 0.2, score], np.float32)
    embed = np.zeros(emb_dim, np.float32)
    embed[embed_dir] = 10.0
    mask = np.full((h, w), -10.0, np.float32)
    y, x = int(cy * h), int(cx * w)
    mask[max(0, y - 3) : y + 3, max(0, x - 3) : x + 3] = 10.0
    return bbox, embed, mask


def _frame(dets):
    bboxes = np.stack([d[0] for d in dets])
    embeds = np.stack([d[1] for d in dets])
    masks = np.stack([d[2] for d in dets])
    labels = np.arange(len(dets), dtype=np.int64) % 2
    return bboxes, labels, masks, embeds


def test_identity_continuity_two_objects():
    tracker = IDOLTracker()
    ids_per_frame = []
    for t in range(5):
        dets = [
            _det(0.3 + 0.02 * t, 0.3, 0.9, embed_dir=0),
            _det(0.7 - 0.02 * t, 0.7, 0.8, embed_dir=1),
        ]
        bboxes, labels, masks, embeds = _frame(dets)
        _, _, ids, _ = tracker.match(bboxes, labels, masks, embeds, t, list(range(2)))
        ids_per_frame.append(list(ids))
    first = ids_per_frame[0]
    assert first[0] != first[1] and all(i > -1 for i in first)
    for ids in ids_per_frame[1:]:
        assert ids == first  # identities persist across frames


def test_new_object_gets_new_id():
    tracker = IDOLTracker()
    b, l, m, e = _frame([_det(0.3, 0.3, 0.9, 0)])
    _, _, ids0, _ = tracker.match(b, l, m, e, 0, [0])
    b, l, m, e = _frame([_det(0.3, 0.3, 0.9, 0), _det(0.8, 0.8, 0.9, 3)])
    _, _, ids1, _ = tracker.match(b, l, m, e, 1, [0, 1])
    assert ids1[0] == ids0[0]
    assert ids1[1] not in (ids0[0], -1, -2)


def test_low_score_detection_not_initialized():
    tracker = IDOLTracker(init_score_thr=0.5)
    b, l, m, e = _frame([_det(0.3, 0.3, 0.1, 0)])
    _, _, ids, _ = tracker.match(b, l, m, e, 0, [0])
    assert ids[0] < 0  # below init threshold -> no tracklet


def test_mask_nms_prefilter_drops_duplicates():
    tracker = IDOLTracker(nms_thr_pre=0.5)
    d1 = _det(0.3, 0.3, 0.9, 0)
    d2 = _det(0.3, 0.3, 0.8, 1)  # same mask -> suppressed by pre-NMS
    b, l, m, e = _frame([d1, d2])
    bboxes, labels, ids, indices = tracker.match(b, l, m, e, 0, [0, 1])
    assert len(indices) == 1 and indices[0] == 0


def test_tracklet_expiry():
    tracker = IDOLTracker(memo_tracklet_frames=2)
    b, l, m, e = _frame([_det(0.3, 0.3, 0.9, 0)])
    tracker.match(b, l, m, e, 0, [0])
    assert len(tracker.tracklets) == 1
    # frames pass with a different object only
    for t in range(1, 5):
        b2, l2, m2, e2 = _frame([_det(0.8, 0.8, 0.9, 5)])
        tracker.match(b2, l2, m2, e2, t, [0])
    assert all(tr.last_frame >= 3 for tr in tracker.tracklets.values())


def test_class_defaults_mirror_reference():
    """Bare-class defaults == reference IDOL_Tracker defaults
    (idol/models/tracker.py:52-70); guards against silent drift."""
    t = IDOLTracker()
    assert t.nms_thr_pre == 0.7
    assert t.nms_thr_post == 0.3
    assert t.init_score_thr == 0.2
    assert t.addnew_score_thr == 0.5
    assert t.obj_score_thr == 0.1
    assert t.match_score_thr == 0.5
    assert t.memo_tracklet_frames == 10
    assert t.memo_backdrop_frames == 1
    assert t.memo_momentum == 0.5
    assert t.match_metric == "bisoftmax"
    assert t.long_match is False
    assert t.frame_weight is False
    assert t.temporal_weight is False
    assert t.memory_len == 10


def test_inference_path_tracker_params():
    """The IDOL inference driver must override the class defaults with the
    trained-config values the reference passes at idol/idol.py:278-290."""
    from vnext_tpu.engine.vis_inference import IDOLVideoInference

    drv = IDOLVideoInference.__new__(IDOLVideoInference)
    drv.nms_pre = 0.5
    drv.add_new_score = 0.2
    drv.memory_len = 3
    drv.inference_fw = True
    drv.inference_tw = True
    t = IDOLTracker(
        init_score_thr=0.2,
        obj_score_thr=0.1,
        nms_thr_pre=drv.nms_pre,
        nms_thr_post=0.05,
        addnew_score_thr=drv.add_new_score,
        memo_tracklet_frames=10,
        memo_momentum=0.8,
        long_match=drv.inference_tw,
        frame_weight=(drv.inference_tw | drv.inference_fw),
        temporal_weight=drv.inference_tw,
        memory_len=drv.memory_len,
    )
    assert (t.nms_thr_pre, t.addnew_score_thr, t.memo_momentum) == (0.5, 0.2, 0.8)
    assert t.long_match and t.frame_weight and t.temporal_weight
    assert t.memory_len == 3
