"""SeqFormer inference driver + clip stitcher tests."""

import numpy as np
import pytest

from vnext_tpu.engine.seqformer_inference import VideoStitcher, _sigmoid


def _mask_logit(h, w, y0, y1, x0, x1):
    m = np.full((h, w), -10.0, np.float32)
    m[y0:y1, x0:x1] = 10.0
    return m


def test_stitcher_links_overlapping_clips():
    st = VideoStitcher(video_length=6, num_classes=3, mask_size=(16, 16))
    obj_a = [_mask_logit(16, 16, 2, 8, 2, 8) for _ in range(4)]
    obj_b = [_mask_logit(16, 16, 10, 15, 10, 15) for _ in range(4)]
    cls = np.asarray([[0.9, 0.1, 0.0], [0.0, 0.8, 0.1]], np.float32)
    # clip 1: frames 0-3
    st.update([0, 1, 2, 3], cls, np.stack([np.stack(obj_a), np.stack(obj_b)]))
    assert st.num_inst == 2
    # clip 2: frames 2-5, same objects -> must match, not duplicate
    st.update([2, 3, 4, 5], cls, np.stack([np.stack(obj_a), np.stack(obj_b)]))
    assert st.num_inst == 2
    out_cls, logits, valid = st.get_result()
    assert valid.shape == (2, 6)
    assert valid.all()
    # identity kept: instance 0 is the top-left object on every frame
    assert (_sigmoid(logits[0, 5]) > 0.5)[4, 4]
    assert not (_sigmoid(logits[0, 5]) > 0.5)[12, 12]


def test_stitcher_new_instance_in_later_clip():
    st = VideoStitcher(video_length=4, num_classes=2, mask_size=(8, 8))
    a = np.stack([_mask_logit(8, 8, 0, 4, 0, 4)] * 2)
    st.update([0, 1], np.asarray([[0.9, 0.0]], np.float32), a[None])
    b = np.stack([_mask_logit(8, 8, 4, 8, 4, 8)] * 2)
    both = np.stack([a, b])
    st.update([1, 2], np.asarray([[0.9, 0.0], [0.0, 0.9]], np.float32), both)
    assert st.num_inst == 2
    _, _, valid = st.get_result()
    assert valid[0].tolist() == [True, True, True, False]
    assert valid[1].tolist() == [False, True, True, False]


def test_stitcher_no_false_merge():
    st = VideoStitcher(video_length=4, num_classes=2, mask_size=(8, 8))
    a = np.stack([_mask_logit(8, 8, 0, 4, 0, 4)] * 2)
    st.update([0, 1], np.asarray([[0.9, 0.0]], np.float32), a[None])
    # disjoint object in overlapping frames: must NOT merge
    c = np.stack([_mask_logit(8, 8, 5, 8, 5, 8)] * 2)
    st.update([1, 2], np.asarray([[0.8, 0.0]], np.float32), c[None])
    assert st.num_inst == 2
