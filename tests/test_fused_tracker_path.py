"""Fused (on-device) VIS tracker path == host tracker path.

The fused path (engine/vis_inference.py fused_track_video) must produce the
same per-frame (query, track-id) associations and the same final video dict
as the host IDOLTracker path (reference idol.py:328-473 semantics), whenever
the fixed capacities don't bind.
"""

import math

import numpy as np
import pytest

from vnext_tpu.engine.vis_inference import IDOLVideoInference
from vnext_tpu.tracking.idol_tracker import IDOLTracker


def _make_outputs(seed, T=12, Q=12, C=5, E=8, hw=16):
    rng = np.random.RandomState(seed)
    n_obj = 4
    obj_embed = rng.randn(n_obj, E).astype(np.float32) * 3
    logits = rng.randn(T, Q, C).astype(np.float32) * 2 - 1.5
    boxes = rng.rand(T, Q, 4).astype(np.float32) * 0.5 + 0.25
    embeds = np.zeros((T, Q, E), np.float32)
    masks = np.full((T, Q, hw, hw), -8.0, np.float32)
    for t in range(T):
        which = rng.randint(0, n_obj, size=Q)
        embeds[t] = obj_embed[which] + 0.3 * rng.randn(Q, E)
        for q in range(Q):
            cx, cy = (which[q] % 2) * hw // 2, (which[q] // 2) * hw // 2
            sz = 4 + rng.randint(0, 4)
            masks[t, q, cy:cy + sz, cx:cx + sz] = 8.0
    return {
        "pred_logits": logits,
        "pred_boxes": boxes,
        "pred_inst_embed": embeds,
        "pred_masks": masks,
    }


class _NoModel:
    pass


def _driver(**kw):
    return IDOLVideoInference(
        _NoModel(), None, batch_infer_len=5,
        target_size=(16, 16), fused_capacity=24, fused_dets=12, **kw)


@pytest.mark.parametrize("seed", [0, 4])
def test_fused_matches_host(seed):
    outputs = _make_outputs(seed)
    ori, size = (64, 64), (16, 16)

    host = _driver(fused_tracker=False)
    tracker = IDOLTracker(
        init_score_thr=0.2, obj_score_thr=0.1, nms_thr_pre=host.nms_pre,
        nms_thr_post=0.05, addnew_score_thr=host.add_new_score,
        memo_tracklet_frames=10, memo_momentum=0.8,
        long_match=host.inference_tw,
        frame_weight=(host.inference_tw | host.inference_fw),
        temporal_weight=host.inference_tw, memory_len=host.memory_len)
    ref = host._assemble_video(outputs, tracker, ori, size)

    fused = _driver(fused_tracker=True)
    per_frame = fused.fused_track_video(outputs)
    got = fused._build_video_dict(outputs, per_frame, ori, size)

    assert got["pred_labels"] == ref["pred_labels"]
    np.testing.assert_allclose(got["pred_scores"], ref["pred_scores"], rtol=1e-5)
    assert len(got["pred_masks"]) == len(ref["pred_masks"])
    for gm, rm in zip(got["pred_masks"], ref["pred_masks"]):
        assert len(gm) == len(rm)
        for a, b in zip(gm, rm):
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_array_equal(a, b)
