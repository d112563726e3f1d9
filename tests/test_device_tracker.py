"""On-device tracker == host tracker over random episodes.

The device variant (tracking/idol_tracker_device.py) must reproduce the host
tracker's assignments (tracking/idol_tracker.py, reference
projects/IDOL/idol/models/tracker.py:50) exactly: same ids, same keeps, same
births/backdrops/expiry, frame by frame.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnext_tpu.tracking.idol_tracker import IDOLTracker
from vnext_tpu.tracking.idol_tracker_device import (
    TrackerState, init_state, tracker_step)


def _episode(seed, n_frames=12, nd=6, c=8, hw=16):
    rng = np.random.RandomState(seed)
    frames = []
    # a few persistent "objects" so real re-association happens
    n_obj = 4
    obj_embed = rng.randn(n_obj, c).astype(np.float32) * 3
    for t in range(n_frames):
        boxes = rng.rand(nd, 5).astype(np.float32)
        boxes[:, 4] = rng.rand(nd)  # scores
        labels = rng.randint(0, 5, size=nd)
        which = rng.randint(0, n_obj, size=nd)
        embeds = (obj_embed[which] + 0.3 * rng.randn(nd, c)).astype(np.float32)
        # blobby masks: distinct quadrants per object id + noise
        masks = np.full((nd, hw, hw), -8.0, np.float32)
        for i in range(nd):
            cx, cy = (which[i] % 2) * hw // 2, (which[i] // 2) * hw // 2
            sz = 4 + rng.randint(0, 4)
            masks[i, cy:cy + sz, cx:cx + sz] = 8.0
        frames.append((boxes, labels, masks, embeds))
    return frames


KW = dict(nms_thr_pre=0.5, nms_thr_post=0.05, init_score_thr=0.2,
          addnew_score_thr=0.2, match_score_thr=0.5,
          memo_tracklet_frames=5, memo_momentum=0.8)


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
@pytest.mark.parametrize("metric", ["bisoftmax", "cosine"])
def test_device_matches_host(seed, metric):
    frames = _episode(seed)
    nd, c = frames[0][3].shape

    host = IDOLTracker(match_metric=metric, **KW)
    state = init_state(capacity=16, num_dets=nd, embed_dim=c)

    for fid, (boxes, labels, masks, embeds) in enumerate(frames):
        hb, hl, hids, hind = host.match(
            boxes.copy(), labels.copy(), masks.copy(), embeds.copy(),
            frame_id=fid, indices=list(range(nd)))

        state, dids, dkeep = tracker_step(
            state, jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(masks) > 0, jnp.asarray(embeds),
            jnp.ones(nd, bool), jnp.asarray(fid, jnp.int32),
            match_metric=metric, **KW)
        dids = np.asarray(dids)
        dkeep = np.asarray(dkeep)

        assert list(np.flatnonzero(dkeep)) == hind, (fid, dkeep, hind)
        np.testing.assert_array_equal(dids[dkeep], hids, err_msg=f"frame {fid}")


def test_capacity_drop_is_graceful():
    """Births beyond slot capacity are dropped, not corrupted."""
    nd, c = 6, 8
    state = init_state(capacity=2, num_dets=nd, embed_dim=c)
    rng = np.random.RandomState(0)
    boxes = rng.rand(nd, 5).astype(np.float32)
    boxes[:, 4] = 0.9
    masks = np.full((nd, 8, 8), -8.0, np.float32)
    for i in range(nd):  # disjoint masks so NMS keeps all
        masks[i, i, :] = 8.0
    state, ids, keep = tracker_step(
        state, jnp.asarray(boxes), jnp.zeros(nd, jnp.int32),
        jnp.asarray(masks) > 0, jnp.asarray(rng.randn(nd, c), jnp.float32),
        jnp.ones(nd, bool), jnp.asarray(0, jnp.int32), **KW)
    # all six got ids but only two slots persist
    assert int((np.asarray(ids) >= 0).sum()) == 6
    assert int((np.asarray(state.slot_tid) >= 0).sum()) == 2


def test_scan_compatible():
    """The step scans over a clip under jit (fully fused serving shape)."""
    nd, c, T = 4, 8, 5
    rng = np.random.RandomState(3)
    boxes = jnp.asarray(rng.rand(T, nd, 5), jnp.float32)
    labels = jnp.zeros((T, nd), jnp.int32)
    masks = jnp.asarray(rng.randn(T, nd, 8, 8) > 0.5)
    embeds = jnp.asarray(rng.randn(T, nd, c), jnp.float32)
    state = init_state(capacity=8, num_dets=nd, embed_dim=c)

    @jax.jit
    def run(state):
        def body(st, xs):
            b, l, m, e, fid = xs
            st, ids, keep = tracker_step(st, b, l, m, e,
                                         jnp.ones(nd, bool), fid, **KW)
            return st, (ids, keep)
        return jax.lax.scan(body, state,
                            (boxes, labels, masks, embeds,
                             jnp.arange(T, dtype=jnp.int32)))

    state, (ids, keep) = run(state)
    assert ids.shape == (T, nd)
    assert int(state.num_tracklets) >= 1
