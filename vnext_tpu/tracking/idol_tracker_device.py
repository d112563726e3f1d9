"""On-device IDOL tracker — fixed-capacity jit/scan variant.

Same association semantics as the host tracker (tracking/idol_tracker.py,
reference projects/IDOL/idol/models/tracker.py:50): mask-NMS pre-filter,
bisoftmax embedding similarity, frame-weighted greedy assignment,
temporally-weighted long-term memory, EMA embedding update, backdrop queue
and tracklet expiry — but expressed over fixed-shape state arrays so the
whole per-frame step jits and the per-clip loop is a `lax.scan`. This is the
fully-fused-serving variant: model forward + tracker run in one compiled
program with no host round-trip per frame.

Capacity model: K tracklet slots, Nd detections/frame, M long-memory length,
Bd backdrop slots (one frame's worth x memo_backdrop_frames). Births beyond
free capacity are dropped (the host tracker is unbounded; pick K comfortably
above expected concurrent instances — YTVIS peaks below 30).

Equality with the host tracker is asserted in
tests/test_device_tracker.py over random multi-frame episodes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

NEG = -1e30


class TrackerState(NamedTuple):
    """Fixed-capacity tracker memory (all leaves fixed-shape, jit-friendly)."""

    slot_tid: Array      # [K] int32, -1 = free slot
    bbox: Array          # [K, 5] cxcywh + score
    embed: Array         # [K, C] EMA embedding
    long_embed: Array    # [K, M, C] shift-register of recent embeddings
    long_score: Array    # [K, M]
    long_count: Array    # [K] int32 valid entries in long_*, newest last
    label: Array         # [K] int32
    last_frame: Array    # [K] int32
    exist_frame: Array   # [K] int32
    acc_frame: Array     # [K] int32
    velocity: Array      # [K, 5]
    bd_embed: Array      # [Bd, C] backdrop embeddings
    bd_valid: Array      # [Bd] bool
    num_tracklets: Array # [] int32 — next fresh track id


def init_state(capacity: int, num_dets: int, embed_dim: int,
               memory_len: int = 3, memo_backdrop_frames: int = 1) -> TrackerState:
    K, C, M = capacity, embed_dim, memory_len
    Bd = num_dets * memo_backdrop_frames
    f32 = jnp.float32
    i32 = jnp.int32
    return TrackerState(
        slot_tid=jnp.full((K,), -1, i32),
        bbox=jnp.zeros((K, 5), f32),
        embed=jnp.zeros((K, C), f32),
        long_embed=jnp.zeros((K, M, C), f32),
        long_score=jnp.zeros((K, M), f32),
        long_count=jnp.zeros((K,), i32),
        label=jnp.zeros((K,), i32),
        last_frame=jnp.zeros((K,), i32),
        exist_frame=jnp.zeros((K,), i32),
        acc_frame=jnp.zeros((K,), i32),
        velocity=jnp.zeros((K, 5), f32),
        bd_embed=jnp.zeros((Bd, C), f32),
        bd_valid=jnp.zeros((Bd,), bool),
        num_tracklets=jnp.zeros((), i32),
    )


def _mask_iou(m1: Array, m2: Array, eps=1e-6) -> Array:
    a = m1.reshape(m1.shape[0], -1).astype(jnp.float32)
    b = m2.reshape(m2.shape[0], -1).astype(jnp.float32)
    inter = a @ b.T
    union = a.sum(1)[:, None] + b.sum(1)[None, :] - inter
    return (inter + eps) / (union + eps)


def _mask_nms_keep(bin_masks: Array, det_valid: Array, thr: float) -> Array:
    """Sequential mask NMS in input order (host mask_nms_keep)."""
    n = bin_masks.shape[0]
    iou = _mask_iou(bin_masks, bin_masks)

    def body(i, keep):
        sup = (iou[i] > thr) & (jnp.arange(n) > i) & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, n - 1, body, det_valid)
    return keep & det_valid


def _masked_softmax(x: Array, valid: Array, axis: int) -> Array:
    x = jnp.where(valid, x, NEG)
    x = x - jax.lax.stop_gradient(x.max(axis=axis, keepdims=True))
    e = jnp.exp(x) * valid
    return e / jnp.maximum(e.sum(axis=axis, keepdims=True), 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=(
        "nms_thr_pre", "nms_thr_post", "init_score_thr", "addnew_score_thr",
        "match_score_thr", "memo_tracklet_frames", "memo_momentum",
        "match_metric", "long_match", "frame_weight", "temporal_weight",
    ),
)
def tracker_step(
    state: TrackerState,
    bboxes: Array,      # [Nd, 5] cxcywh + score
    labels: Array,      # [Nd] int32
    bin_masks: Array,   # [Nd, H, W] bool (sigmoid(logits) > 0.5)
    embeds: Array,      # [Nd, C]
    det_valid: Array,   # [Nd] bool — padding mask for fixed Nd
    frame_id: Array,    # [] int32
    *,
    # defaults mirror IDOLTracker's (== the reference tracker.py:52-70);
    # the IDOL inference path passes the trained-config values explicitly
    # (engine/vis_inference.py tracker_step call)
    nms_thr_pre: float = 0.7,
    nms_thr_post: float = 0.3,
    init_score_thr: float = 0.2,
    addnew_score_thr: float = 0.5,
    match_score_thr: float = 0.5,
    memo_tracklet_frames: int = 10,
    memo_momentum: float = 0.5,
    match_metric: str = "bisoftmax",
    long_match: bool = False,
    frame_weight: bool = False,
    temporal_weight: bool = False,
) -> Tuple[TrackerState, Array, Array]:
    """One tracker frame. Returns (new_state, ids [Nd] int32, keep [Nd] bool).

    ids: -2 unassigned / dropped, -1 backdrop, >=0 track id; only valid where
    keep is True.
    """
    K, M = state.slot_tid.shape[0], state.long_score.shape[1]
    Nd = bboxes.shape[0]
    f32 = jnp.float32

    keep = _mask_nms_keep(bin_masks, det_valid, nms_thr_pre)
    embeds = embeds.astype(f32)

    track_valid = state.slot_tid >= 0
    has_tracks = track_valid.any()

    # ------------------------------------------------ memo embeddings
    if long_match:
        cnt = state.long_count  # [K]
        pos = jnp.arange(M)[None, :]                       # [1, M]
        entry_valid = pos < cnt[:, None]                   # [K, M]
        w = state.long_score
        if temporal_weight:
            # chronological rank 1..len over the valid (newest-last) prefix
            rank = (pos + 1).astype(f32)
            w = w + rank / jnp.maximum(cnt[:, None], 1).astype(f32)
        w = w * entry_valid
        memo_track_embed = (state.long_embed * w[..., None]).sum(1) / jnp.maximum(
            w.sum(1, keepdims=True), 1e-30)
    else:
        memo_track_embed = state.embed

    # memo rows = K tracklet slots. Like the host tracker, the backdrop queue
    # is maintained but NOT matched against (host _memo iterates tracklets
    # only); backdrop ids only suppress births.
    memo_embeds = memo_track_embed
    memo_valid = track_valid
    memo_ids = jnp.where(track_valid, state.slot_tid, -1)
    memo_exist = state.exist_frame.astype(f32)

    feats = embeds @ memo_embeds.T                          # [Nd, Km]
    if match_metric == "bisoftmax":
        d2t = _masked_softmax(feats, memo_valid[None, :], axis=1)
        t2d = _masked_softmax(feats, keep[:, None], axis=0)
        scores0 = (d2t + t2d) / 2
    elif match_metric == "softmax":
        scores0 = _masked_softmax(feats, memo_valid[None, :], axis=1)
    else:  # cosine
        e = embeds / jnp.maximum(jnp.linalg.norm(embeds, axis=1, keepdims=True), 1e-12)
        m = memo_embeds / jnp.maximum(
            jnp.linalg.norm(memo_embeds, axis=1, keepdims=True), 1e-12)
        scores0 = e @ m.T
    scores0 = scores0 * memo_valid[None, :]

    # ------------------------------------------------ greedy assignment
    def assign_body(i, carry):
        ids, scores = carry
        row = scores[i]
        if frame_weight:
            non_backs = (memo_ids > -1) & (row > 0.5)
            nb = non_backs.sum()
            fw_mean = jnp.where(
                nb > 0, (memo_exist * non_backs).sum() / jnp.maximum(nb, 1), 0.0)
            weighted = jnp.where(non_backs, row * memo_exist, row * fw_mean)
            use_w = nb > 1
            memo_ind = jnp.where(use_w, jnp.argmax(jnp.where(memo_valid, weighted, NEG)),
                                 jnp.argmax(jnp.where(memo_valid, row, NEG)))
            conf = jnp.where(use_w, weighted[memo_ind], row[memo_ind])
        else:
            memo_ind = jnp.argmax(jnp.where(memo_valid, row, NEG))
            conf = row[memo_ind]
        tid = memo_ids[memo_ind]
        take = keep[i] & has_tracks & (conf > match_score_thr) & (tid > -1)
        ids = ids.at[i].set(jnp.where(take, tid, ids[i]))
        # zero the matched column for every other detection row
        col_clear = jnp.zeros((Nd,), f32).at[i].set(1.0)
        scores = jnp.where(take,
                           scores * (col_clear[:, None] +
                                     (1 - col_clear[:, None]) *
                                     (jnp.arange(scores.shape[1]) != memo_ind)[None, :]),
                           scores)
        return ids, scores

    ids0 = jnp.full((Nd,), -2, jnp.int32)
    ids, _ = jax.lax.fori_loop(0, Nd, assign_body, (ids0, scores0))

    # ------------------------------------------------ births
    birth_thr = jnp.where(has_tracks, addnew_score_thr, init_score_thr)
    new_mask = keep & (ids == -2) & (bboxes[:, 4] > birth_thr)
    new_rank = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    ids = jnp.where(new_mask, state.num_tracklets + new_rank, ids)
    num_tracklets = state.num_tracklets + new_mask.sum().astype(jnp.int32)

    # ------------------------------------------------ backdrops
    # unassigned dets overlapping nothing earlier in input order become id -1
    unsel = keep & (ids == -2)
    iou_all = _mask_iou(bin_masks, bin_masks) * keep[None, :] * keep[:, None]
    earlier = jnp.arange(Nd)[None, :] < jnp.arange(Nd)[:, None]
    clear = (jnp.where(earlier, iou_all, 0.0) < nms_thr_post).all(axis=1)
    ids = jnp.where(unsel & clear, -1, ids)

    # ------------------------------------------------ memory update
    assigned = keep & (ids > -1)

    # slot lookup: existing tid -> its slot; else a fresh free slot by birth rank
    slot_of_tid = jnp.where(
        assigned[:, None] & (state.slot_tid[None, :] == ids[:, None]) & track_valid[None, :],
        jnp.arange(K)[None, :], K)
    exist_slot = slot_of_tid.min(axis=1)                    # [Nd], K = not found
    is_new = assigned & (exist_slot == K)
    free = ~track_valid                                     # [K]
    free_idx = jnp.where(free, jnp.arange(K), K)
    free_sorted = jnp.sort(free_idx)                        # free slots ascending, K-padded
    new_rank2 = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_slot = free_sorted[jnp.clip(new_rank2, 0, K - 1)]
    slot = jnp.where(is_new, new_slot, exist_slot)          # [Nd], K = drop
    write = assigned & (slot < K)
    slot_c = jnp.clip(slot, 0, K - 1)

    onehot = (jax.nn.one_hot(slot_c, K, dtype=f32) * write[:, None])  # [Nd, K]
    upd = onehot.sum(0) > 0                                  # [K] slot updated this frame
    # at most one det per slot (greedy uniqueness + distinct fresh slots)
    det_of_slot = jnp.argmax(onehot, axis=0)                 # [K]

    d_bbox = bboxes[det_of_slot].astype(f32)
    d_embed = embeds[det_of_slot]
    d_label = labels[det_of_slot].astype(jnp.int32)
    d_score = d_bbox[:, 4]
    d_new = is_new[det_of_slot]

    dt = jnp.maximum(frame_id - state.last_frame, 1).astype(f32)
    vel = (d_bbox - state.bbox) / dt[:, None]
    accf = state.acc_frame.astype(f32)
    upd_old = upd & ~d_new
    velocity = jnp.where(upd_old[:, None],
                         (state.velocity * accf[:, None] + vel) / (accf[:, None] + 1),
                         jnp.where(upd[:, None], 0.0, state.velocity))
    acc_frame = jnp.where(upd_old, state.acc_frame + 1,
                          jnp.where(upd, 0, state.acc_frame))
    exist_frame = jnp.where(upd_old, state.exist_frame + 1,
                            jnp.where(upd, 1, state.exist_frame))
    bbox = jnp.where(upd[:, None], d_bbox, state.bbox)
    embed = jnp.where(upd_old[:, None],
                      (1 - memo_momentum) * state.embed + memo_momentum * d_embed,
                      jnp.where(upd[:, None], d_embed, state.embed))

    # long memory: shift-register append (newest last), reset on birth
    shift = upd & (state.long_count >= M) & ~d_new
    long_embed = jnp.where(shift[:, None, None],
                           jnp.roll(state.long_embed, -1, axis=1), state.long_embed)
    long_score = jnp.where(shift[:, None],
                           jnp.roll(state.long_score, -1, axis=1), state.long_score)
    long_count0 = jnp.where(d_new & upd, 0, state.long_count)
    wpos = jnp.clip(jnp.where(shift, M - 1, long_count0), 0, M - 1)
    pos_onehot = jax.nn.one_hot(wpos, M, dtype=f32) * upd[:, None]   # [K, M]
    long_embed = long_embed * (1 - pos_onehot[..., None]) + \
        pos_onehot[..., None] * d_embed[:, None, :]
    long_score = long_score * (1 - pos_onehot) + pos_onehot * d_score[:, None]
    long_count = jnp.where(upd, jnp.minimum(jnp.where(d_new, 0, state.long_count) + 1, M),
                           state.long_count)

    label = jnp.where(upd, d_label, state.label)
    last_frame = jnp.where(upd, frame_id, state.last_frame)
    slot_tid = jnp.where(upd, ids[det_of_slot], state.slot_tid)

    # expiry
    expired = (slot_tid >= 0) & (frame_id - last_frame >= memo_tracklet_frames)
    slot_tid = jnp.where(expired, -1, slot_tid)

    # backdrop queue (memo_backdrop_frames frames of Nd slots, newest first)
    bd_new_valid = keep & (ids == -1)
    Bd = state.bd_embed.shape[0]
    if Bd == Nd:  # memo_backdrop_frames == 1: replace wholesale
        bd_embed = embeds
        bd_valid = bd_new_valid
    else:
        bd_embed = jnp.concatenate([embeds, state.bd_embed[:-Nd]], 0)
        bd_valid = jnp.concatenate([bd_new_valid, state.bd_valid[:-Nd]], 0)

    new_state = TrackerState(
        slot_tid=slot_tid, bbox=bbox, embed=embed,
        long_embed=long_embed, long_score=long_score, long_count=long_count,
        label=label, last_frame=last_frame, exist_frame=exist_frame,
        acc_frame=acc_frame, velocity=velocity,
        bd_embed=bd_embed, bd_valid=bd_valid, num_tracklets=num_tracklets,
    )
    return new_state, ids, keep
