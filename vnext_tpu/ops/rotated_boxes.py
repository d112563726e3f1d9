"""Rotated-box ops: exact pairwise rotated IoU and rotated NMS (jnp, fixed shape).

Capability parity with detectron2/layers/csrc/box_iou_rotated (exact polygon-
clipping IoU) and csrc/nms_rotated — reimplemented as vectorized
Sutherland–Hodgman clipping with fixed-capacity vertex buffers, fully
jit-compatible (no dynamic shapes).

Boxes are (cx, cy, w, h, angle_degrees) with CCW-positive angles, matching the
reference's XYWHA_ABS convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_MAX_VERTS = 16  # 4-gon clipped by 4 half-planes yields <= 8; padded for safety


def rotated_box_vertices(boxes: Array) -> Array:
    """[..., 4, 2] corner vertices (CCW) of (cx, cy, w, h, angle_deg) boxes."""
    cx, cy, w, h, a = [boxes[..., i] for i in range(5)]
    theta = a * jnp.pi / 180.0
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    dx = jnp.stack([-w / 2, w / 2, w / 2, -w / 2], -1)
    dy = jnp.stack([-h / 2, -h / 2, h / 2, h / 2], -1)
    # note: y axis points down in image coords; the reference rotates CCW in
    # math convention which matches this rotation matrix
    vx = cx[..., None] + dx * c[..., None] - dy * s[..., None]
    vy = cy[..., None] + dx * s[..., None] + dy * c[..., None]
    return jnp.stack([vx, vy], -1)


def _clip_polygon(verts: Array, count: Array, p1: Array, p2: Array):
    """One Sutherland–Hodgman step: clip (verts [V,2], count) by edge p1->p2.

    Keeps the side to the LEFT of p1->p2 (inside for CCW clipper polygons).
    Returns (new_verts [V,2], new_count) with slots compacted via argsort.
    """
    v = verts
    n = count
    idx = jnp.arange(_MAX_VERTS)
    valid = idx < n
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    cur = v
    nxt_v = v[nxt]

    edge = p2 - p1
    def side(pt):
        rel = pt - p1
        return edge[0] * rel[..., 1] - edge[1] * rel[..., 0]

    s_cur = side(cur)
    s_nxt = side(nxt_v)
    # with this vertex ordering (y-down image coords) the interior has cross > 0
    cur_in = s_cur >= -1e-9
    nxt_in = s_nxt >= -1e-9

    denom = s_cur - s_nxt
    t = jnp.where(jnp.abs(denom) > 1e-12, s_cur / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    inter = cur + t[:, None] * (nxt_v - cur)

    # each input edge can emit: the current point (if inside) and/or the
    # intersection (if the edge crosses the clip line)
    emit_cur = valid & cur_in
    emit_int = valid & (cur_in != nxt_in)

    pts = jnp.concatenate([cur, inter], axis=0)            # [2V, 2]
    flags = jnp.concatenate([emit_cur, emit_int])          # [2V]
    # order: for edge i, current point before intersection; preserve edge order
    order_key = jnp.concatenate([idx * 2, idx * 2 + 1])
    sort_key = jnp.where(flags, order_key, 10_000 + order_key)
    perm = jnp.argsort(sort_key)
    pts_sorted = pts[perm][: _MAX_VERTS]
    new_count = jnp.sum(flags).astype(jnp.int32)
    return pts_sorted, jnp.minimum(new_count, _MAX_VERTS)


def _polygon_area(verts: Array, count: Array) -> Array:
    idx = jnp.arange(_MAX_VERTS)
    valid = idx < count
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    x, y = verts[:, 0], verts[:, 1]
    cross = x * y[nxt] - x[nxt] * y
    return jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0))) / 2.0


def _intersection_area(box1: Array, box2: Array) -> Array:
    """Intersection area of two rotated boxes (each [5])."""
    subject = rotated_box_vertices(box1[None])[0]  # [4, 2]
    clipper = rotated_box_vertices(box2[None])[0]
    verts = jnp.zeros((_MAX_VERTS, 2)).at[:4].set(subject)
    count = jnp.asarray(4, jnp.int32)
    for i in range(4):
        p1 = clipper[i]
        p2 = clipper[(i + 1) % 4]
        verts, count = _clip_polygon(verts, count, p1, p2)
    return _polygon_area(verts, count)


def pairwise_iou_rotated(boxes1: Array, boxes2: Array) -> Array:
    """[N, M] exact IoU between rotated box sets (reference pairwise_iou_rotated)."""
    area1 = boxes1[:, 2] * boxes1[:, 3]
    area2 = boxes2[:, 2] * boxes2[:, 3]
    inter = jax.vmap(lambda b1: jax.vmap(lambda b2: _intersection_area(b1, b2))(boxes2))(
        boxes1
    )
    union = area1[:, None] + area2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms_rotated_mask(boxes: Array, scores: Array, iou_threshold: float, valid=None) -> Array:
    """Greedy rotated NMS; returns keep mask [N] (reference nms_rotated)."""
    n = boxes.shape[0]
    s = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s)
    sorted_boxes = boxes[order]
    iou = pairwise_iou_rotated(sorted_boxes, sorted_boxes)

    def body(i, keep):
        suppress = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & keep[i]
        return keep & ~suppress

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    if valid is not None:
        keep_sorted = keep_sorted & valid[order]
    return jnp.zeros((n,), bool).at[order].set(keep_sorted)
