"""Shared MSDA level-schedule machinery (used by the v9 production kernel
and the attic ablation kernels).

_LevelMeta decides per level between the lane-packed layout (small widths:
all 4 bilinear corners of a sample land in one 128-lane packed row) and the
point-group row-chunked layout; _group_schedule computes exact per-point-group
row spans from pixel-space sampling rows; _pack_level builds the packed value
plane. Reference semantics anchor: ms_deform_im2col_cuda.cuh:34 (bilinear
gather over per-level planes).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

_PACK_MAX_HP = 16  # VMEM-residency cap for packed levels (Hp*D*128*2B <= 128KB)


class _LevelMeta:
    """Static per-level schedule: packed-resident or point-group chunked."""

    def __init__(self, h, w, hb, allow_pack=True, wq=128):
        self.h, self.w = h, w
        k = min(128 // (w + 1) - 1, h)
        if allow_pack and k >= 1 and -(-h // k) <= _PACK_MAX_HP:
            self.packed = True
            self.k = k
            self.wp = w + 1
            self.hp = -(-h // k)
        else:
            self.packed = False
            self.hb = min(hb, max(4, ((h + 7) // 8) * 8))
            self.ch = -(-h // self.hb)
            self.hpad = h + self.hb
            # wq=64 (v9): a 64-lane value block halves the x-tent build and
            # the executed matmul flops for levels with w <= 63 (the [*, 64]
            # VMEM tile pads to 128 lanes in memory, but the iota/selector
            # arrays and the dot's K dim shrink); v8's manual DMA path keeps
            # the 128 quantum
            self.wpad = ((w + wq - 1) // wq) * wq



def _group_schedule(y_pix: Array, h: int, hb: int, ch_cap: int, gsz: int):
    """y_pix: [BM, T, P, TQ] pixel-space rows for one level.

    Returns sched [BM*T, P//gsz, 2] int32: (rmin, nch) per point group, with
    chunk i covering rows clip(rmin + i*hb, 0, h-1) .. +hb. Coverage of
    [rmin, rmax] is exact for any offsets (nch <= ceil(h/hb) = ch_cap).
    """
    bm, t, p, tq = y_pix.shape
    yg = y_pix.reshape(bm, t, p // gsz, gsz * tq)
    y0 = jnp.floor(jnp.clip(yg, -2.0 * h - 4, 2.0 * h + 4)).astype(jnp.int32)
    cand = jnp.concatenate([y0, y0 + 1], axis=-1)
    valid = (cand >= 0) & (cand < h)
    rmin = jnp.min(jnp.where(valid, cand, h), axis=-1)
    rmax = jnp.max(jnp.where(valid, cand, -1), axis=-1)
    any_valid = valid.any(axis=-1)
    span = jnp.maximum(rmax - rmin + 1, 0)
    nch = jnp.where(any_valid, -(-span // hb), 0).astype(jnp.int32)
    nch = jnp.minimum(nch, ch_cap)
    sched = jnp.stack([jnp.clip(rmin, 0, h - 1), nch], axis=-1)  # [BM, T, NG, 2]
    return sched.reshape(bm * t, p // gsz, 2)


def _pack_level(v_l: Array, m: _LevelMeta, bm: int, D: int) -> Array:
    """[BM, h*w, D] -> [BM, hp*D, 128] packed layout: packed row rp holds
    original rows rp*k .. rp*k+k (k + 1 overlap row), each padded to w+1
    columns; rows beyond h and the lane tail are zeros."""
    h, w, k, wp, hp = m.h, m.w, m.k, m.wp, m.hp
    v = v_l.reshape(bm, h, w, D)
    v = jnp.pad(v, ((0, 0), (0, hp * k + 1 - h), (0, 1), (0, 0)))  # rows, zero col
    blocks = [v[:, j : j + hp * k : k][:, :hp] for j in range(k + 1)]  # (k+1) x [BM, hp, wp, D]
    arr = jnp.stack(blocks, axis=2)                         # [BM, hp, k+1, wp, D]
    arr = jnp.moveaxis(arr, -1, 2)                          # [BM, hp, D, k+1, wp]
    arr = arr.reshape(bm, hp * D, (k + 1) * wp)
    return jnp.pad(arr, ((0, 0), (0, 0), (0, 128 - (k + 1) * wp)))


