"""Pallas TPU kernel for multi-scale deformable attention.

Why a kernel: XLA lowers the op's 4-corner bilinear gather (millions of random
32-float row reads per layer) to a sequential scalar loop on TPU — measured at
~560 ms per encoder layer on v5e for eval shapes, dominating inference. The
gather-free XLA reformulation (ops/ms_deform_attn.py factorized path) reaches
~75 ms/layer; the v5 dense kernel ~37 ms/layer; this blocked v6 kernel exploits
sampling locality to skip untouched feature rows entirely.

TPU-first reformulation (no gathers at all): bilinear sampling is separable, so
for one feature level V in [H, W, D]:

    sample(q, p) = Ry[q,p] . (V' @ Rx[q,p])      # Rx: [W], Ry: [H] selectors

where Ry/Rx each have <= 2 nonzeros (the bilinear corner weights), built densely
with iota comparisons. Out-of-bounds corners get zero weight, exactly
reproducing grid_sample's zero padding (validated against ops/ms_deform_attn.py
and the reference's own CUDA-vs-grid_sample test scheme, idol/models/ops/test.py:32).

v6 blocked layout (this file):
- the x-interpolation is the MXU matmul: u = Vblk[(HB*D), W] @ Rx[W, TQP], with
  the W axis as the contraction dim (K=W keeps the systolic pipeline busy) and
  Vblk restricted to an HB-row block of the level;
- the y-interpolation (+ attention weighting) is HB static sublane slices
  accumulated with native full-lane multiply-adds on the VPU, in f32;
- the P-point reduction is a tiny constant matmul applied once per query tile;
- **blocked H with scalar prefetch**: queries are spatially ordered (encoder
  queries ARE the feature-map pixels) and deformable offsets are local in
  trained models, so a 256-query tile touches only 1-2 of the NB row-blocks.
  A host-side pass computes, per (batch*head, tile), the list of touched block
  ids; the grid's inner dimension walks that list (padded by repeating the last
  entry so Pallas elides the duplicate DMA) and predicates compute with
  `j < n_blocks`. Exact for arbitrary offsets — an adversarial offset pattern
  touches all NB blocks and simply runs at the unblocked speed.
- Mosaic constraints honored: integer iota only, no lane<->sublane reshapes
  ((q, p) arrives pre-flattened), no dynamic slices in-kernel.

Backward: two dedicated kernels mirroring the reference's
ms_deform_im2col_cuda.cuh:238-302 backward — a tile-major pass recomputing u
plus a derivative-selector matmul for dLoc/dAttn, and a block-major pass
(dV block resident in VMEM across the tile sweep) for dValue.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_VMEM_BUDGET = 12 * 1024 * 1024  # bytes for the u intermediate (16 MB scoped cap)


def _choose_tile(p: int, hb: int, d: int, itemsize: int = 4) -> int:
    """Query tile TQ such that the [HB*D, TQ*P] u intermediate fits VMEM."""
    tq = 256
    while tq > 8 and hb * d * tq * p * itemsize > _VMEM_BUDGET:
        tq //= 2
    return tq


def _blocked_kernel(
    ids_ref, n_ref, loc_ref, w_ref, value_ref, g3_ref, out_ref, acc_ref, rx_ref,
    *, H, W, D, P, TQ, HB, NB,
):
    """One (bm, query-tile, block) program.

    ids_ref: [BM*T*NB] scalar-prefetch (flat — SMEM pads trailing dims to 128
             lanes, so multi-dim layouts blow the 1 MB SMEM budget) — touched
             block ids, needed-first, padded by repeating the last needed id
             (DMA of repeats is elided)
    n_ref:   [BM*T] scalar-prefetch — number of needed blocks per tile
    loc_ref: [1, 2, TQ*P]    normalized sampling locations, (q, p) pre-flattened
    w_ref:   [1, 1, TQ*P]    attention weights
    value_ref: [1, HB*D, W]  one H-block of level features, (h, d) on sublanes
    g3_ref:  [TQ*P, TQ]      constant 0/1 point-sum matrix (i // P == j)
    out_ref: [1, D, TQ]      weighted sampled output (transposed)
    acc_ref: [D, TQ*P] f32 scratch — accumulates across the block dimension
    rx_ref:  [W, TQ*P] scratch — the x-corner selector; block-INDEPENDENT, so
             it is built once per tile (j == 0) and reused across block visits
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)
    T = pl.num_programs(1)
    n = n_ref[b * T + t]

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        loc = loc_ref[0].astype(jnp.float32)      # [2, TQP]
        x = loc[0:1] * W - 0.5                    # [1, TQP]
        x0 = jnp.floor(x)
        tx = x - x0
        # Mosaic requires integer iota; compare in int space (x0 is floor()ed
        # so the cast is exact in range; the guard only kills extreme samples —
        # x0 == -1 must still contribute its (x0 + 1 == 0) corner)
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TQ * P), 0)
        x0i = x0.astype(jnp.int32)
        oobx = (x0 < -1e6) | (x0 > 1e6)
        rx = jnp.where((iota_w == x0i) & ~oobx, 1.0 - tx, 0.0) + jnp.where(
            (iota_w == x0i + 1) & ~oobx, tx, 0.0
        )                                         # [W, TQP]
        rx_ref[:] = rx.astype(rx_ref.dtype)

    @pl.when(j < n)
    def _():
        h0 = ids_ref[(b * T + t) * NB + j] * HB
        loc = loc_ref[0].astype(jnp.float32)      # [2, TQP]
        attn_row = w_ref[0].astype(jnp.float32)   # [1, TQP]
        y = loc[1:2] * H - 0.5
        y0 = jnp.floor(y)
        ty = y - y0

        vblk = value_ref[0]                       # [HB*D, W]
        # u is materialized in the value dtype: at bf16 this halves the
        # 2 MB/visit VMEM round-trip between the matmul and the y-interp loop
        # (the matmul itself must accumulate f32 — Mosaic requires a 32-bit
        # acc — so the cast happens on the result); f32 models stay exact
        u = jnp.dot(vblk, rx_ref[:], preferred_element_type=jnp.float32).astype(
            vblk.dtype
        )

        # y corner weights within this block, attention folded in (f32 VPU side)
        iota_hb = jax.lax.broadcasted_iota(jnp.int32, (HB, TQ * P), 0) + h0
        y0i = y0.astype(jnp.int32)
        ooby = (y0 < -1e6) | (y0 > 1e6)
        ryw = (
            jnp.where((iota_hb == y0i) & ~ooby, 1.0 - ty, 0.0)
            + jnp.where((iota_hb == y0i + 1) & ~ooby, ty, 0.0)
        ) * attn_row                              # [HB, TQP]

        s = ryw[0:1, :] * u[0:D, :]
        for h in range(1, HB):
            s = s + ryw[h : h + 1, :] * u[h * D : (h + 1) * D, :]   # [D, TQP]
        acc_ref[:] += s

    @pl.when(j == NB - 1)
    def _():
        out_ref[0] = jnp.dot(
            acc_ref[:], g3_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)                   # [D, TQ]


def _block_schedule(y: Array, H: int, HB: int, NB: int, tq: int, p: int):
    """Touched-block bookkeeping on host (cheap XLA ops).

    y: [BM, Q_pad, P] sampling rows in pixel space (already * H - 0.5).
    Returns ids [BM, T, NB] int32 (needed-first, padded with the last needed id
    so repeated DMAs are elided) and n [BM, T] int32.
    """
    bm, q_pad, _ = y.shape
    t = q_pad // tq
    y0 = jnp.floor(jnp.clip(y, -2.0 * H - 4, 2.0 * H + 4)).astype(jnp.int32)
    rows = jnp.stack([y0, y0 + 1], axis=-1).reshape(bm, t, tq * p * 2)
    valid = (rows >= 0) & (rows < H)
    blk = jnp.where(valid, rows // HB, -1)
    needed = (blk[..., None] == jnp.arange(NB)[None, None, None, :]).any(axis=2)
    n = needed.sum(-1).astype(jnp.int32)          # [BM, T]
    order = jnp.argsort(~needed, axis=-1, stable=True).astype(jnp.int32)
    take = jnp.minimum(jnp.arange(NB)[None, None, :], jnp.maximum(n - 1, 0)[..., None])
    ids = jnp.take_along_axis(order, take, axis=-1)
    return ids.reshape(-1), n.reshape(-1)


def _sample_level(value_l: Array, loc_l: Array, w_l: Array, H: int, W: int) -> Array:
    """value_l: [BM, H, W*D]; loc_l: [BM, Q, P, 2]; w_l: [BM, Q, P] -> [BM, Q, D]."""
    import os

    bm, q, p, _ = loc_l.shape
    d = value_l.shape[-1] // W

    hb = min(int(os.environ.get("VNEXT_MSDA_HB", "16")), ((H + 7) // 8) * 8)
    nb = (H + hb - 1) // hb
    h_pad = nb * hb
    itemsize = jnp.dtype(value_l.dtype).itemsize
    tq = min(
        _choose_tile(p, hb, d, itemsize),
        int(os.environ.get("VNEXT_MSDA_TQ", "256")),
    )
    q_pad = ((q + tq - 1) // tq) * tq
    if q_pad != q:
        loc_l = jnp.pad(loc_l, ((0, 0), (0, q_pad - q), (0, 0), (0, 0)), constant_values=0.5)
        w_l = jnp.pad(w_l, ((0, 0), (0, q_pad - q), (0, 0)))
    t = q_pad // tq

    # the P-reduction one-hot in the value dtype (0/1 exact in bf16) keeps its
    # VMEM footprint bounded at TQ=512
    g3 = jnp.asarray(
        ((np.arange(tq * p)[:, None] // p) == np.arange(tq)[None, :]).astype(np.float32)
    ).astype(value_l.dtype)  # [TQ*P, TQ]

    # (h, d) on sublanes, w on lanes: [BM, H, W, D] -> [BM, H*D, W], zero-padded rows
    v_x = jnp.swapaxes(value_l.reshape(bm, H, W, d), 2, 3).reshape(bm, H * d, W)
    if h_pad != H:
        v_x = jnp.pad(v_x, ((0, 0), (0, (h_pad - H) * d), (0, 0)))

    # transposed host-side layouts (XLA transposes, cheap) + pre-flattened (q, p)
    loc_T = jnp.swapaxes(loc_l.reshape(bm, q_pad * p, 2), 1, 2)
    w_T = jnp.swapaxes(w_l.reshape(bm, q_pad * p, 1), 1, 2)

    ids, n = _block_schedule(loc_l[..., 1] * H - 0.5, H, hb, nb, tq, p)

    kernel = functools.partial(
        _blocked_kernel, H=H, W=W, D=d, P=p, TQ=tq, HB=hb, NB=nb
    )
    # average-case cost: locality makes ~2 blocks/tile typical
    flops = 2 * bm * t * min(nb, 2) * hb * d * W * tq * p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bm, t, nb),
        in_specs=[
            pl.BlockSpec((1, 2, tq * p), lambda b, ti, j, ids_r, n_r: (b, 0, ti)),
            pl.BlockSpec((1, 1, tq * p), lambda b, ti, j, ids_r, n_r: (b, 0, ti)),
            pl.BlockSpec(
                (1, hb * d, W),
                lambda b, ti, j, ids_r, n_r: (b, ids_r[(b * t + ti) * nb + j], 0),
            ),
            pl.BlockSpec((tq * p, tq), lambda b, ti, j, ids_r, n_r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, tq), lambda b, ti, j, ids_r, n_r: (b, 0, ti)),
        scratch_shapes=[
            pltpu.VMEM((d, tq * p), jnp.float32),
            pltpu.VMEM((W, tq * p), value_l.dtype),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, d, q_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=value_l.size * 2 + loc_l.size * 4, transcendentals=0
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(ids, n, loc_T, w_T, v_x, g3)
    return jnp.swapaxes(out, 1, 2)[:, :q]


def _bwd_la_kernel(
    ids_ref, n_ref, loc_ref, w_ref, value_ref, g_ref, g3_ref,
    dloc_ref, dattn_ref, dx_acc, dy_acc, da_acc,
    *, H, W, D, P, TQ, HB, NB,
):
    """Backward kernel 1 (tile-major): dLoc and dAttn.

    Per (bm, tile, block) visit, recompute u = Vblk @ Rx plus the derivative
    pass u' = Vblk @ dRx/dx (reference backward's derivative selectors:
    ms_deform_im2col_cuda.cuh:238-302), then reduce on the VPU:
        dAttn = sum_d s_pre * dOut        (s_pre: attn-free forward)
        dx    = attn * W * sum_d (Ry . u') * dOut
        dy    = attn * H * sum_d (dRy/dy . u) * dOut
    g_ref: [1, D, TQ] output cotangent (pre P-broadcast).
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)
    T = pl.num_programs(1)
    n = n_ref[b * T + t]

    @pl.when(j == 0)
    def _():
        dx_acc[:] = jnp.zeros_like(dx_acc)
        dy_acc[:] = jnp.zeros_like(dy_acc)
        da_acc[:] = jnp.zeros_like(da_acc)

    @pl.when(j < n)
    def _():
        h0 = ids_ref[(b * T + t) * NB + j] * HB
        loc = loc_ref[0].astype(jnp.float32)
        x = loc[0:1] * W - 0.5
        y = loc[1:2] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TQ * P), 0)
        x0i = x0.astype(jnp.int32)
        oobx = (x0 < -1e6) | (x0 > 1e6)
        at_x0 = (iota_w == x0i) & ~oobx
        at_x1 = (iota_w == x0i + 1) & ~oobx
        rx = jnp.where(at_x0, 1.0 - tx, 0.0) + jnp.where(at_x1, tx, 0.0)
        drx = jnp.where(at_x1, 1.0, 0.0) - jnp.where(at_x0, 1.0, 0.0)

        vblk = value_ref[0]
        u = jnp.dot(vblk, rx.astype(vblk.dtype), preferred_element_type=jnp.float32)
        ux = jnp.dot(vblk, drx.astype(vblk.dtype), preferred_element_type=jnp.float32)

        iota_hb = jax.lax.broadcasted_iota(jnp.int32, (HB, TQ * P), 0) + h0
        y0i = y0.astype(jnp.int32)
        ooby = (y0 < -1e6) | (y0 > 1e6)
        at_y0 = (iota_hb == y0i) & ~ooby
        at_y1 = (iota_hb == y0i + 1) & ~ooby
        ry = jnp.where(at_y0, 1.0 - ty, 0.0) + jnp.where(at_y1, ty, 0.0)
        dry = jnp.where(at_y1, 1.0, 0.0) - jnp.where(at_y0, 1.0, 0.0)

        # dOut broadcast over P: contract [D, TQ] with g3 [TQP, TQ] on TQ
        # (dot_general "NT" form — no in-kernel transpose, Mosaic-friendly)
        dout = jax.lax.dot_general(
            g_ref[0].astype(jnp.float32), g3_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D, TQP]

        s_pre = ry[0:1, :] * u[0:D, :]
        sx = ry[0:1, :] * ux[0:D, :]
        sy = dry[0:1, :] * u[0:D, :]
        for h in range(1, HB):
            s_pre = s_pre + ry[h : h + 1, :] * u[h * D : (h + 1) * D, :]
            sx = sx + ry[h : h + 1, :] * ux[h * D : (h + 1) * D, :]
            sy = sy + dry[h : h + 1, :] * u[h * D : (h + 1) * D, :]

        attn_row = w_ref[0].astype(jnp.float32)  # [1, TQP]
        da_acc[:] += jnp.sum(s_pre * dout, axis=0, keepdims=True)
        dx_acc[:] += attn_row * float(W) * jnp.sum(sx * dout, axis=0, keepdims=True)
        dy_acc[:] += attn_row * float(H) * jnp.sum(sy * dout, axis=0, keepdims=True)

    @pl.when(j == NB - 1)
    def _():
        dloc_ref[0, 0:1] = dx_acc[:].astype(dloc_ref.dtype)
        dloc_ref[0, 1:2] = dy_acc[:].astype(dloc_ref.dtype)
        dattn_ref[0] = da_acc[:].astype(dattn_ref.dtype)


def _bwd_v_kernel(
    need_ref, loc_ref, w_ref, g_ref, g3_ref, dv_ref, du_scratch,
    *, H, W, D, P, TQ, HB, NB, MM_DTYPE,
):
    """Backward kernel 2 (block-major): dValue.

    Grid (bm, block, tile): the dV block stays resident in VMEM across the
    tile sweep; per touched tile, build dU = Ryw (x) dOut on the VPU, then one
    transposed matmul dV += dU @ Rx^T.
    need_ref: [BM*NB*T] scalar-prefetch 0/1 — tile touches block.
    """
    b = pl.program_id(0)
    jb = pl.program_id(1)
    t = pl.program_id(2)
    T = pl.num_programs(2)

    @pl.when(t == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    @pl.when(need_ref[(b * NB + jb) * T + t] > 0)
    def _():
        h0 = jb * HB
        loc = loc_ref[0].astype(jnp.float32)
        attn_row = w_ref[0].astype(jnp.float32)
        x = loc[0:1] * W - 0.5
        y = loc[1:2] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TQ * P), 0)
        x0i = x0.astype(jnp.int32)
        oobx = (x0 < -1e6) | (x0 > 1e6)
        rx = jnp.where((iota_w == x0i) & ~oobx, 1.0 - tx, 0.0) + jnp.where(
            (iota_w == x0i + 1) & ~oobx, tx, 0.0
        )

        iota_hb = jax.lax.broadcasted_iota(jnp.int32, (HB, TQ * P), 0) + h0
        y0i = y0.astype(jnp.int32)
        ooby = (y0 < -1e6) | (y0 > 1e6)
        ryw = (
            jnp.where((iota_hb == y0i) & ~ooby, 1.0 - ty, 0.0)
            + jnp.where((iota_hb == y0i + 1) & ~ooby, ty, 0.0)
        ) * attn_row

        dout = jax.lax.dot_general(
            g_ref[0].astype(jnp.float32), g3_ref[:].astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D, TQP]

        for h in range(HB):
            du_scratch[h * D : (h + 1) * D, :] = ryw[h : h + 1, :] * dout

        # dV += dU @ Rx^T, contracted on the sample axis (NT form)
        dv_ref[0] += jax.lax.dot_general(
            du_scratch[:].astype(MM_DTYPE), rx.astype(MM_DTYPE),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)


def _sample_level_bwd(value_l, loc_l, w_l, g_l, H: int, W: int):
    """Gradients for one level. value_l: [BM, H, W*D]; loc_l: [BM, Q, P, 2];
    w_l: [BM, Q, P]; g_l: [BM, Q, D] -> (dvalue_l, dloc_l, dw_l)."""
    import os

    bm, q, p, _ = loc_l.shape
    d = value_l.shape[-1] // W

    hb = min(int(os.environ.get("VNEXT_MSDA_HB", "16")), ((H + 7) // 8) * 8)
    nb = (H + hb - 1) // hb
    h_pad = nb * hb
    tq = min(_choose_tile(p, hb, d), int(os.environ.get("VNEXT_MSDA_TQ", "256")))
    q_pad = ((q + tq - 1) // tq) * tq
    if q_pad != q:
        loc_l = jnp.pad(loc_l, ((0, 0), (0, q_pad - q), (0, 0), (0, 0)), constant_values=0.5)
        w_l = jnp.pad(w_l, ((0, 0), (0, q_pad - q), (0, 0)))
        g_l = jnp.pad(g_l, ((0, 0), (0, q_pad - q), (0, 0)))
    t = q_pad // tq

    g3 = jnp.asarray(
        ((np.arange(tq * p)[:, None] // p) == np.arange(tq)[None, :]).astype(np.float32)
    )

    v_x = jnp.swapaxes(value_l.reshape(bm, H, W, d), 2, 3).reshape(bm, H * d, W)
    if h_pad != H:
        v_x = jnp.pad(v_x, ((0, 0), (0, (h_pad - H) * d), (0, 0)))

    loc_T = jnp.swapaxes(loc_l.reshape(bm, q_pad * p, 2), 1, 2)
    w_T = jnp.swapaxes(w_l.reshape(bm, q_pad * p, 1), 1, 2)
    g_T = jnp.swapaxes(g_l, 1, 2)  # [BM, D, q_pad]

    ids, n = _block_schedule(loc_l[..., 1] * H - 0.5, H, hb, nb, tq, p)

    # ---- kernel 1: dLoc + dAttn (tile-major)
    la_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bm, t, nb),
        in_specs=[
            pl.BlockSpec((1, 2, tq * p), lambda b, ti, j, i_r, n_r: (b, 0, ti)),
            pl.BlockSpec((1, 1, tq * p), lambda b, ti, j, i_r, n_r: (b, 0, ti)),
            pl.BlockSpec(
                (1, hb * d, W),
                lambda b, ti, j, i_r, n_r: (b, i_r[(b * t + ti) * nb + j], 0),
            ),
            pl.BlockSpec((1, d, tq), lambda b, ti, j, i_r, n_r: (b, 0, ti)),
            pl.BlockSpec((tq * p, tq), lambda b, ti, j, i_r, n_r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, tq * p), lambda b, ti, j, i_r, n_r: (b, 0, ti)),
            pl.BlockSpec((1, 1, tq * p), lambda b, ti, j, i_r, n_r: (b, 0, ti)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tq * p), jnp.float32),
            pltpu.VMEM((1, tq * p), jnp.float32),
            pltpu.VMEM((1, tq * p), jnp.float32),
        ],
    )
    la_kernel = functools.partial(
        _bwd_la_kernel, H=H, W=W, D=d, P=p, TQ=tq, HB=hb, NB=nb
    )
    dloc_T, dattn_T = pl.pallas_call(
        la_kernel,
        grid_spec=la_grid,
        out_shape=[
            jax.ShapeDtypeStruct((bm, 2, q_pad * p), jnp.float32),
            jax.ShapeDtypeStruct((bm, 1, q_pad * p), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(ids, n, loc_T, w_T, v_x, g_T, g3)

    # ---- kernel 2: dValue (block-major; dV block resident across tile sweep)
    y = loc_l[..., 1] * H - 0.5
    y0 = jnp.floor(jnp.clip(y, -2.0 * H - 4, 2.0 * H + 4)).astype(jnp.int32)
    rows = jnp.stack([y0, y0 + 1], -1).reshape(bm, t, tq * p * 2)
    valid = (rows >= 0) & (rows < H)
    blk = jnp.where(valid, rows // hb, -1)
    need = (
        (blk[:, :, :, None] == jnp.arange(nb)[None, None, None, :])
        .any(axis=2)
        .astype(jnp.int32)
    )  # [BM, T, NB]
    need = jnp.swapaxes(need, 1, 2).reshape(-1)  # [BM*NB*T]

    v_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bm, nb, t),
        in_specs=[
            pl.BlockSpec((1, 2, tq * p), lambda b, jb, ti, n_r: (b, 0, ti)),
            pl.BlockSpec((1, 1, tq * p), lambda b, jb, ti, n_r: (b, 0, ti)),
            pl.BlockSpec((1, d, tq), lambda b, jb, ti, n_r: (b, 0, ti)),
            pl.BlockSpec((tq * p, tq), lambda b, jb, ti, n_r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb * d, W), lambda b, jb, ti, n_r: (b, jb, 0)),
        scratch_shapes=[pltpu.VMEM((hb * d, tq * p), jnp.float32)],
    )
    v_kernel = functools.partial(
        _bwd_v_kernel, H=H, W=W, D=d, P=p, TQ=tq, HB=hb, NB=nb,
        MM_DTYPE=value_l.dtype,
    )
    dv_x = pl.pallas_call(
        v_kernel,
        grid_spec=v_grid,
        out_shape=jax.ShapeDtypeStruct((bm, h_pad * d, W), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(need, loc_T, w_T, g_T, g3)

    # undo the value layout: [BM, H_pad*D, W] -> [BM, H, W*D]
    dv = dv_x[:, : H * d].reshape(bm, H, d, W)
    dv = jnp.swapaxes(dv, 2, 3).reshape(bm, H, W * d)

    dloc = jnp.swapaxes(dloc_T, 1, 2).reshape(bm, q_pad, p, 2)[:, :q]
    dattn = jnp.swapaxes(dattn_T, 1, 2).reshape(bm, q_pad, p)[:, :q]
    return dv, dloc, dattn


def _forward(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)

    value_bm = jnp.moveaxis(value, 2, 1).reshape(B * M, S, D)
    loc_bm = jnp.moveaxis(sampling_locations, 2, 1).reshape(B * M, Q, L, P, 2)
    w_bm = jnp.moveaxis(attention_weights, 2, 1).reshape(B * M, Q, L, P)

    out = jnp.zeros((B * M, Q, D), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_bm, start, h * w, axis=1)
        v_l = v_l.reshape(B * M, h, w * D)
        out = out + _sample_level(v_l, loc_bm[:, :, lvl], w_bm[:, :, lvl], h, w)
        start += h * w

    out = out.reshape(B, M, Q, D)
    return jnp.moveaxis(out, 1, 2).reshape(B, Q, M * D).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights):
    """Drop-in replacement for ms_deform_attn_core_jnp on TPU (forward kernel)."""
    return _forward(value, spatial_shapes, sampling_locations, attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    """Dedicated backward kernels (reference: ms_deform_im2col_cuda.cuh:238
    ms_deformable_col2im_* — dV scatter + dLoc/dAttn derivative passes)."""
    value, loc, attn = residuals
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)

    value_bm = jnp.moveaxis(value, 2, 1).reshape(B * M, S, D)
    loc_bm = jnp.moveaxis(loc, 2, 1).reshape(B * M, Q, L, P, 2)
    w_bm = jnp.moveaxis(attn, 2, 1).reshape(B * M, Q, L, P)
    # cotangent [B, Q, M*D] -> [BM, Q, D]
    g_bm = jnp.moveaxis(g.reshape(B, Q, M, D), 2, 1).reshape(B * M, Q, D)
    g_bm = g_bm.astype(jnp.float32)

    dv_parts, dloc_parts, dw_parts = [], [], []
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_bm, start, h * w, axis=1)
        v_l = v_l.reshape(B * M, h, w * D)
        dv_l, dloc_l, dw_l = _sample_level_bwd(
            v_l, loc_bm[:, :, lvl], w_bm[:, :, lvl], g_bm, h, w
        )
        dv_parts.append(dv_l.reshape(B * M, h * w, D))
        dloc_parts.append(dloc_l)
        dw_parts.append(dw_l)
        start += h * w

    dvalue = jnp.concatenate(dv_parts, axis=1).reshape(B, M, S, D)
    dvalue = jnp.moveaxis(dvalue, 1, 2).astype(value.dtype)
    dloc = jnp.stack(dloc_parts, axis=2).reshape(B, M, Q, L, P, 2)
    dloc = jnp.moveaxis(dloc, 1, 2).astype(loc.dtype)
    dw = jnp.stack(dw_parts, axis=2).reshape(B, M, Q, L, P)
    dw = jnp.moveaxis(dw, 1, 2).astype(attn.dtype)
    return dvalue, dloc, dw


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
