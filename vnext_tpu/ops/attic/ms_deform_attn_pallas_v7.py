"""Pallas TPU MSDA forward v7 — level-fused, manual-DMA, exact-span chunks.

v6 (ms_deform_attn_pallas.py) maps (batch*head, query-tile, H-block) onto the
grid, one pallas_call per level: 4 calls/layer and ~22k grid steps at eval
shapes; measured cost is dominated by per-program fixed overhead plus aligned
H-blocks that over-fetch rows. v7 restructures:

- grid = (batch*head, query-tile) ONLY (~2.7k programs at TQ=256): the
  level loop and the row-chunk loop move INSIDE the kernel;
- value levels stay resident in HBM (`memory_space=HBM`); the kernel issues
  `make_async_copy` DMAs for [HB*D, W] row windows at DYNAMIC row starts
  (scalar-prefetched): chunks cover exactly the [row_min, row_max] span each
  tile's samples touch instead of aligned H-blocks, so the typical tile does
  ONE matmul per level with no over-fetch beyond the bilinear halo;
- all DMAs for a program are issued before the first wait, and each program
  additionally prefetches the NEXT program's chunks into a double-buffered
  slot, hiding DMA latency behind compute (software pipelining across
  sequential grid steps — TPU grids execute in order);
- the per-level partial sums accumulate in one VMEM scratch, so the
  cross-level accumulation that was 4 HBM-roundtrips of [BM, Q, D] f32 in v6
  becomes free.

Math is identical to v6 / the jnp oracle (selector-matmul x-interp on the MXU,
sublane-sliced y-interp + attention on the VPU, constant-matmul P-reduction);
zero-padding semantics of grid_sample preserved via out-of-range corner
weights (reference CUDA op: ms_deform_im2col_cuda.cuh:34).

Forward-only: the custom VJP reuses the v6 backward kernels.
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


def _level_meta(spatial_shapes, hb_env):
    """Per level: (H, Wpad, HB, CH, Hpad). HBM lane slices must be 128-aligned,
    so W pads to a multiple of 128 with zero columns — exact, since bilinear
    corners landing in the padding carry zero features (grid_sample
    zero-padding semantics)."""
    meta = []
    for h, w in spatial_shapes:
        hb = min(hb_env, ((h + 7) // 8) * 8)
        ch = (h + hb - 1) // hb
        hpad = h + hb  # dynamic starts in [0, h-1] always fit [start, start+hb)
        wpad = ((w + 127) // 128) * 128
        meta.append((h, wpad, hb, ch, hpad))
    return meta


def _v7_kernel(
    nch_ref, *rest,
    meta, D, P, TQ, L, NPROG, pipeline,
):
    row0_refs = rest[:L]
    loc_ref, w_ref, g3_ref = rest[L], rest[L + 1], rest[L + 2]
    v_refs = rest[L + 3 : L + 3 + L]
    out_ref = rest[L + 3 + L]
    acc_ref = rest[L + 4 + L]
    vbufs = rest[L + 5 + L : L + 5 + 2 * L]
    sems = rest[L + 5 + 2 * L : L + 5 + 3 * L]

    b = pl.program_id(0)
    t = pl.program_id(1)
    T = pl.num_programs(1)
    pid = b * T + t
    TQP = TQ * P

    def issue(for_pid, slot):
        fb = for_pid // T
        for l, (H, W, HB, CH, Hpad) in enumerate(meta):
            n = nch_ref[for_pid * L + l]
            for ch in range(CH):
                @pl.when(ch < n)
                def _(l=l, ch=ch, n=n):
                    r0 = row0_refs[l][for_pid * CH + ch]
                    pltpu.make_async_copy(
                        v_refs[l].at[fb, pl.ds(r0 * D, HB * D), :],
                        vbufs[l].at[slot, ch],
                        sems[l].at[slot, ch],
                    ).start()

    if pipeline:
        slot = jax.lax.rem(pid, 2)

        @pl.when(pid == 0)
        def _():
            issue(0, 0)

        @pl.when(pid + 1 < NPROG)
        def _():
            issue(pid + 1, jax.lax.rem(pid + 1, 2))
    else:
        slot = 0
        issue(pid, 0)

    acc_ref[:] = jnp.zeros_like(acc_ref)

    for l, (H, W, HB, CH, Hpad) in enumerate(meta):
        x = loc_ref[0, 2 * l : 2 * l + 1, :].astype(jnp.float32)      # [1, TQP] pixel
        y = loc_ref[0, 2 * l + 1 : 2 * l + 2, :].astype(jnp.float32)
        attn = w_ref[0, l : l + 1, :].astype(jnp.float32)

        # bilinear corner weights as the tent function max(0, 1-|x-w|):
        # identical to the floor/frac form for every x (integer hits, OOB ->
        # weight 0 at distance >= 1, negative fringe x in (-1,0) weights
        # column 0 by 1+x), with ~40% fewer VPU ops and no int compares
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TQP), 0).astype(jnp.float32)
        rx = jnp.maximum(0.0, 1.0 - jnp.abs(x - iota_w))

        n = nch_ref[pid * L + l]
        for ch in range(CH):
            @pl.when(ch < n)
            def _(l=l, ch=ch, n=n, rx=rx, y=y, attn=attn, H=H, W=W, HB=HB, CH=CH):
                pltpu.make_async_copy(
                    v_refs[l].at[b, pl.ds(0, HB * D), :],  # shape-only for wait
                    vbufs[l].at[slot, ch],
                    sems[l].at[slot, ch],
                ).wait()
                r0 = row0_refs[l][pid * CH + ch]
                if pipeline:
                    vblk = jax.lax.cond(
                        slot == 0,
                        lambda: vbufs[l][0, ch],
                        lambda: vbufs[l][1, ch],
                    )
                else:
                    vblk = vbufs[l][0, ch]
                rxd = rx.astype(vblk.dtype)
                u = jnp.dot(vblk, rxd, preferred_element_type=jnp.float32).astype(
                    vblk.dtype
                )                                              # [HB*D, TQP]
                iota_hb = (
                    jax.lax.broadcasted_iota(jnp.int32, (HB, TQP), 0) + r0
                ).astype(jnp.float32)
                ryw = jnp.maximum(0.0, 1.0 - jnp.abs(y - iota_hb)) * attn  # [HB, TQP]
                # pairwise tree-sum: f32 adds aren't reassociated by the
                # compiler, so a serial chain would hide VPU ILP
                terms = [
                    ryw[h : h + 1, :] * u[h * D : (h + 1) * D, :] for h in range(HB)
                ]
                while len(terms) > 1:
                    terms = [
                        terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
                        for i in range(0, len(terms), 2)
                    ]
                acc_ref[:] += terms[0]

    out_ref[0] = jnp.dot(
        acc_ref[:], g3_ref[:].astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _chunk_schedule(y_pix: Array, H: int, HB: int, CH: int):
    """y_pix: [BM, T, TQP] pixel-space sample rows for one level.

    Returns row0 [BM*T*CH] int32 chunk starts and nch [BM*T] chunk counts.
    Chunks tile [row_min, row_max] (the span of valid bilinear corner rows)
    with stride HB — exact for arbitrary offsets; adversarial spreads fall
    back to ceil(H/HB) chunks.
    """
    y0 = jnp.floor(jnp.clip(y_pix, -2.0 * H - 4, 2.0 * H + 4)).astype(jnp.int32)
    cand = jnp.concatenate([y0, y0 + 1], axis=-1)             # [BM, T, 2*TQP]
    valid = (cand >= 0) & (cand < H)
    rmin = jnp.min(jnp.where(valid, cand, H), axis=-1)        # [BM, T]
    rmax = jnp.max(jnp.where(valid, cand, -1), axis=-1)
    any_valid = valid.any(axis=-1)
    span = jnp.maximum(rmax - rmin + 1, 0)
    nch = jnp.where(any_valid, -(-span // HB), 0).astype(jnp.int32)
    idx = jnp.arange(CH, dtype=jnp.int32)[None, None, :]
    row0 = jnp.clip(rmin[..., None] + idx * HB, 0, H - 1)     # starts ∈ [0, H-1]
    return row0.reshape(-1), nch


def _forward_v7(value, spatial_shapes, sampling_locations, attention_weights):
    import os

    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    assert len(spatial_shapes) == L

    hb_env = int(os.environ.get("VNEXT_MSDA_HB", "16"))
    tq = int(os.environ.get("VNEXT_MSDA_TQ", "256"))
    pipeline = os.environ.get("VNEXT_MSDA_PIPELINE", "1") == "1"
    meta = _level_meta(spatial_shapes, hb_env)

    bm = B * M
    q_pad = ((Q + tq - 1) // tq) * tq
    t = q_pad // tq
    tqp = tq * P

    value_bm = jnp.moveaxis(value, 2, 1).reshape(bm, S, D)
    loc_bm = jnp.moveaxis(sampling_locations, 2, 1).reshape(bm, Q, L, P, 2)
    w_bm = jnp.moveaxis(attention_weights, 2, 1).reshape(bm, Q, L, P)
    if q_pad != Q:
        loc_bm = jnp.pad(
            loc_bm, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0), (0, 0)),
            constant_values=0.5,
        )
        w_bm = jnp.pad(w_bm, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0)))

    # pixel-space loc, interleaved per level: rows 2l = x_l, 2l+1 = y_l
    wh = np.zeros((2 * L, 1), np.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        wh[2 * l, 0] = w
        wh[2 * l + 1, 0] = h
    # [BM, q_pad, L, P, 2] -> [BM, 2L, q_pad*P]
    loc_T = jnp.moveaxis(loc_bm, (2, 4), (1, 2)).reshape(bm, L * 2, q_pad * P)
    loc_pix = loc_T * jnp.asarray(wh) - 0.5
    w_T = jnp.moveaxis(w_bm, 2, 1).reshape(bm, L, q_pad * P)

    g3 = jnp.asarray(
        ((np.arange(tqp)[:, None] // P) == np.arange(tq)[None, :]).astype(np.float32)
    ).astype(value.dtype)

    # per-level value in x-matmul layout [BM, Hpad*D, W] + chunk schedules
    v_levels, row0s, nchs = [], [], []
    start = 0
    for l, ((h, w), (H, W, HB, CH, Hpad)) in enumerate(zip(spatial_shapes, meta)):
        v_l = jax.lax.dynamic_slice_in_dim(value_bm, start, h * w, axis=1)
        v_l = jnp.swapaxes(v_l.reshape(bm, h, w, D), 2, 3).reshape(bm, h * D, w)
        v_l = jnp.pad(v_l, ((0, 0), (0, (Hpad - h) * D), (0, W - w)))
        v_levels.append(v_l)
        y_pix = loc_pix[:, 2 * l + 1, :].reshape(bm, t, tqp)
        r0, nc = _chunk_schedule(y_pix, h, HB, CH)
        row0s.append(r0)
        nchs.append(nc)
        start += h * w
    nch = jnp.stack(nchs, axis=-1).reshape(-1)  # [BM*T*L]

    nprog = bm * t
    kernel = functools.partial(
        _v7_kernel, meta=meta, D=D, P=P, TQ=tq, L=L, NPROG=nprog,
        pipeline=pipeline,
    )
    nslot = 2 if pipeline else 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 + L,
        grid=(bm, t),
        in_specs=[
            pl.BlockSpec((1, 2 * L, tqp), lambda b, ti, *_: (b, 0, ti)),
            pl.BlockSpec((1, L, tqp), lambda b, ti, *_: (b, 0, ti)),
            pl.BlockSpec((tqp, tq), lambda b, ti, *_: (0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in range(L)],
        out_specs=pl.BlockSpec((1, D, tq), lambda b, ti, *_: (b, 0, ti)),
        scratch_shapes=[pltpu.VMEM((D, tqp), jnp.float32)]
        + [
            pltpu.VMEM((nslot, CH, HB * D, W), value.dtype)
            for (H, W, HB, CH, Hpad) in meta
        ]
        + [pltpu.SemaphoreType.DMA((nslot, CH)) for (H, W, HB, CH, Hpad) in meta],
    )

    # typical-case cost (locality => ~1-2 chunks/tile/level) for XLA cost
    # analysis / the bench's MFU accounting
    flops = sum(
        2 * bm * t * min(CH, 2) * HB * D * W * tqp for (H, W, HB, CH, Hpad) in meta
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, D, q_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(v.size for v in v_levels) * value.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(nch, *row0s, loc_pix, w_T, g3, *v_levels)

    out = jnp.swapaxes(out, 1, 2)[:, :Q]                       # [BM, Q, D]
    out = out.reshape(B, M, Q, D)
    return jnp.moveaxis(out, 1, 2).reshape(B, Q, M * D).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v7(value, spatial_shapes, sampling_locations, attention_weights):
    """v7 forward; backward reuses the v6 dedicated kernels."""
    return _forward_v7(value, spatial_shapes, sampling_locations, attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward_v7(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    from ..ms_deform_attn_pallas import _bwd as _bwd_v6

    return _bwd_v6(spatial_shapes, residuals, g)


ms_deform_attn_pallas_v7.defvjp(_fwd, _bwd)
