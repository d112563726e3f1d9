"""Pallas TPU MSDA forward v8 — point-group row spans + lane-packed small levels.

v7 (ms_deform_attn_pallas_v7.py) chunks each level by the row span of ALL
TQ*P samples of a query tile. Measured on the real model at eval shapes
(tools/analyze_msda_spans.py), that union span has a heavy tail — coarse-level
query tiles sample into fine levels with dilated footprints — and executes
~1.6 TF per encoder layer, ~7x more selector-matmul rows than the bilinear
corners touch. v8 cuts executed FLOPs ~2.5x with two structural changes:

1. **Point-group spans.** Sampling offsets of nearby point indices are
   concentrated (at the reference init they are constant per head/point, and
   trained offsets stay clustered), so the row span of a *group* of gsz
   points over the tile's queries is far tighter than the 4-point union.
   Columns are laid out point-major per tile ([..., P, TQ] instead of
   [..., TQ, P]) so a group is a contiguous lane range; each (level, group)
   gets its own dynamic-start row-window DMAs and [HB*D, Wpad] x
   [Wpad, gsz*TQ] selector matmuls, with chunk starts rmin + i*HB derived
   in-kernel from a 2-int (rmin, nch) schedule. Measured schedule cost at
   eval shapes: 626 GF/layer (gsz=2, HB=4) vs 1597 GF for v7.

2. **Lane-packed small levels.** Levels with w <= 62 waste most of the
   128-lane contraction. They are repacked as [ceil(h/k)*D, 128] with k+1
   original rows of w+1 zero-separated columns per packed row (one row of
   overlap), so every sample's 4 bilinear corners live in ONE packed row.
   The full bilinear weight (wy*wx*attn) folds into a single 4-nonzero
   column selector; the y step degenerates to a 1-sparse packed-row pick.
   The whole level stays VMEM-resident per (batch*head) — no chunk
   scheduling at all. OOB corners self-mask: invalid rows land in zero
   padding rows, invalid columns in the zero separator column, far-OOB
   samples produce tent weights of zero.

The final P-point reduction happens by accumulating each group's [D, TQ]
contribution directly — the v7 [TQP, TQ] constant-matmul reduction
disappears.

Math is identical to the jnp oracle (reference CUDA op semantics:
ms_deform_im2col_cuda.cuh:34, grid_sample zero padding, align_corners=False).
Used for encoder-scale Q (the dispatcher keeps v7 for the 300-query decoder,
whose scattered references make union spans optimal). Forward-only: the
custom VJP reuses the v6 backward kernels.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

from ..msda_schedule import _PACK_MAX_HP, _LevelMeta  # noqa: F401

def _v8_kernel(
    sched_ref, *rest, meta, D, P, TQ, GSZ, NPROG, TPROG, TPP, NSCHED,
    pipeline, ablate="",
):
    L = len(meta)
    grouped = [l for l, m in enumerate(meta) if not m.packed]
    packed = [l for l, m in enumerate(meta) if m.packed]
    NG = P // GSZ
    GN = GSZ * TQ
    PTQ = P * TQ

    loc_ref, w_ref = rest[0], rest[1]
    vpack_refs = {l: rest[2 + i] for i, l in enumerate(packed)}
    off = 2 + len(packed)
    vhbm_refs = {l: rest[off + i] for i, l in enumerate(grouped)}
    off += len(grouped)
    out_ref = rest[off]
    acc_ref = rest[off + 1]
    vbufs = {l: rest[off + 2 + i] for i, l in enumerate(grouped)}
    sems = {l: rest[off + 2 + len(grouped) + i] for i, l in enumerate(grouped)}

    b = pl.program_id(0)
    tpr = pl.program_id(1)
    pid = b * TPROG + tpr

    def issue(for_pid, slot):
        fb = for_pid // TPROG
        for tp in range(TPP):
            for gi, l in enumerate(grouped):
                m = meta[l]
                for g in range(NG):
                    base = (for_pid * TPP + tp) * NSCHED + (gi * NG + g) * 2
                    rmin = sched_ref[base]
                    nch = sched_ref[base + 1]
                    for ch in range(m.ch):
                        @pl.when(ch < nch)
                        def _(l=l, m=m, tp=tp, g=g, ch=ch, rmin=rmin, fb=fb, slot=slot):
                            r0 = jnp.clip(rmin + ch * m.hb, 0, m.h - 1)
                            pltpu.make_async_copy(
                                vhbm_refs[l].at[fb, pl.ds(r0 * D, m.hb * D), :],
                                vbufs[l].at[slot, tp, g, ch],
                                sems[l].at[slot, tp, g, ch],
                            ).start()

    skip_grouped = ablate in ("nogrouped", "empty")
    skip_packed = ablate in ("nopacked", "empty")

    if skip_grouped:
        slot = 0
    elif pipeline:
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

    for tp in range(TPP):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        tcol = tp * PTQ

        # ---- grouped (chunked) levels: x-selector matmul + tent y-interp ----
        for gi, l in enumerate(grouped if not skip_grouped else []):
            m = meta[l]
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (m.wpad, GN), 0).astype(jnp.float32)
            for g in range(NG):
                cols = pl.ds(tcol + g * GN, GN)
                x = loc_ref[0, 2 * l : 2 * l + 1, cols].astype(jnp.float32)    # [1, GN]
                y = loc_ref[0, 2 * l + 1 : 2 * l + 2, cols].astype(jnp.float32)
                attn = w_ref[0, l : l + 1, cols].astype(jnp.float32)
                # tent selector: exact bilinear x-weights incl. fringe/OOB (v7 proof)
                rx = jnp.maximum(0.0, 1.0 - jnp.abs(x - iota_w))
                base = (pid * TPP + tp) * NSCHED + (gi * NG + g) * 2
                rmin = sched_ref[base]
                nch = sched_ref[base + 1]
                for ch in range(m.ch):
                    @pl.when(ch < nch)
                    def _(l=l, m=m, tp=tp, g=g, ch=ch, rx=rx, y=y, attn=attn, rmin=rmin):
                        pltpu.make_async_copy(
                            vhbm_refs[l].at[0, pl.ds(0, m.hb * D), :],  # shape-only
                            vbufs[l].at[slot, tp, g, ch],
                            sems[l].at[slot, tp, g, ch],
                        ).wait()
                        r0 = jnp.clip(rmin + ch * m.hb, 0, m.h - 1)
                        if pipeline:
                            vblk = jax.lax.cond(
                                slot == 0,
                                lambda: vbufs[l][0, tp, g, ch],
                                lambda: vbufs[l][1, tp, g, ch],
                            )
                        else:
                            vblk = vbufs[l][0, tp, g, ch]
                        u = jnp.dot(
                            vblk, rx.astype(vblk.dtype), preferred_element_type=jnp.float32
                        )                                                     # [hb*D, GN]
                        iota_hb = (
                            jax.lax.broadcasted_iota(jnp.int32, (m.hb, GN), 0) + r0
                        ).astype(jnp.float32)
                        ryw = jnp.maximum(0.0, 1.0 - jnp.abs(y - iota_hb)) * attn
                        terms = [
                            ryw[h : h + 1, :] * u[h * D : (h + 1) * D, :]
                            for h in range(m.hb)
                        ]
                        while len(terms) > 1:
                            terms = [
                                terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i]
                                for i in range(0, len(terms), 2)
                            ]
                        s = terms[0]                                          # [D, GN]
                        for j in range(GSZ):
                            acc_ref[:] += s[:, j * TQ : (j + 1) * TQ]

        # ---- packed levels: 4-weight folded selector + packed-row pick ----
        for l in packed if not skip_packed else []:
            m = meta[l]
            cols = pl.ds(tcol, PTQ)
            x = loc_ref[0, 2 * l : 2 * l + 1, cols].astype(jnp.float32)       # [1, PTQ]
            y = loc_ref[0, 2 * l + 1 : 2 * l + 2, cols].astype(jnp.float32)
            attn = w_ref[0, l : l + 1, cols].astype(jnp.float32)
            y0 = jnp.floor(y)
            ty = y - y0
            r0 = jnp.clip(jnp.floor(y0 / m.k), 0.0, m.hp - 1.0)
            j_lo = y0 - r0 * m.k
            # x outside [-1, w] would tent into a neighboring row-block's real
            # columns: park those samples at an absolute off-grid position.
            x_ok = (x >= -1.0) & (x <= float(m.w))
            xs_lo = jnp.where(x_ok, j_lo * m.wp + x, -10.0)
            xs_hi = jnp.where(x_ok, xs_lo + m.wp, -10.0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, PTQ), 0).astype(jnp.float32)
            rx4 = (
                (1.0 - ty) * jnp.maximum(0.0, 1.0 - jnp.abs(xs_lo - iota_c))
                + ty * jnp.maximum(0.0, 1.0 - jnp.abs(xs_hi - iota_c))
            ) * attn
            vp = vpack_refs[l][0]                                             # [hp*D, 128]
            u = jnp.dot(vp, rx4.astype(vp.dtype), preferred_element_type=jnp.float32)
            s = None
            for rp in range(m.hp):
                mask = (r0 == float(rp)).astype(jnp.float32)                  # [1, PTQ]
                term = mask * u[rp * D : (rp + 1) * D, :]
                s = term if s is None else s + term                           # [D, PTQ]
            for p in range(P):
                acc_ref[:] += s[:, p * TQ : (p + 1) * TQ]

        out_ref[0, :, pl.ds(tp * TQ, TQ)] = acc_ref[:].astype(out_ref.dtype)


from ..msda_schedule import _group_schedule, _pack_level  # noqa: F401


def _forward_v8(value, spatial_shapes, sampling_locations, attention_weights):
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    assert len(spatial_shapes) == L

    hb = int(os.environ.get("VNEXT_MSDA_V8_HB", "4"))
    tq = int(os.environ.get("VNEXT_MSDA_V8_TQ", "256"))
    gsz = int(os.environ.get("VNEXT_MSDA_V8_GSZ", "2"))
    pack = os.environ.get("VNEXT_MSDA_V8_PACK", "1") == "1"
    pipeline = os.environ.get("VNEXT_MSDA_PIPELINE", "1") == "1"
    if P % gsz != 0:
        gsz = 1
    meta = [_LevelMeta(h, w, hb, allow_pack=pack) for h, w in spatial_shapes]
    grouped = [l for l, m in enumerate(meta) if not m.packed]
    packed = [l for l, m in enumerate(meta) if m.packed]

    bm = B * M
    tpp = int(os.environ.get("VNEXT_MSDA_V8_TPP", "2"))
    q_pad = ((Q + tq * tpp - 1) // (tq * tpp)) * (tq * tpp)
    t = q_pad // tq
    ptq = P * tq

    # ---- loc/attn prep: pad then ONE transpose each (these tensors are tens
    # of MB per layer at eval shapes; extra passes showed up as ~2-3 ms/layer)
    loc_p = sampling_locations
    w_p = attention_weights
    if q_pad != Q:
        loc_p = jnp.pad(
            loc_p, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0), (0, 0), (0, 0)),
            constant_values=0.5,
        )
        w_p = jnp.pad(w_p, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0), (0, 0)))
    # [B, q_pad, M, L, P, 2] -> [B, M, L, (x,y), T, P, TQ]
    loc_T = jnp.transpose(loc_p.reshape(B, t, tq, M, L, P, 2), (0, 3, 4, 6, 1, 5, 2))
    wh = np.zeros((1, 1, L, 2, 1, 1, 1), np.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        wh[0, 0, l, 0] = w
        wh[0, 0, l, 1] = h
    loc_pix = (loc_T.astype(jnp.float32) * jnp.asarray(wh) - 0.5).reshape(
        bm, 2 * L, t, P, tq
    )
    w_T = jnp.transpose(w_p.reshape(B, t, tq, M, L, P), (0, 3, 4, 1, 5, 2)).reshape(
        bm, L, t * ptq
    )

    # values: grouped levels in x-matmul HBM layout, packed levels as VMEM
    # blocks — one transpose per level, straight off the [B, S, M, D] input
    v_grouped, v_packed, scheds = {}, {}, []
    start = 0
    for l, ((h, w), m) in enumerate(zip(spatial_shapes, meta)):
        v_l = jax.lax.dynamic_slice_in_dim(value, start, h * w, axis=1)
        start += h * w
        if m.packed:
            v_l = jnp.transpose(v_l, (0, 2, 1, 3)).reshape(bm, h * w, D)
            v_packed[l] = _pack_level(v_l, m, bm, D)
        else:
            # [B, h*w, M, D] -> [B, M, h, D, w] -> [BM, h*D, w]
            vt = jnp.transpose(v_l.reshape(B, h, w, M, D), (0, 3, 1, 4, 2))
            vt = vt.reshape(bm, h * D, w)
            v_grouped[l] = jnp.pad(vt, ((0, 0), (0, (m.hpad - h) * D), (0, m.wpad - w)))
            y_pix = loc_pix[:, 2 * l + 1]
            scheds.append(_group_schedule(y_pix, h, m.hb, m.ch, gsz))
    loc_pix = loc_pix.reshape(bm, 2 * L, t * ptq)
    # flat 1-D scalar-prefetch array: SMEM operands pad the last dim to 128
    # lanes, so any per-program trailing axis would blow the 1MB SMEM budget
    sched = (
        jnp.stack(scheds, axis=1)
        if scheds
        else jnp.zeros((bm * t, 1, P // gsz, 2), jnp.int32)  # dummy: all packed
    )
    nsched = sched.size // (bm * t)
    sched = sched.reshape(-1)

    if os.environ.get("VNEXT_MSDA_V8_ABLATE", "") == "prep":
        # bisection aid: run ONLY the XLA-side prep (full sums defeat DCE;
        # they add one bandwidth pass each — subtract mentally)
        acc = jnp.sum(loc_pix) + jnp.sum(w_T) + jnp.sum(sched.astype(jnp.float32))
        for v in v_packed.values():
            acc += jnp.sum(v.astype(jnp.float32))
        for v in v_grouped.values():
            acc += jnp.sum(v.astype(jnp.float32))
        return jnp.full((B, Q, M * D), acc * 1e-20, value.dtype)

    tprog = t // tpp
    nprog = bm * tprog
    kernel = functools.partial(
        _v8_kernel, meta=meta, D=D, P=P, TQ=tq, GSZ=gsz, NPROG=nprog,
        TPROG=tprog, TPP=tpp, NSCHED=nsched, pipeline=pipeline,
        ablate=os.environ.get("VNEXT_MSDA_V8_ABLATE", ""),
    )
    nslot = 2 if pipeline else 1
    ng = P // gsz

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bm, tprog),
        in_specs=[
            pl.BlockSpec((1, 2 * L, tpp * ptq), lambda b, ti, *_: (b, 0, ti)),
            pl.BlockSpec((1, L, tpp * ptq), lambda b, ti, *_: (b, 0, ti)),
        ]
        + [
            pl.BlockSpec(
                (1, meta[l].hp * D, 128), lambda b, ti, *_, _l=None: (b, 0, 0)
            )
            for l in packed
        ]
        + [pl.BlockSpec(memory_space=pltpu.HBM) for _ in grouped],
        out_specs=pl.BlockSpec((1, D, tpp * tq), lambda b, ti, *_: (b, 0, ti)),
        scratch_shapes=[pltpu.VMEM((D, tq), jnp.float32)]
        + [
            pltpu.VMEM(
                (nslot, tpp, ng, meta[l].ch, meta[l].hb * D, meta[l].wpad),
                value.dtype,
            )
            for l in grouped
        ]
        + [pltpu.SemaphoreType.DMA((nslot, tpp, ng, meta[l].ch)) for l in grouped],
    )

    # typical-case executed flops (locality => ~1 chunk/group/level)
    flops = sum(
        2 * bm * t * ng * meta[l].hb * D * meta[l].wpad * gsz * tq for l in grouped
    ) + sum(2 * bm * t * meta[l].hp * D * 128 * ptq for l in packed)
    bytes_acc = sum(v.size for v in v_grouped.values()) * value.dtype.itemsize + sum(
        v.size for v in v_packed.values()
    ) * value.dtype.itemsize

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, D, q_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        sched,
        loc_pix,
        w_T,
        *[v_packed[l] for l in packed],
        *[v_grouped[l] for l in grouped],
    )

    out = jnp.swapaxes(out, 1, 2)[:, :Q]                        # [BM, Q, D]
    out = out.reshape(B, M, Q, D)
    return jnp.moveaxis(out, 1, 2).reshape(B, Q, M * D).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v8(value, spatial_shapes, sampling_locations, attention_weights):
    """v8 forward; backward reuses the v6 dedicated kernels."""
    return _forward_v8(value, spatial_shapes, sampling_locations, attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward_v8(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    from ..ms_deform_attn_pallas import _bwd as _bwd_v6

    return _bwd_v6(spatial_shapes, residuals, g)


ms_deform_attn_pallas_v8.defvjp(_fwd, _bwd)
