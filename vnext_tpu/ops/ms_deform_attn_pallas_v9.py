"""Pallas TPU MSDA forward v9 — whole-level VMEM residency, zero manual DMA.

v8 (ms_deform_attn_pallas_v8.py) DMAs a dynamic-start row window per
(level, point-group, chunk) from HBM. At eval shapes that is ~8 small
(32 KB) semaphore-synchronised copies per query tile — ~20k DMAs per layer —
and the measured grouped-level cost (~9 ms/layer) is DMA-latency stalls, not
FLOPs (the executed matmuls are <0.4 TF/layer, <5% MXU busy).

v9 removes the DMA machinery entirely. At eval shapes a level's full value
plane for one (batch, head) is small ([h*D, Wpad] bf16: 512 KB for a
60x100 stride-8 level), so every level is delivered as a regular BlockSpec
input with block index (b, 0, 0): Pallas fetches it ONCE per (batch*head)
program and keeps it VMEM-resident across all query tiles (the index map is
constant in the tile dimension, so the pipeline skips the re-fetch). The
per-chunk row window becomes a dynamic *VMEM* slice `vref[pl.ds(r0*D, hb*D)]`
feeding the selector matmul directly — back-to-back MXU work with no
semaphores, no double-buffer slots, no in-kernel copy scheduling.

Everything else matches v8 (see its docstring for the derivation):
point-group row spans with a host-computed (rmin, nch) schedule in scalar
prefetch, tent-function bilinear x-selectors, lane-packed small levels with
the 4-nonzero folded selector, tree-summed y-interpolation.

Math is identical to the jnp oracle (reference CUDA op semantics:
ms_deform_im2col_cuda.cuh:34, grid_sample zero padding, align_corners=False).
Forward-only: the custom VJP reuses the v6 backward kernels.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .msda_schedule import _LevelMeta, _group_schedule, _pack_level

Array = jnp.ndarray


def _packed_schedule(x_pix: Array, y_pix: Array, m, hpb: int, ng: int):
    """(rmin, nch) window schedule in PACKED-row space for one lane-packed
    level, per point group (group g = points [g*gsz, (g+1)*gsz), mirroring
    _group_schedule's layout) of each query tile. Inactive samples (x or y
    fully out of range) have all-zero selector columns in the kernel, so
    they must not constrain the window. [BM, T, P, TQ] -> [BM*T, NG, 2]."""
    bm, t, p, tq = y_pix.shape
    xf = x_pix.reshape(bm, t, ng, (p // ng) * tq)
    yf = y_pix.reshape(bm, t, ng, (p // ng) * tq)
    yc = jnp.clip(yf, -2.0 * m.h - 4, 2.0 * m.h + 4)
    r0 = jnp.clip(jnp.floor(jnp.floor(yc) / m.k), 0, m.hp - 1).astype(jnp.int32)
    active = (
        (xf >= -1.0) & (xf <= float(m.w)) & (yf >= -1.0) & (yf <= float(m.h))
    )
    rmin = jnp.min(jnp.where(active, r0, m.hp), axis=-1)
    rmax = jnp.max(jnp.where(active, r0, -1), axis=-1)
    span = jnp.maximum(rmax - rmin + 1, 0)
    nch = jnp.where(active.any(axis=-1), -(-span // hpb), 0).astype(jnp.int32)
    sched = jnp.stack([jnp.clip(rmin, 0, m.hp - 1), nch], axis=-1)  # [BM, T, NG, 2]
    return sched.reshape(bm * t, ng, 2)


def _v9_kernel(sched_ref, *rest, meta, D, P, TQ, GSZ, TPP, NSCHED, ablate="",
               fused_loc=False, fused_softmax=False, fused_sched=False,
               carry_acc=False):
    L = len(meta)
    grouped = [l for l, m in enumerate(meta) if not m.packed]
    packed = [l for l, m in enumerate(meta) if m.packed]
    NG = P // GSZ
    GN = GSZ * TQ
    PTQ = P * TQ
    # packed-window schedules sit after the grouped ones, unless the grouped
    # schedules moved in-kernel (fused_sched) and were never built
    sched_lbase = 0 if fused_sched else len(grouped)

    if fused_loc:
        # fused-loc entry: loc_ref holds RAW bf16 sampling offsets (pixel
        # units per level, the projection output untouched) and refp_ref the
        # per-position f32 pixel reference grid (ref*[w,h] - 0.5, no M or P
        # axis). Pixel locations are formed in VMEM per tile — the f32
        # [B,M,L,P,2,S] materialization the standard path pays never exists.
        loc_ref, refp_ref, w_ref = rest[0], rest[1], rest[2]
        base_i = 3
    else:
        loc_ref, w_ref = rest[0], rest[1]
        refp_ref = None
        base_i = 2
    vpack_refs = {l: rest[base_i + i] for i, l in enumerate(packed)}
    off = base_i + len(packed)
    vref = {l: rest[off + i] for i, l in enumerate(grouped)}
    off += len(grouped)
    out_ref = rest[off]
    acc_ref = rest[off + 1]

    b = pl.program_id(0)
    tpr = pl.program_id(1)
    pid = b * pl.num_programs(1) + tpr

    skip_grouped = ablate in ("nogrouped", "empty")
    skip_packed = ablate in ("nopacked", "empty")

    for tp in range(TPP):
        acc_ref[:] = jnp.zeros_like(acc_ref)
        tcol = tp * PTQ

        attn_all = None
        if fused_softmax:
            # in-kernel softmax over the (L, P) axis pair: w_ref holds RAW
            # logits (projection output, bf16). Column layout is p*TQ + q, so
            # the 16-way reduction is an L-row reduce + a P-column-group fold.
            wl = w_ref[0, :, pl.ds(tcol, PTQ)].astype(jnp.float32)  # [L, PTQ]
            m1 = jnp.max(wl, axis=0, keepdims=True)                 # [1, PTQ]
            mq = m1[:, 0:TQ]
            for p_ in range(1, P):
                mq = jnp.maximum(mq, m1[:, p_ * TQ : (p_ + 1) * TQ])
            e = jnp.exp(wl - jnp.concatenate([mq] * P, axis=1))
            s1 = jnp.sum(e, axis=0, keepdims=True)
            sq = s1[:, 0:TQ]
            for p_ in range(1, P):
                sq = sq + s1[:, p_ * TQ : (p_ + 1) * TQ]
            attn_all = e / jnp.concatenate([sq] * P, axis=1)        # [L, PTQ]

        def _attn(l, g=None):
            if attn_all is not None:
                return (attn_all[l : l + 1, :] if g is None
                        else attn_all[l : l + 1, g * GN : (g + 1) * GN])
            cols = pl.ds(tcol if g is None else tcol + g * GN,
                         PTQ if g is None else GN)
            return w_ref[0, l : l + 1, cols].astype(jnp.float32)

        def _xy(l, cols, rep):
            """Pixel-space sampling coords [1, rep*TQ] for level l's columns."""
            x = loc_ref[0, 2 * l : 2 * l + 1, cols].astype(jnp.float32)
            y = loc_ref[0, 2 * l + 1 : 2 * l + 2, cols].astype(jnp.float32)
            if fused_loc:
                qcols = pl.ds(tp * TQ, TQ)
                rx = refp_ref[0, 2 * l : 2 * l + 1, qcols]             # [1, TQ]
                ry = refp_ref[0, 2 * l + 1 : 2 * l + 2, qcols]
                if rep > 1:
                    rx = jnp.concatenate([rx] * rep, axis=1)
                    ry = jnp.concatenate([ry] * rep, axis=1)
                x = x + rx
                y = y + ry
            return x, y

        # ---- grouped levels: x-selector matmul on a dynamic VMEM row slice ----
        def _group_inputs(gi, l, g):
            """Selector + row-span schedule for one (level, point-group)."""
            m = meta[l]
            iota_w = jax.lax.broadcasted_iota(
                jnp.int32, (m.wpad, GN), 0).astype(jnp.float32)
            cols = pl.ds(tcol + g * GN, GN)
            x, y = _xy(l, cols, GSZ)                                   # [1, GN]
            attn = _attn(l, g)
            # tent selector: exact bilinear x-weights incl. fringe/OOB (v7 proof)
            if ablate == "noxsel":            # dev-only: cost of the rx build
                rx = iota_w * 1e-8 + x * 0.0
            else:
                rx = jnp.maximum(0.0, 1.0 - jnp.abs(x - iota_w))
            if fused_sched:
                # in-kernel row-span schedule: same semantics as
                # msda_schedule._group_schedule (cand rows {floor(y),
                # floor(y)+1}, valid iff in [0, h)), computed from the
                # tile's own y values — the XLA-side pixel-coordinate
                # reconstruction + reductions never run
                y0f = jnp.floor(jnp.clip(y, -2.0 * m.h - 4, 2.0 * m.h + 4))
                v0 = (y0f >= 0.0) & (y0f <= m.h - 1.0)
                v1 = (y0f >= -1.0) & (y0f <= m.h - 2.0)
                lo = jnp.minimum(jnp.where(v0, y0f, float(m.h)),
                                 jnp.where(v1, y0f + 1.0, float(m.h)))
                hi = jnp.maximum(jnp.where(v0, y0f, -1.0),
                                 jnp.where(v1, y0f + 1.0, -1.0))
                rmin_f = jnp.min(lo)
                span = jnp.max(hi) - rmin_f + 1.0
                nch = jnp.where(
                    span > 0.0, jnp.ceil(span / m.hb), 0.0
                ).astype(jnp.int32)
                rmin = jnp.clip(rmin_f, 0.0, m.h - 1.0).astype(jnp.int32)
            else:
                base = (pid * TPP + tp) * NSCHED + (gi * NG + g) * 2
                rmin = sched_ref[base]
                nch = sched_ref[base + 1]
            rx_v = rx.astype(vref[l].dtype)
            iota_hb0 = jax.lax.broadcasted_iota(jnp.int32, (m.hb, GN), 0)
            return m, rx_v, y, attn, rmin, nch, iota_hb0

        def _mk_chunk_body(l, m, rx_v, y, attn, rmin, iota_hb0):
            """Chunk computation, SSA-carried: carry -> carry + s_chunk."""

            def chunk_body(ch, carry):
                if ablate == "r0c":           # dev-only: dynamic-slice cost
                    r0 = jnp.int32(0) if isinstance(ch, int) else ch * m.hb
                else:
                    r0 = jnp.clip(rmin + ch * m.hb, 0, m.h - 1)
                vblk = vref[l][0, pl.ds(r0 * D, m.hb * D), :]
                if ablate == "nomm":          # dev-only: cost of the u matmul
                    rep = (m.hb * D) // rx_v.shape[0] + 1
                    u = jnp.concatenate([rx_v.astype(jnp.float32)] * rep, 0)[
                        : m.hb * D
                    ] + vblk[:, 0:1].astype(jnp.float32)
                else:
                    u = jnp.dot(vblk, rx_v, preferred_element_type=jnp.float32)
                if ablate == "noyint":        # dev-only: cost of the y-interp
                    s = u[0:D, :] + u[(m.hb - 1) * D :, :]
                else:
                    iota_hb = (iota_hb0 + r0).astype(jnp.float32)     # [hb, GN]
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
                    s = terms[0]                                      # [D, GN]
                return carry + s

            return chunk_body

        # chunk 0 always runs unconditionally: when nch == 0 every tent
        # weight in the window is zero (no corner lands in [0, h)), so it
        # contributes exact zeros — and the p50 case (nch == 1) then needs no
        # dynamic loop iterations at all.
        if not skip_grouped and grouped and not carry_acc:
            # default: cross-level SSA accumulation. The whole grouped sweep
            # for a point-group carries ONE [D, GN] f32 value through every
            # level's chunk chain, then folds the GSZ lanes and touches
            # acc_ref once — the per-(level, chunk) scratch-ref RMW traffic
            # that the acc1 ablation measured at ~3.8 ms/layer never happens.
            for g in range(NG):
                s_acc = jnp.zeros((D, GN), jnp.float32)
                for gi, l in enumerate(grouped):
                    m, rx_v, y, attn, rmin, nch, iota_hb0 = _group_inputs(gi, l, g)
                    body = _mk_chunk_body(l, m, rx_v, y, attn, rmin, iota_hb0)
                    s_acc = body(0, s_acc)
                    if ablate != "noloop":    # dev-only: dynamic-loop cost
                        s_acc = jax.lax.fori_loop(1, nch, body, s_acc)
                if ablate == "acc1":          # dev-only: accumulator RMW cost
                    acc_ref[:] += s_acc[:, 0:TQ]
                else:
                    for j in range(GSZ):
                        acc_ref[:] += s_acc[:, j * TQ : (j + 1) * TQ]
        elif not skip_grouped:
            # VNEXT_MSDA_V9_CARRY=1: the pre-r5 scratch-RMW structure (one
            # acc_ref update per level/group/chunk) kept for A/B
            for gi, l in enumerate(grouped):
                for g in range(NG):
                    m, rx_v, y, attn, rmin, nch, iota_hb0 = _group_inputs(gi, l, g)
                    body = _mk_chunk_body(l, m, rx_v, y, attn, rmin, iota_hb0)

                    def nc_body(ch, _, body=body):
                        s = body(ch, jnp.float32(0.0))
                        for j in range(GSZ):
                            acc_ref[:] += s[:, j * TQ : (j + 1) * TQ]
                        return 0

                    nc_body(0, 0)
                    jax.lax.fori_loop(1, nch, nc_body, 0)

        # ---- packed levels: 4-weight folded selector + packed-row pick ----
        for pi, l in enumerate(packed if not skip_packed else []):
            m = meta[l]
            cols = pl.ds(tcol, PTQ)
            x, y = _xy(l, cols, P)                                            # [1, PTQ]
            attn = _attn(l)
            y0 = jnp.floor(y)
            ty = y - y0
            r0 = jnp.clip(jnp.floor(y0 / m.k), 0.0, m.hp - 1.0)
            j_lo = y0 - r0 * m.k
            x_ok = (x >= -1.0) & (x <= float(m.w))
            xs_lo = jnp.where(x_ok, j_lo * m.wp + x, -10.0)
            xs_hi = jnp.where(x_ok, xs_lo + m.wp, -10.0)
            iota_c = jax.lax.broadcasted_iota(jnp.int32, (128, PTQ), 0).astype(jnp.float32)
            rx4 = (
                (1.0 - ty) * jnp.maximum(0.0, 1.0 - jnp.abs(xs_lo - iota_c))
                + ty * jnp.maximum(0.0, 1.0 - jnp.abs(xs_hi - iota_c))
            ) * attn
            rx4_v = rx4.astype(vpack_refs[l].dtype)
            hpb = getattr(m, "hpb", 0)
            if hpb and hpb < m.hp:
                # windowed: dynamic hpb-packed-row slice per chunk instead of
                # the full hp-row matmul (inactive samples have all-zero
                # selector columns, so out-of-window rows can't contribute);
                # one window per point group, mirroring the grouped path
                for g in range(NG):
                    base = (
                        (pid * TPP + tp) * NSCHED
                        + ((sched_lbase + pi) * NG + g) * 2
                    )
                    rst = sched_ref[base]
                    nchp = sched_ref[base + 1]
                    rx4_g = rx4_v[:, g * GN : (g + 1) * GN]
                    r0_g = r0[:, g * GN : (g + 1) * GN]

                    def pchunk(ch, _, l=l, m=m, hpb=hpb, g=g, rx4_g=rx4_g,
                               r0_g=r0_g, rst=rst):
                        r0w = jnp.clip(rst + ch * hpb, 0, m.hp - 1)
                        vpw = vpack_refs[l][0, pl.ds(r0w * D, hpb * D), :]
                        u = jnp.dot(vpw, rx4_g, preferred_element_type=jnp.float32)
                        s = None
                        for rp in range(hpb):
                            mask = (r0_g == (r0w + rp).astype(jnp.float32)).astype(
                                jnp.float32
                            )
                            term = mask * u[rp * D : (rp + 1) * D, :]
                            s = term if s is None else s + term               # [D, GN]
                        # fold point-group lanes in SSA, ONE scratch RMW
                        fold = s[:, 0:TQ]
                        for j in range(1, GSZ):
                            fold = fold + s[:, j * TQ : (j + 1) * TQ]
                        acc_ref[:] += fold
                        return 0

                    pchunk(0, 0)
                    jax.lax.fori_loop(1, nchp, pchunk, 0)
            else:
                vp = vpack_refs[l][0]                                         # [hp*D, 128]
                u = jnp.dot(vp, rx4_v, preferred_element_type=jnp.float32)
                s = None
                for rp in range(m.hp):
                    mask = (r0 == float(rp)).astype(jnp.float32)              # [1, PTQ]
                    term = mask * u[rp * D : (rp + 1) * D, :]
                    s = term if s is None else s + term                       # [D, PTQ]
                # fold point lanes in SSA, ONE scratch RMW
                fold = s[:, 0:TQ]
                for p in range(1, P):
                    fold = fold + s[:, p * TQ : (p + 1) * TQ]
                acc_ref[:] += fold

        out_ref[0, :, pl.ds(tp * TQ, TQ)] = acc_ref[:].astype(out_ref.dtype)


def _v9_config(spatial_shapes, P):
    """Env-tunable kernel knobs + per-level schedule metadata."""
    hb = int(os.environ.get("VNEXT_MSDA_V9_HB", "8"))
    tq = int(os.environ.get("VNEXT_MSDA_V9_TQ", "256"))
    gsz = int(os.environ.get("VNEXT_MSDA_V9_GSZ", "4"))
    pack = os.environ.get("VNEXT_MSDA_V9_PACK", "1") == "1"
    tpp = int(os.environ.get("VNEXT_MSDA_V9_TPP", "2"))
    if P % gsz != 0:
        gsz = 1
    # per-level pack override: lane-packing a level whose packing factor k
    # degenerates to 1 (w in (42, 62]) spans hp = h packed rows per selector
    # matmul — for a 30x54 level that is 960 MXU rows/tile vs the grouped
    # path's hb*D = 256, so grouped wins on FLOPs ~3.7x despite wasting
    # (128-w) lanes. Force-group such levels unless overridden.
    nopack_l = {
        int(s)
        for s in os.environ.get("VNEXT_MSDA_V9_NOPACK_L", "auto").split(",")
        if s.strip().isdigit()
    }
    explicit_nopack = os.environ.get("VNEXT_MSDA_V9_NOPACK_L", "auto") != "auto"
    if not explicit_nopack:
        nopack_l = {
            l
            for l, (h, w) in enumerate(spatial_shapes)
            if min(128 // (w + 1) - 1, h) == 1 and h > 8
        }
    meta = [
        _LevelMeta(h, w, hb, allow_pack=pack and l not in nopack_l,
                   wq=int(os.environ.get("VNEXT_MSDA_V9_WQ", "64")))
        for l, (h, w) in enumerate(spatial_shapes)
    ]
    # "winpack" policy (OFF by default — on-device sweep at eval shapes
    # measured 11.38 ms/layer winpack vs 10.55 grouped: the per-window DMA +
    # schedule overhead outweighs the executed-flop cut): a pack-capable
    # level that fell to the grouped path — degenerate packing factor k == 1
    # (w in (42, 62], force-grouped above) or hp over the VMEM-residency cap —
    # can still use the packed layout: all 4 bilinear corners of a sample
    # land in ONE packed row, so the folded 4-nonzero selector applies, as
    # long as the selector matmul is WINDOWED (contracting all hp rows would
    # be far too tall). Set VNEXT_MSDA_V9_K1=winpack to enable.
    if pack and os.environ.get("VNEXT_MSDA_V9_K1", "group") == "winpack":
        k1hpb = int(os.environ.get("VNEXT_MSDA_V9_K1HPB", "4"))
        for l, (h, w) in enumerate(spatial_shapes):
            m = meta[l]
            k = min(128 // (w + 1) - 1, h)
            if m.packed or k < 1 or h <= 8 or (explicit_nopack and l in nopack_l):
                continue
            m.packed, m.k, m.wp, m.hp = True, k, w + 1, -(-h // k)
            m.hpb = min(k1hpb, m.hp)
    # window packed levels whose plane is tall enough that the full-height
    # matmul wastes most rows (hp > hpb): dynamic hpb-row window + schedule
    hpb_cap = int(os.environ.get("VNEXT_MSDA_V9_HPB", "0"))
    for m in meta:
        if not hasattr(m, "hpb"):
            m.hpb = hpb_cap if (m.packed and hpb_cap and m.hp > hpb_cap) else 0
    return tq, gsz, tpp, meta


def _v9_prep(value, spatial_shapes, sampling_locations, attention_weights,
             meta, tq, tpp):
    """Standard-layout -> kernel-layout relayouts (fwd AND bwd share this).

    Returns (v_grouped, v_packed, loc_pix, w_T) where v_* are dicts keyed by
    level. The function is affine in each input, so the backward entry gets
    the exactly-matching inverse relayouts via jax.vjp of this function.
    """
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    bm = B * M
    q_pad = ((Q + tq * tpp - 1) // (tq * tpp)) * (tq * tpp)
    t = q_pad // tq
    ptq = P * tq

    # ---- loc/attn prep: pad then ONE transpose each (v8-identical) ----
    loc_p = sampling_locations
    w_p = attention_weights
    if q_pad != Q:
        loc_p = jnp.pad(
            loc_p, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0), (0, 0), (0, 0)),
            constant_values=0.5,
        )
        w_p = jnp.pad(w_p, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0), (0, 0)))
    if os.environ.get("VNEXT_MSDA_V9_PREP2", "1") == "1":
        # two-stage relayout: (1) clean 2D tile transpose with both minor
        # dims >= 128 (runs near HBM bandwidth), then (2) a major-dim
        # permutation that moves whole tq-length contiguous lines. The
        # direct single transpose leaves the size-2 (x,y) axis minor and
        # XLA executes it ~10x below bandwidth.
        c = M * L * P * 2
        loc_T = jnp.swapaxes(loc_p.reshape(B, t, tq, c), 2, 3)        # [B,t,c,tq]
        loc_T = jnp.transpose(
            loc_T.reshape(B, t, M, L, P, 2, tq), (0, 2, 3, 5, 1, 4, 6)
        )                                                              # [B,M,L,2,t,P,tq]
        wh = np.zeros((1, 1, L, 2, 1, 1, 1), np.float32)
        for l, (h, w) in enumerate(spatial_shapes):
            wh[0, 0, l, 0] = w
            wh[0, 0, l, 1] = h
        loc_pix = (loc_T.astype(jnp.float32) * jnp.asarray(wh) - 0.5).reshape(
            bm, 2 * L, t, P, tq
        )
        w_T = jnp.swapaxes(w_p.reshape(B, t, tq, M * L * P), 2, 3)     # [B,t,MLP,tq]
        w_T = jnp.transpose(
            w_T.reshape(B, t, M, L, P, tq), (0, 2, 3, 1, 4, 5)
        ).reshape(bm, L, t * ptq)
    else:
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

    v_grouped, v_packed = {}, {}
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
    return v_grouped, v_packed, loc_pix, w_T


def _forward_v9(value, spatial_shapes, sampling_locations, attention_weights):
    # dev-only prep ablations (combine with ABLATE=empty): zeroing an input
    # lets XLA constant-fold its entire prep chain (transposes, packing,
    # schedules) while the pallas-call input streaming stays — isolates each
    # prep stage's contribution to the no-compute floor
    zprep = os.environ.get("VNEXT_MSDA_V9_ZPREP", "")
    if "loc" in zprep:
        sampling_locations = jnp.zeros_like(sampling_locations)
        attention_weights = jnp.zeros_like(attention_weights)
    if "val" in zprep:
        value = jnp.zeros_like(value)
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    assert len(spatial_shapes) == L

    tq, gsz, tpp, meta = _v9_config(spatial_shapes, P)

    bm = B * M
    q_pad = ((Q + tq * tpp - 1) // (tq * tpp)) * (tq * tpp)

    v_grouped, v_packed, loc_pix, w_T = _v9_prep(
        value, spatial_shapes, sampling_locations, attention_weights,
        meta, tq, tpp,
    )

    out = _v9_dispatch(
        meta, loc_pix, w_T, v_grouped, v_packed,
        B=B, M=M, D=D, P=P, q_pad=q_pad, tq=tq, gsz=gsz, tpp=tpp,
        out_dtype=value.dtype,
    )

    out = jnp.swapaxes(out, 1, 2)[:, :Q]                        # [BM, Q, D]
    out = out.reshape(B, M, Q, D)
    return jnp.moveaxis(out, 1, 2).reshape(B, Q, M * D).astype(value.dtype)


def _v9_dispatch(
    meta, loc_pix, w_T, v_grouped, v_packed, *, B, M, D, P, q_pad, tq, gsz,
    tpp, out_dtype, refp=None, fused_softmax=False, fused_sched=False,
):
    """Shared kernel-call tail: schedules + grid spec + pallas_call.

    loc_pix: [BM, 2L, t, P, tq] pixel-unit locations; w_T: [BM, L, t*P*tq];
    v_grouped[l]: [BM, hpad*D, wpad]; v_packed[l]: [BM, hp*D, 128].
    Fused-loc mode (refp not None): loc_pix instead holds RAW bf16 offsets in
    the same layout and refp is the [B, 2L, t, tq] f32 pixel reference grid;
    pixel locations are formed in-kernel (loc = ref*wh - 0.5 + off).
    fused_softmax: w_T holds RAW attention logits; the kernel softmaxes over
    (L, P) in VMEM. fused_sched: grouped-level row schedules are computed
    in-kernel from the tile's own y values (no XLA reductions, no scalar
    prefetch for them). Returns [BM, D, q_pad] in out_dtype.
    """
    L = len(meta)
    grouped = [l for l, m in enumerate(meta) if not m.packed]
    packed = [l for l, m in enumerate(meta) if m.packed]
    bm = B * M
    t = q_pad // tq
    ptq = P * tq
    ng = P // gsz

    def _pix(c):
        # channel c (= 2l + xy) of the pixel-space locations, [BM, t, P, tq]
        # f32 — in fused mode reconstructed on the fly for schedule building
        # only (XLA fuses the broadcast+add into the schedule reductions; the
        # big array is never stored)
        if refp is None:
            return loc_pix[:, c]
        r = refp[:, c].reshape(B, 1, t, 1, tq)
        o = loc_pix[:, c].astype(jnp.float32).reshape(B, M, t, P, tq)
        return (o + r).reshape(bm, t, P, tq)

    scheds, p_scheds = [], []
    for l, m in enumerate(meta):
        if m.packed:
            if m.hpb:
                # window may start at hp-1: pad hpb-1 zero packed rows
                v_packed[l] = jnp.pad(
                    v_packed[l], ((0, 0), (0, (m.hpb - 1) * D), (0, 0))
                )
                p_scheds.append(
                    _packed_schedule(_pix(2 * l), _pix(2 * l + 1), m, m.hpb, ng)
                )
            else:
                p_scheds.append(None)
        elif not fused_sched:
            scheds.append(_group_schedule(_pix(2 * l + 1), m.h, m.hb, m.ch, gsz))
    if any(s is not None for s in p_scheds):
        # packed schedules sit at stack positions len(grouped)+pi (kernel
        # contract); non-windowed packed levels get zero placeholders
        scheds += [
            s if s is not None else jnp.zeros((bm * t, ng, 2), jnp.int32)
            for s in p_scheds
        ]
    loc_pix = loc_pix.reshape(bm, 2 * L, t * ptq)
    sched = (
        jnp.stack(scheds, axis=1)
        if scheds
        else jnp.zeros((bm * t, 1, P // gsz, 2), jnp.int32)  # dummy: all packed
    )
    nsched = sched.size // (bm * t)
    sched = sched.reshape(-1)

    tprog = t // tpp
    kernel = functools.partial(
        _v9_kernel, meta=meta, D=D, P=P, TQ=tq, GSZ=gsz, TPP=tpp, NSCHED=nsched,
        ablate=os.environ.get("VNEXT_MSDA_V9_ABLATE", ""),
        fused_loc=refp is not None, fused_softmax=fused_softmax,
        fused_sched=fused_sched,
        carry_acc=os.environ.get("VNEXT_MSDA_V9_CARRY", "0") == "1",
    )

    refp_specs, refp_args = [], []
    if refp is not None:
        refp = refp.reshape(B, 2 * L, t * tq)
        refp_specs = [
            # one block per (batch, tile): all M heads of a batch share it
            pl.BlockSpec((1, 2 * L, tpp * tq), lambda b, ti, *_: (b // M, 0, ti))
        ]
        refp_args = [refp]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bm, tprog),
        in_specs=[
            pl.BlockSpec((1, 2 * L, tpp * ptq), lambda b, ti, *_: (b, 0, ti)),
        ]
        + refp_specs
        + [
            pl.BlockSpec((1, L, tpp * ptq), lambda b, ti, *_: (b, 0, ti)),
        ]
        + [
            # windowed planes carry hpb-1 extra zero packed rows so the last
            # window (start hp-1) stays in-block
            pl.BlockSpec(
                (1, (meta[l].hp + max(meta[l].hpb - 1, 0)) * D, 128),
                lambda b, ti, *_: (b, 0, 0),
            )
            for l in packed
        ]
        + [
            # whole level, VMEM-resident across all tiles of a (batch*head)
            pl.BlockSpec((1, meta[l].hpad * D, meta[l].wpad), lambda b, ti, *_: (b, 0, 0))
            for l in grouped
        ],
        out_specs=pl.BlockSpec((1, D, tpp * tq), lambda b, ti, *_: (b, 0, ti)),
        scratch_shapes=[pltpu.VMEM((D, tq), jnp.float32)],
    )

    # typical-case executed flops (locality => ~1 chunk/group/level)
    flops = sum(
        2 * bm * t * ng * meta[l].hb * D * meta[l].wpad * gsz * tq for l in grouped
    ) + sum(2 * bm * t * meta[l].hp * D * 128 * ptq for l in packed)
    itemsize = jnp.dtype(out_dtype).itemsize
    bytes_acc = (
        sum(v.size for v in v_grouped.values())
        + sum(v.size for v in v_packed.values())
    ) * itemsize

    # write-back in value dtype: the f32 accumulator is cast once either way
    # (here, or after the epilogue transposes) — same final values, half the
    # HBM traffic for the out store + epilogue relayout when value is bf16
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, D, q_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_acc, transcendentals=0
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        sched,
        loc_pix,
        *refp_args,
        w_T,
        *[v_packed[l] for l in packed],
        *[v_grouped[l] for l in grouped],
    )


def ms_deform_attn_pallas_v9_cm(valueT, spatial_shapes, loc_cm, attn_cm):
    """Channel-major v9 forward (inference only, no custom VJP).

    The channel-major encoder (deformable_transformer.py EncoderLayerCM)
    keeps tokens feature-major so the sampling-offset / attention-weight
    projections emit their outputs already head-major — this entry point
    skips the standard path's [B, Q, M*L*P*2] -> head-major relayout (the
    dominant term of the per-layer no-compute floor) and needs only a
    cheap tq-contiguous-line permutation.

    valueT:  [B, M*D, S]   channel-major projected value (padding zeroed)
    loc_cm:  [B, M, L, P, 2, S]  normalized sampling locations
    attn_cm: [B, M, L, P, S]     softmaxed attention weights
    Returns [B, M*D, S] channel-major output (same values as the standard
    entry up to the f32->value-dtype rounding, which both apply).
    """
    zprep = os.environ.get("VNEXT_MSDA_V9_ZPREP", "")   # dev-only ablation
    if "loc" in zprep:
        loc_cm = jnp.zeros_like(loc_cm)
        attn_cm = jnp.zeros_like(attn_cm)
    if "val" in zprep:
        valueT = jnp.zeros_like(valueT)
    B, MD, S = valueT.shape
    _, M, L, P, _, Q = loc_cm.shape
    D = MD // M
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    assert len(spatial_shapes) == L

    tq, gsz, tpp, meta = _v9_config(spatial_shapes, P)
    bm = B * M
    q_pad = ((Q + tq * tpp - 1) // (tq * tpp)) * (tq * tpp)
    t = q_pad // tq

    loc_p, w_p = loc_cm, attn_cm
    if q_pad != Q:
        loc_p = jnp.pad(
            loc_p, ((0, 0),) * 5 + ((0, q_pad - Q),), constant_values=0.5
        )
        w_p = jnp.pad(w_p, ((0, 0),) * 4 + ((0, q_pad - Q),))
    # already head-major: only the (P, t) swap remains, which moves whole
    # tq-length contiguous lines (vs the standard path's minor-axis-2 relayout)
    loc_T = jnp.transpose(
        loc_p.reshape(B, M, L, P, 2, t, tq), (0, 1, 2, 4, 5, 3, 6)
    )                                                          # [B,M,L,2,t,P,tq]
    wh = np.zeros((1, 1, L, 2, 1, 1, 1), np.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        wh[0, 0, l, 0] = w
        wh[0, 0, l, 1] = h
    loc_pix = (loc_T.astype(jnp.float32) * jnp.asarray(wh) - 0.5).reshape(
        bm, 2 * L, t, P, tq
    )
    w_T = jnp.transpose(
        w_p.reshape(B, M, L, P, t, tq), (0, 1, 2, 4, 3, 5)
    ).reshape(bm, L, t * P * tq)

    v_grouped, v_packed = {}, {}
    start = 0
    for l, ((h, w), m) in enumerate(zip(spatial_shapes, meta)):
        v_l = jax.lax.dynamic_slice_in_dim(valueT, start, h * w, axis=2)
        start += h * w
        v_l = v_l.reshape(B, M, D, h, w)
        if m.packed:
            # [B,M,D,h,w] -> [BM, h*w, D] (small levels only; cheap)
            vt = jnp.transpose(v_l.reshape(B, M, D, h * w), (0, 1, 3, 2))
            v_packed[l] = _pack_level(vt.reshape(bm, h * w, D), m, bm, D)
        else:
            # [B,M,D,h,w] -> [B,M,h,D,w] -> [BM, h*D, w]
            vt = jnp.transpose(v_l, (0, 1, 3, 2, 4)).reshape(bm, h * D, w)
            v_grouped[l] = jnp.pad(
                vt, ((0, 0), (0, (m.hpad - h) * D), (0, m.wpad - w))
            )

    out = _v9_dispatch(
        meta, loc_pix, w_T, v_grouped, v_packed,
        B=B, M=M, D=D, P=P, q_pad=q_pad, tq=tq, gsz=gsz, tpp=tpp,
        out_dtype=valueT.dtype,
    )
    # [BM, D, q_pad] -> [B, M*D, Q]: reshape only, no epilogue transpose
    return out.reshape(B, M * D, q_pad)[:, :, :Q]


def ms_deform_attn_pallas_v9_cm_fused(valueT, spatial_shapes, off_cm, ref_cm,
                                      attn_cm, attn_is_logits=False):
    """Channel-major v9 forward with IN-KERNEL sampling-location computation.

    Same math as ms_deform_attn_pallas_v9_cm on
    ``loc = ref + off / [w, h]`` (reference semantics: the sampling_offsets
    projection emits PIXEL-unit offsets per level — ms_deform_attn.py:63 in
    idol/models/ops/modules divides by spatial_shapes), but the [B,M,L,P,2,S]
    f32 location tensor is never materialized: the kernel receives the raw
    (bf16) offsets plus a per-position f32 pixel reference grid (no M or P
    axis, 1/(M·P·2) the size) and forms ``ref*wh - 0.5 + off`` in VMEM per
    tile. Offsets are projection outputs, i.e. already exactly representable
    in the compute dtype — feeding them unwidened loses nothing.

    valueT:  [B, M*D, S];  off_cm: [B, M, L, P, 2, S] (any float dtype);
    ref_cm:  [B, L, 2, S] normalized reference points;
    attn_cm: [B, M, L, P, S] softmaxed attention weights — or RAW logits when
    ``attn_is_logits`` (the kernel then softmaxes over (L, P) in VMEM,
    eliminating the XLA softmax passes entirely).
    Returns [B, M*D, S] channel-major output. Inference-only (no VJP).

    With VNEXT_MSDA_KSCHED=1 the grouped-level row schedules are also
    computed in-kernel (no pixel-coordinate reconstruction or schedule
    reductions staged in XLA at all). Default is 0: the in-model A/B at IDOL
    eval shapes (tools/profile_enc_variants.py, r5) measured the host
    schedules 1.9 ms/clip FASTER (71.4 vs 73.3 ms encoder stage) — the XLA
    schedule reductions overlap the surrounding ops better than the extra
    in-kernel VPU work amortizes — and the fused-sched kernel costs ~10x the
    Mosaic compile time (449 s vs 39 s cold).
    """
    fused_sched = os.environ.get("VNEXT_MSDA_KSCHED", "0") == "1"
    B, MD, S = valueT.shape
    _, M, L, P, _, Q = off_cm.shape
    D = MD // M
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    assert len(spatial_shapes) == L

    tq, gsz, tpp, meta = _v9_config(spatial_shapes, P)
    bm = B * M
    q_pad = ((Q + tq * tpp - 1) // (tq * tpp)) * (tq * tpp)
    t = q_pad // tq

    off_p, w_p, ref_p = off_cm, attn_cm, ref_cm
    if q_pad != Q:
        # pad offsets with 0 and refs with 0.5 (level centre): padded queries
        # sample in-bounds garbage whose output columns are sliced away
        off_p = jnp.pad(off_p, ((0, 0),) * 5 + ((0, q_pad - Q),))
        w_p = jnp.pad(w_p, ((0, 0),) * 4 + ((0, q_pad - Q),))
        ref_p = jnp.pad(ref_p, ((0, 0),) * 3 + ((0, q_pad - Q),),
                        constant_values=0.5)

    # (P, t) swap on the RAW offsets — same tq-contiguous-line permutation as
    # the cm entry but at the offsets' own dtype (half traffic at bf16) and
    # with no arithmetic pass
    off_T = jnp.transpose(
        off_p.reshape(B, M, L, P, 2, t, tq), (0, 1, 2, 4, 5, 3, 6)
    ).reshape(bm, 2 * L, t, P, tq)                              # [BM,2L,t,P,tq]

    wh = np.zeros((1, L, 2, 1, 1), np.float32)
    for l, (h, w) in enumerate(spatial_shapes):
        wh[0, l, 0] = w
        wh[0, l, 1] = h
    refp = (
        ref_p.reshape(B, L, 2, t, tq).astype(jnp.float32) * jnp.asarray(wh) - 0.5
    ).reshape(B, 2 * L, t, tq)

    w_T = jnp.transpose(
        w_p.reshape(B, M, L, P, t, tq), (0, 1, 2, 4, 3, 5)
    ).reshape(bm, L, t * P * tq)

    v_grouped, v_packed = {}, {}
    start = 0
    for l, ((h, w), m) in enumerate(zip(spatial_shapes, meta)):
        v_l = jax.lax.dynamic_slice_in_dim(valueT, start, h * w, axis=2)
        start += h * w
        v_l = v_l.reshape(B, M, D, h, w)
        if m.packed:
            vt = jnp.transpose(v_l.reshape(B, M, D, h * w), (0, 1, 3, 2))
            v_packed[l] = _pack_level(vt.reshape(bm, h * w, D), m, bm, D)
        else:
            vt = jnp.transpose(v_l, (0, 1, 3, 2, 4)).reshape(bm, h * D, w)
            v_grouped[l] = jnp.pad(
                vt, ((0, 0), (0, (m.hpad - h) * D), (0, m.wpad - w))
            )

    out = _v9_dispatch(
        meta, off_T, w_T, v_grouped, v_packed,
        B=B, M=M, D=D, P=P, q_pad=q_pad, tq=tq, gsz=gsz, tpp=tpp,
        out_dtype=valueT.dtype, refp=refp, fused_softmax=attn_is_logits,
        fused_sched=fused_sched,
    )
    return out.reshape(B, M * D, q_pad)[:, :, :Q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v9(value, spatial_shapes, sampling_locations, attention_weights):
    """v9 forward; backward reuses the v6 dedicated kernels."""
    return _forward_v9(value, spatial_shapes, sampling_locations, attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward_v9(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    if os.environ.get("VNEXT_MSDA_BWD", "v9") == "v9":
        from .ms_deform_attn_pallas_v9_bwd import _backward_v9

        return _backward_v9(spatial_shapes, residuals, g)
    from .ms_deform_attn_pallas import _bwd as _bwd_v6

    return _bwd_v6(spatial_shapes, residuals, g)


ms_deform_attn_pallas_v9.defvjp(_fwd, _bwd)
