"""Pallas TPU MSDA backward on the v9 machinery (whole-level VMEM residency).

Replaces the v6 per-level backward pair (ms_deform_attn_pallas.py
_bwd_la_kernel + _bwd_v_kernel) on the training path. The v6 design pays,
per level: two pallas_calls, a host-side block schedule, per-(tile, block)
value-plane DMAs, and a separate recompute of the bilinear selectors in each
kernel. Measured round-4 cost: backward+opt = 272 of a 331 ms train step.

This kernel applies the proven v9 forward schedule ideas to the backward:

- ONE pallas_call for ALL levels and all three gradients. Grid (B*M, tiles).
- Whole-level VMEM residency: each level's value plane arrives as a
  BlockSpec input with index (b, 0, 0) (fetched once per batch*head) and its
  dValue accumulator is an OUTPUT block with the same constant index map —
  Pallas keeps it VMEM-resident across the tile sweep (zeroed at tile 0,
  accumulated via dynamic-row read-modify-write, flushed to HBM once when
  the program moves to the next batch*head).
- In-kernel row-span schedules (same arithmetic as the forward's fused_sched
  branch): no host schedule build, no scalar prefetch at all.
- Selector recompute ONCE per chunk: u and du/dx come from a single MXU
  matmul on the lane-concatenated [rx | drx] selector; dLoc/dAttn reductions
  and the dU = (ry.attn (x) dOut) build run on the VPU in f32.

Derivative convention matches the reference CUDA backward
(ms_deform_im2col_cuda.cuh:238-302) and the jnp oracle: corner-based
subgradients ([at x0+1] - [at x0]), NOT the tent sign — sampling points land
EXACTLY on integer pixels at standard init (reference points are grid
centres), where the two conventions differ.

Gradient semantics validated against jax.grad of the jnp oracle in
tests/test_msda_v9_bwd.py (fwd+bwd gradcheck incl. integer locations, OOB
samples, padded queries).

Layout inversions (kernel layout -> standard layout) are obtained via
jax.vjp of the SAME _v9_prep the forward uses — exact inverses by
construction, and XLA CSEs the shared prep between the fwd and bwd graphs
inside a jitted train step.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .msda_schedule import _LevelMeta
from .ms_deform_attn_pallas_v9 import _v9_prep

Array = jnp.ndarray


def _v9_bwd_kernel(loc_ref, w_ref, g_ref, *rest, meta, D, P, TQ, GSZ, TPP):
    L = len(meta)
    vref = [rest[l] for l in range(L)]
    dloc_ref = rest[L]
    dattn_ref = rest[L + 1]
    dvref = [rest[L + 2 + l] for l in range(L)]
    NG = P // GSZ
    GN = GSZ * TQ
    PTQ = P * TQ

    @pl.when(pl.program_id(1) == 0)
    def _():
        for l in range(L):
            dvref[l][0] = jnp.zeros_like(dvref[l][0])

    for tp in range(TPP):
        tcol = tp * PTQ
        gq = g_ref[0, :, pl.ds(tp * TQ, TQ)].astype(jnp.float32)   # [D, TQ]
        dout = jnp.concatenate([gq] * GSZ, axis=1)                 # [D, GN]

        for l in range(L):
            m = meta[l]
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (m.wpad, GN), 0)
            iota_hb0 = jax.lax.broadcasted_iota(jnp.int32, (m.hb, GN), 0)
            for g in range(NG):
                cols = pl.ds(tcol + g * GN, GN)
                x = loc_ref[0, 2 * l : 2 * l + 1, cols].astype(jnp.float32)
                y = loc_ref[0, 2 * l + 1 : 2 * l + 2, cols].astype(jnp.float32)
                attn = w_ref[0, l : l + 1, cols].astype(jnp.float32)

                x0 = jnp.floor(x)
                tx = x - x0
                x0i = x0.astype(jnp.int32)
                oobx = (x0 < -1e6) | (x0 > 1e6)
                at_x0 = (iota_w == x0i) & ~oobx
                at_x1 = (iota_w == x0i + 1) & ~oobx
                rx = jnp.where(at_x0, 1.0 - tx, 0.0) + jnp.where(at_x1, tx, 0.0)
                drx = jnp.where(at_x1, 1.0, 0.0) - jnp.where(at_x0, 1.0, 0.0)
                rxd = jnp.concatenate([rx, drx], axis=1)           # [wpad, 2GN]
                rx_v = rx.astype(vref[l].dtype)
                rxd_v = rxd.astype(vref[l].dtype)

                y0 = jnp.floor(y)
                ty = y - y0
                y0i = y0.astype(jnp.int32)
                ooby = (y0 < -1e6) | (y0 > 1e6)

                # in-kernel row-span schedule (forward fused_sched semantics)
                y0c = jnp.floor(jnp.clip(y, -2.0 * m.h - 4, 2.0 * m.h + 4))
                v0 = (y0c >= 0.0) & (y0c <= m.h - 1.0)
                v1 = (y0c >= -1.0) & (y0c <= m.h - 2.0)
                lo = jnp.minimum(jnp.where(v0, y0c, float(m.h)),
                                 jnp.where(v1, y0c + 1.0, float(m.h)))
                hi = jnp.maximum(jnp.where(v0, y0c, -1.0),
                                 jnp.where(v1, y0c + 1.0, -1.0))
                rmin_f = jnp.min(lo)
                span = jnp.max(hi) - rmin_f + 1.0
                nch = jnp.where(span > 0.0, jnp.ceil(span / m.hb), 0.0).astype(
                    jnp.int32
                )
                rmin = jnp.clip(rmin_f, 0.0, m.h - 1.0).astype(jnp.int32)

                def chunk(ch, carry, l=l, m=m, rxd_v=rxd_v, rx_v=rx_v,
                          attn=attn, dout=dout, rmin=rmin, y0i=y0i, ty=ty,
                          ooby=ooby, iota_hb0=iota_hb0):
                    da, dx, dy = carry
                    r0 = jnp.clip(rmin + ch * m.hb, 0, m.h - 1)
                    vblk = vref[l][0, pl.ds(r0 * D, m.hb * D), :]
                    ub = jnp.dot(vblk, rxd_v, preferred_element_type=jnp.float32)
                    iota_hb = iota_hb0 + r0
                    at_y0 = (iota_hb == y0i) & ~ooby
                    at_y1 = (iota_hb == y0i + 1) & ~ooby
                    ry = jnp.where(at_y0, 1.0 - ty, 0.0) + jnp.where(at_y1, ty, 0.0)
                    dry = jnp.where(at_y1, 1.0, 0.0) - jnp.where(at_y0, 1.0, 0.0)

                    s_pre = ry[0:1, :] * ub[0:D, 0:GN]
                    sx = ry[0:1, :] * ub[0:D, GN : 2 * GN]
                    sy = dry[0:1, :] * ub[0:D, 0:GN]
                    ryw = ry * attn                                 # [hb, GN]
                    du_rows = [ryw[0:1, :] * dout]
                    for h in range(1, m.hb):
                        uh = ub[h * D : (h + 1) * D, 0:GN]
                        s_pre = s_pre + ry[h : h + 1, :] * uh
                        sx = sx + ry[h : h + 1, :] * ub[h * D : (h + 1) * D, GN : 2 * GN]
                        sy = sy + dry[h : h + 1, :] * uh
                        du_rows.append(ryw[h : h + 1, :] * dout)
                    du = jnp.concatenate(du_rows, axis=0)           # [hb*D, GN]

                    da = da + jnp.sum(s_pre * dout, axis=0, keepdims=True)
                    dx = dx + attn * jnp.sum(sx * dout, axis=0, keepdims=True)
                    dy = dy + attn * jnp.sum(sy * dout, axis=0, keepdims=True)

                    # dV += dU @ Rx^T (contract the sample axis, NT form)
                    dvb = jax.lax.dot_general(
                        du.astype(rx_v.dtype), rx_v,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                               # [hb*D, wpad]
                    cur = dvref[l][0, pl.ds(r0 * D, m.hb * D), :]
                    dvref[l][0, pl.ds(r0 * D, m.hb * D), :] = cur + dvb
                    return (da, dx, dy)

                z = jnp.zeros((1, GN), jnp.float32)
                carry = chunk(0, (z, z, z))
                carry = jax.lax.fori_loop(1, nch, chunk, carry)
                da, dx, dy = carry
                dattn_ref[0, l : l + 1, cols] = da
                dloc_ref[0, 2 * l : 2 * l + 1, cols] = dx
                dloc_ref[0, 2 * l + 1 : 2 * l + 2, cols] = dy


def _backward_v9(spatial_shapes, residuals, g):
    """(dvalue, dloc, dattn) in standard layout. g: [B, Q, M*D] cotangent."""
    value, loc, attn = residuals
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)

    # backward-specific knobs: hb=4 halves the per-chunk selector-matmul rows
    # AND the y-interpolation unroll (trained offsets are local, so the span
    # still fits one chunk); tpp=1 halves the kernel-body unroll (Mosaic
    # compile time) at no measured runtime cost
    hb = int(os.environ.get("VNEXT_MSDA_BWD_HB", "4"))
    tq = int(os.environ.get("VNEXT_MSDA_V9_TQ", "256"))
    gsz = int(os.environ.get("VNEXT_MSDA_V9_GSZ", "4"))
    tpp = int(os.environ.get("VNEXT_MSDA_BWD_TPP", "1"))
    if P % gsz != 0:
        gsz = 1
    # backward meta: ALL levels grouped (the packed layout's dV scatter would
    # need an unpack-merge of the k+1 overlapped row copies; small levels are
    # cheap enough on the grouped path)
    meta = [
        _LevelMeta(h, w, hb, allow_pack=False,
                   wq=int(os.environ.get("VNEXT_MSDA_V9_WQ", "64")))
        for (h, w) in spatial_shapes
    ]

    # VMEM residency guard: value planes (value dtype) + f32 dV accumulators
    # + the [hb*D, 2*gsz*tq] matmul intermediate must fit alongside the
    # loc/attn/cotangent blocks; past the budget fall back to the v6 blocked
    # backward (correct at any size, just slower)
    vsz = jnp.dtype(value.dtype).itemsize
    plane_bytes = sum((m.hpad * D) * m.wpad * (vsz + 4) for m in meta)
    work_bytes = (meta[0].hb * D) * (2 * gsz * tq) * 4 * 2
    budget_mb = float(os.environ.get("VNEXT_MSDA_BWD_VMEM_MB", "11"))
    if plane_bytes + work_bytes > budget_mb * 1024 * 1024:
        from .ms_deform_attn_pallas import _bwd as _bwd_v6

        return _bwd_v6(spatial_shapes, residuals, g)

    bm = B * M
    q_pad = ((Q + tq * tpp - 1) // (tq * tpp)) * (tq * tpp)
    t = q_pad // tq
    ptq = P * tq

    prep = functools.partial(_v9_prep, spatial_shapes=spatial_shapes,
                             meta=meta, tq=tq, tpp=tpp)
    (v_grouped, v_packed, loc_pix, w_T), prep_vjp = jax.vjp(
        lambda v, lo, a: prep(v, sampling_locations=lo, attention_weights=a),
        value, loc, attn,
    )
    assert not v_packed
    loc_pix = loc_pix.reshape(bm, 2 * L, t * ptq)

    # cotangent: [B, Q, M*D] -> [BM, D, q_pad] f32
    g_T = jnp.moveaxis(g.reshape(B, Q, M, D), 1, 3)                  # [B,M,D,Q]
    g_T = g_T.reshape(bm, D, Q).astype(jnp.float32)
    if q_pad != Q:
        g_T = jnp.pad(g_T, ((0, 0), (0, 0), (0, q_pad - Q)))

    tprog = t // tpp
    kernel = functools.partial(
        _v9_bwd_kernel, meta=meta, D=D, P=P, TQ=tq, GSZ=gsz, TPP=tpp,
    )
    grouped_specs = [
        pl.BlockSpec((1, meta[l].hpad * D, meta[l].wpad), lambda b, ti: (b, 0, 0))
        for l in range(L)
    ]
    flops = sum(
        2 * 3 * bm * t * (P // gsz) * meta[l].hb * D * meta[l].wpad * gsz * tq
        for l in range(L)
    )
    dloc_pix, dattn_T, *dv_planes = pl.pallas_call(
        kernel,
        grid=(bm, tprog),
        in_specs=[
            pl.BlockSpec((1, 2 * L, tpp * ptq), lambda b, ti: (b, 0, ti)),
            pl.BlockSpec((1, L, tpp * ptq), lambda b, ti: (b, 0, ti)),
            pl.BlockSpec((1, D, tpp * tq), lambda b, ti: (b, 0, ti)),
        ]
        + grouped_specs,
        out_specs=[
            pl.BlockSpec((1, 2 * L, tpp * ptq), lambda b, ti: (b, 0, ti)),
            pl.BlockSpec((1, L, tpp * ptq), lambda b, ti: (b, 0, ti)),
        ]
        + grouped_specs,
        out_shape=[
            jax.ShapeDtypeStruct((bm, 2 * L, t * ptq), jnp.float32),
            jax.ShapeDtypeStruct((bm, L, t * ptq), jnp.float32),
        ]
        + [
            jax.ShapeDtypeStruct((bm, meta[l].hpad * D, meta[l].wpad), jnp.float32)
            for l in range(L)
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=sum(v.size for v in v_grouped.values()) * 6,
            transcendentals=0,
        ),
        interpret=jax.default_backend() != "tpu",
    )(loc_pix, w_T, g_T, *[v_grouped[l] for l in range(L)])

    # invert the prep relayouts (incl. the *wh loc_pix chain rule) exactly
    dvalue, dloc, dattn = prep_vjp((
        {l: dv_planes[l].astype(v_grouped[l].dtype) for l in range(L)},
        {},
        dloc_pix.reshape(bm, 2 * L, t, P, tq),
        dattn_T.astype(w_T.dtype),
    ))
    return (
        dvalue.astype(value.dtype),
        dloc.astype(loc.dtype),
        dattn.astype(attn.dtype),
    )
