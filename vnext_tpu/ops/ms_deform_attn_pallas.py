"""Pallas TPU kernel for multi-scale deformable attention.

Why a kernel: XLA lowers the op's 4-corner bilinear gather (millions of random
32-float row reads per layer) to a sequential scalar loop on TPU — measured at
~560 ms per encoder layer on v5e for eval shapes, dominating inference. The
gather-free XLA reformulation (ops/ms_deform_attn.py factorized path) reaches
~75 ms/layer; this kernel reaches ~44 ms/layer.

TPU-first reformulation (no gathers at all): bilinear sampling is separable, so
for one feature level V in [H, W*D]:

    sample(q, p) = Rx[q,p] . (Ry[q,p] @ V)        # Ry: [H], Rx: [W] row selectors

where Ry/Rx each have <= 2 nonzeros (the bilinear corner weights), built densely
with iota comparisons. Out-of-bounds corners get zero weight, exactly
reproducing grid_sample's zero padding (validated against ops/ms_deform_attn.py
and the reference's own CUDA-vs-grid_sample test scheme, idol/models/ops/test.py:32).

Layout choices (learned by ablation on v5e — see docs/ROUND1.md):
- samples live on LANES (everything transposed): the kernel computes
  u^T = V^T @ Ry^T as one MXU matmul with full-lane outputs;
- the column interpolation is a sublane-iota masked multiply;
- the W-group reduction runs as W static SUBLANE slices accumulated with
  native full-lane adds — the naive [TQP, W*D] @ [W*D, D] group-sum matmul is
  N=32-lane-starved and alone cost ~37 ms/layer;
- the P-point reduction is a tiny constant matmul.
- Mosaic constraints honored: integer iota only, no lane<->sublane reshapes
  ((q, p) arrives pre-flattened), no dynamic slices in-kernel.

Backward: custom_vjp delegating to the XLA factorized path's autodiff (already
remat-optimized for training); a dedicated backward kernel (transposed matmuls)
is the remaining optimization.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray

_VMEM_BUDGET = 15 * 1024 * 1024  # bytes for the u^T intermediate (16 MB scoped cap)


def _choose_tile(p: int, w: int, d: int) -> int:
    """Query tile TQ such that the [W*D, TQ*P] f32 intermediate fits VMEM."""
    tq = 256
    while tq > 8 and w * d * tq * p * 4 > _VMEM_BUDGET:
        tq //= 2
    return tq


def _level_kernel(loc_ref, w_ref, value_ref, g3_ref, out_ref, *, H, W, D, P, TQ):
    """One (bm, query-tile) program; transposed layout (samples on lanes).

    loc_ref: [1, 2, TQ*P]   normalized sampling locations, (q, p) pre-flattened
    w_ref:   [1, 1, TQ*P]   attention weights
    value_ref: [1, W*D, H]  level features, transposed
    g3_ref:  [TQ*P, TQ]     constant 0/1 point-sum matrix (i // P == j)
    out_ref: [1, D, TQ]     weighted sampled output (transposed)
    """
    loc = loc_ref[0].astype(jnp.float32)          # [2, TQP]
    attn_row = w_ref[0].astype(jnp.float32)       # [1, TQP]
    x = loc[0:1] * W - 0.5                        # [1, TQP]
    y = loc[1:2] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    # Mosaic requires integer iota; compare in int space (y0 is floor()ed so the
    # cast is exact in range; the guard only kills extreme samples — y0 == -1
    # must still contribute its (y0 + 1 == 0) corner like a float comparison)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, TQ * P), 0)
    y0i = y0.astype(jnp.int32)
    ooby = (y0 < -1e6) | (y0 > 1e6)
    ryT = jnp.where((iota_h == y0i) & ~ooby, 1.0 - ty, 0.0) + jnp.where(
        (iota_h == y0i + 1) & ~ooby, ty, 0.0
    )                                             # [H, TQP]

    vT = value_ref[0]                             # [W*D, H]
    uT = jnp.dot(vT, ryT.astype(vT.dtype), preferred_element_type=jnp.float32)

    # small [W, TQP] column selector — applied per slice inside the reduction
    # loop (building the full [W*D, TQP] rxT costs ~8 ms/layer of pure VPU)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, TQ * P), 0)
    x0i = x0.astype(jnp.int32)
    oobx = (x0 < -1e6) | (x0 > 1e6)
    rxw = (
        jnp.where((iota_w == x0i) & ~oobx, 1.0 - tx, 0.0)
        + jnp.where((iota_w == x0i + 1) & ~oobx, tx, 0.0)
    ) * attn_row                                  # [W, TQP]

    # W-group reduction: static sublane slices, native full-lane multiply-adds
    sampT = rxw[0:1, :] * uT[0:D, :]
    for w in range(1, W):
        sampT = sampT + rxw[w : w + 1, :] * uT[w * D : (w + 1) * D, :]   # [D, TQP]

    outT = jnp.dot(sampT, g3_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32)   # [D, TQ]
    out_ref[0] = outT.astype(out_ref.dtype)


def _sample_level(value_l: Array, loc_l: Array, w_l: Array, H: int, W: int) -> Array:
    """value_l: [BM, H, W*D]; loc_l: [BM, Q, P, 2]; w_l: [BM, Q, P] -> [BM, Q, D]."""
    bm, q, p, _ = loc_l.shape
    d = value_l.shape[-1] // W
    tq = _choose_tile(p, W, d)
    q_pad = ((q + tq - 1) // tq) * tq
    if q_pad != q:
        loc_l = jnp.pad(loc_l, ((0, 0), (0, q_pad - q), (0, 0), (0, 0)), constant_values=0.5)
        w_l = jnp.pad(w_l, ((0, 0), (0, q_pad - q), (0, 0)))

    kernel = functools.partial(_level_kernel, H=H, W=W, D=d, P=p, TQ=tq)
    flops = 2 * bm * q_pad * p * H * W * d

    import numpy as np

    g3 = jnp.asarray(
        ((np.arange(tq * p)[:, None] // p) == np.arange(tq)[None, :]).astype(np.float32)
    )  # [TQ*P, TQ]

    # transposed host-side layouts (XLA transposes, cheap) + pre-flattened (q, p)
    loc_T = jnp.swapaxes(loc_l.reshape(bm, q_pad * p, 2), 1, 2)
    w_T = jnp.swapaxes(w_l.reshape(bm, q_pad * p, 1), 1, 2)
    v_T = jnp.swapaxes(value_l, 1, 2)             # [BM, W*D, H]

    out = pl.pallas_call(
        kernel,
        grid=(bm, q_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 2, tq * p), lambda b, t: (b, 0, t)),
            pl.BlockSpec((1, 1, tq * p), lambda b, t: (b, 0, t)),
            pl.BlockSpec((1, W * d, H), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((tq * p, tq), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, d, tq), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((bm, d, q_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=value_l.size * 2 + loc_l.size * 4, transcendentals=0
        ),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(loc_T, w_T, v_T, g3)
    return jnp.swapaxes(out, 1, 2)[:, :q]


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
    # gradients via the gather-free factorized path's autodiff (remat-optimized;
    # a dedicated backward kernel — transposed matmuls — is the next step)
    from .ms_deform_attn import ms_deform_attn_factorized_xla

    value, loc, attn = residuals
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_factorized_xla(v, spatial_shapes, l, a),
        value, loc, attn,
    )
    return vjp(g.astype(value.dtype))


ms_deform_attn_pallas.defvjp(_fwd, _bwd)
