"""Multi-scale deformable attention core (pure jnp reference implementation).

Numerically matches the reference CUDA op / its grid_sample fallback
(projects/IDOL/idol/models/ops/functions/ms_deform_attn_func.py:42
``ms_deform_attn_core_pytorch``): per query, bilinearly sample each of L feature
levels at P offset points per head (align_corners=False, zero padding) and reduce
with softmaxed attention weights.

This file is the *semantic oracle*: the Pallas TPU kernel
(ms_deform_attn_pallas.py) is validated against it, exactly as the reference
validates CUDA against grid_sample (idol/models/ops/test.py:32).

Shapes (all static):
    value:              [B, S, M, D]    S = sum_l H_l*W_l
    spatial_shapes:     static tuple ((H_0, W_0), ...) — python ints, not traced
    sampling_locations: [B, Q, M, L, P, 2]  normalized to [0, 1]
    attention_weights:  [B, Q, M, L, P]  (already softmaxed over L*P)
Returns:
    output:             [B, Q, M*D]
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _level_start_indices(spatial_shapes: Sequence[Tuple[int, int]]):
    starts = []
    acc = 0
    for h, w in spatial_shapes:
        starts.append(acc)
        acc += h * w
    return starts, acc


def ms_deform_attn_core_jnp(
    value: Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: Array,
    attention_weights: Array,
) -> Array:
    """Pure-jnp MSDeformAttn; differentiable via JAX autodiff (gather -> scatter-add)."""
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    starts, total = _level_start_indices(spatial_shapes)
    assert total == S, f"value length {S} != sum of spatial shapes {total}"

    # [B, M, S, D] so per-(batch, head) rows can be gathered with take_along_axis
    value_bm = jnp.moveaxis(value, 2, 1)

    out = jnp.zeros((B, M, Q, D), dtype=value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_bm, starts[lvl], h * w, axis=2)  # [B,M,HW,D]
        # grid_sample(align_corners=False) pixel coords: x = loc_x * W - 0.5
        loc = sampling_locations[:, :, :, lvl]  # [B, Q, M, P, 2]
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        tx = x - x0
        ty = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        acc = None
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0i + dx
            yi = y0i + dy
            wgt = (tx if dx else (1.0 - tx)) * (ty if dy else (1.0 - ty))  # [B,Q,M,P]
            valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # [B,Q,M,P]
            idx_bm = jnp.moveaxis(idx, 2, 1).reshape(B, M, Q * P)  # [B,M,QP]
            g = jnp.take_along_axis(v_l, idx_bm[..., None], axis=2)  # [B,M,QP,D]
            g = g.reshape(B, M, Q, P, D)
            wv = (wgt * valid).astype(value.dtype)
            wv = jnp.moveaxis(wv, 2, 1)  # [B,M,Q,P]
            aw = jnp.moveaxis(attention_weights[:, :, :, lvl], 2, 1).astype(value.dtype)
            contrib = jnp.einsum("bmqp,bmqpd->bmqd", wv * aw, g)
            acc = contrib if acc is None else acc + contrib
        out = out + acc

    return jnp.moveaxis(out, 1, 2).reshape(B, Q, M * D)


def ms_deform_attn_factorized_xla(
    value: Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: Array,
    attention_weights: Array,
    chunk: int = 1024,
) -> Array:
    """Gather-free MSDeformAttn in pure XLA (the Pallas kernel's math, chunked).

    Bilinear sampling is separable: per level, a [rows, H] two-nonzero row
    selector matmul against [H, W*D] produces row-interpolated slabs; a lane-
    masked reduction finishes the column interpolation. XLA materializes the
    intermediate in HBM (unlike the Pallas kernel) so this is bandwidth-bound,
    but it avoids TPU's scalar-loop gather lowering entirely — measured ~7x
    faster than the take_along_axis core at encoder scale. Chunking over queries
    bounds the intermediate size.
    """
    B, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)

    value_bm = jnp.moveaxis(value, 2, 1).reshape(B * M, S, D)
    loc_bm = jnp.moveaxis(sampling_locations, 2, 1).reshape(B * M, Q, L, P, 2)
    w_bm = jnp.moveaxis(attention_weights, 2, 1).reshape(B * M, Q, L, P)

    # Clamp the chunk for small query counts (the 300-query decoder): without
    # this, Q=300 is padded to a full 1024-query chunk, ~3.4x wasted MSDA work
    # on every decoder layer. Sublane-align to 8.
    chunk = min(chunk, -(-Q // 8) * 8)
    n_chunks = -(-Q // chunk)
    q_pad = n_chunks * chunk
    if q_pad != Q:
        loc_bm = jnp.pad(loc_bm, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0), (0, 0)),
                         constant_values=0.5)
        w_bm = jnp.pad(w_bm, ((0, 0), (0, q_pad - Q), (0, 0), (0, 0)))

    cdtype = value.dtype  # bf16 stays bf16 end-to-end: the intermediate is HBM-bound
    out = jnp.zeros((B * M, q_pad, D), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value_bm, start, h * w, axis=1)
        start += h * w
        # contract the W axis first (W >= H for pyramid levels): the [.., H*D]
        # intermediate is smaller than the [.., W*D] one
        v_t = jnp.swapaxes(v_l.reshape(B * M, h, w, D), 1, 2).reshape(B * M, w, h * D)

        loc_l = loc_bm[:, :, lvl].reshape(B * M, n_chunks, chunk * P, 2)
        att_l = w_bm[:, :, lvl].reshape(B * M, n_chunks, chunk * P)

        def level_chunk(carry, idx, v_t=v_t, loc_l=loc_l, att_l=att_l, h=h, w=w):
            loc_c = loc_l[:, idx].astype(jnp.float32)   # [BM, chunk*P, 2]
            att_c = att_l[:, idx].astype(jnp.float32)   # [BM, chunk*P]
            x = loc_c[..., 0] * w - 0.5
            y = loc_c[..., 1] * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            tx = x - x0
            ty = y - y0
            iota_w = jnp.arange(w, dtype=jnp.float32)
            # column selector with the attention weight folded in
            rx = (
                jnp.where(iota_w[None, None] == x0[..., None], (1 - tx)[..., None], 0.0)
                + jnp.where(iota_w[None, None] == x0[..., None] + 1.0, tx[..., None], 0.0)
            ) * att_c[..., None]
            z = jnp.einsum("bqw,bwx->bqx", rx.astype(cdtype), v_t)   # [BM, cP, H*D]
            # row selector stays [BM, cP, H] and broadcasts over D in the
            # consumer — materializing it at H*D (as z's twin) doubles the
            # HBM traffic of this whole op (measured: 77 -> ~45 ms/layer at
            # encoder scale after this change)
            iota_h = jnp.arange(h, dtype=jnp.float32)
            ry = (
                jnp.where(iota_h[None, None] == y0[..., None], (1 - ty)[..., None], 0.0)
                + jnp.where(iota_h[None, None] == y0[..., None] + 1.0, ty[..., None], 0.0)
            ).astype(cdtype)
            prod = z.reshape(z.shape[0], z.shape[1], h, D) * ry[..., None]
            samp = prod.sum(axis=2).astype(jnp.float32)              # [BM, chunk*P, D]
            return carry, samp.reshape(samp.shape[0], chunk, P, D).sum(axis=2)

        # remat: without this, autodiff saves every chunk's [BM, cP, H*D] z slab
        # across the scan (~150 GB at encoder scale in the train step — measured
        # OOM); recomputing z in the backward costs ~2x MSDA FLOPs and nothing
        # in memory.
        _, chunks_out = jax.lax.scan(jax.checkpoint(level_chunk), None,
                                     jnp.arange(n_chunks))
        # chunks_out: [n_chunks, BM, chunk, D]
        out = out + jnp.moveaxis(chunks_out, 0, 1).reshape(B * M, q_pad, D)

    out = out[:, :Q].reshape(B, M, Q, D)
    return jnp.moveaxis(out, 1, 2).reshape(B, Q, M * D).astype(value.dtype)


def sort_queries_by_row(sampling_locations: Array, attention_weights: Array):
    """Permute queries by mean normalized sampling row (per batch element).

    MSDA output is per-query, so any query permutation is exact after the
    inverse gather. Sorting concentrates each kernel query-tile's row span.
    Returns (loc_sorted, attn_sorted, inverse_perm)."""
    key = sampling_locations[..., 1].mean(axis=(2, 3, 4))   # [B, Q]
    perm = jnp.argsort(key, axis=1)
    inv = jnp.argsort(perm, axis=1)
    loc_s = jnp.take_along_axis(
        sampling_locations, perm[:, :, None, None, None, None], axis=1
    )
    attn_s = jnp.take_along_axis(
        attention_weights, perm[:, :, None, None, None], axis=1
    )
    return loc_s, attn_s, inv


def ms_deform_attn_cm(
    valueT: Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    loc_cm: Array,
    attn_cm: Array,
    impl: str = "auto",
) -> Array:
    """Channel-major MSDeformAttn (inference path).

    valueT [B, M*D, S], loc_cm [B, M, L, P, 2, S], attn_cm [B, M, L, P, S];
    returns [B, M*D, S]. On TPU with v9 enabled this feeds the kernel its
    native head-major layout directly (ms_deform_attn_pallas_v9_cm), skipping
    the standard entry's [B, Q, ...] relayouts. Elsewhere it transposes to
    the standard layout and defers to ``ms_deform_attn`` — bit-comparable up
    to the shared f32->value-dtype rounding.
    """
    import os

    use_v9 = (
        impl in ("auto", "pallas_v9")
        and os.environ.get("VNEXT_MSDA_V9", "1") == "1"
        and (jax.default_backend() == "tpu" or impl == "pallas_v9")
    )
    if use_v9:
        from .ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9_cm

        return ms_deform_attn_pallas_v9_cm(valueT, spatial_shapes, loc_cm, attn_cm)

    B, MD, S = valueT.shape
    M = loc_cm.shape[1]
    D = MD // M
    value = jnp.transpose(valueT.reshape(B, M, D, S), (0, 3, 1, 2))
    loc = jnp.moveaxis(loc_cm, 5, 1)
    attn = jnp.moveaxis(attn_cm, 4, 1)
    out = ms_deform_attn(value, spatial_shapes, loc, attn, impl=impl)
    return jnp.swapaxes(out, 1, 2)


def ms_deform_attn_cm_fused(
    valueT: Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    off_cm: Array,
    ref_cm: Array,
    attn_cm: Array,
    impl: str = "auto",
    attn_is_logits: bool = False,
) -> Array:
    """Channel-major MSDeformAttn taking RAW offsets + reference points.

    Semantics: ``loc = ref + off / [w_l, h_l]`` then ``ms_deform_attn_cm`` —
    but on TPU with v9 the location tensor is formed inside the kernel
    (ms_deform_attn_pallas_v9_cm_fused), skipping the [B,M,L,P,2,S] f32
    materialization entirely. off_cm may stay in the compute dtype (bf16):
    it is a projection output, already exactly representable there.

    valueT [B, M*D, S]; off_cm [B, M, L, P, 2, S]; ref_cm [B, L, 2, S];
    attn_cm [B, M, L, P, S] — softmaxed weights, or RAW logits when
    ``attn_is_logits`` (v9 then softmaxes over (L, P) in VMEM; the fallback
    paths softmax here in f32, exactly like the module would).
    Returns [B, M*D, S].
    """
    import os

    use_v9 = (
        impl in ("auto", "pallas_v9")
        and os.environ.get("VNEXT_MSDA_V9", "1") == "1"
        and (jax.default_backend() == "tpu" or impl == "pallas_v9")
    )
    if use_v9:
        from .ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9_cm_fused

        return ms_deform_attn_pallas_v9_cm_fused(
            valueT, spatial_shapes, off_cm, ref_cm, attn_cm,
            attn_is_logits=attn_is_logits,
        )
    if attn_is_logits:
        b, m, l, p, s = attn_cm.shape
        attn_cm = jax.nn.softmax(
            attn_cm.reshape(b, m, l * p, s).astype(jnp.float32), axis=2
        ).astype(valueT.dtype).reshape(b, m, l, p, s)
    wh = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)  # [L, 2]
    loc = (
        ref_cm[:, None, :, None].astype(jnp.float32)
        + off_cm.astype(jnp.float32) / wh[None, None, :, None, :, None]
    )
    return ms_deform_attn_cm(valueT, spatial_shapes, loc, attn_cm, impl=impl)


def ms_deform_attn(
    value: Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: Array,
    attention_weights: Array,
    impl: str = "auto",
) -> Array:
    """Dispatch between the jnp reference, the XLA factorized path and the Pallas kernel."""
    if impl == "jnp":
        return ms_deform_attn_core_jnp(value, spatial_shapes, sampling_locations, attention_weights)
    if impl == "pallas":
        from .ms_deform_attn_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(value, spatial_shapes, sampling_locations, attention_weights)
    if impl == "pallas_v7":
        from .attic.ms_deform_attn_pallas_v7 import ms_deform_attn_pallas_v7

        return ms_deform_attn_pallas_v7(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "pallas_v8":
        from .attic.ms_deform_attn_pallas_v8 import ms_deform_attn_pallas_v8

        return ms_deform_attn_pallas_v8(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "pallas_v9":
        from .ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9

        return ms_deform_attn_pallas_v9(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "auto" and jax.default_backend() == "tpu":
        # 'auto' on TPU: v9 at every query scale. It won the on-device sweeps
        # at encoder scale (whole-level VMEM residency + point-group spans +
        # lane-packed small levels; docs/ROUND3.md "Final on-device sweep"),
        # at decoder scale (1.31 ms/layer vs 2.40 for v7+row-sort at Q=300),
        # and in the train step (331 vs 357 ms/iter vs v7 forward, shared v6
        # backward; round-4 A/B). v7/v8 live in ops/attic/ for ablations —
        # VNEXT_MSDA_V9=0 routes there explicitly.
        import os

        if os.environ.get("VNEXT_MSDA_V9", "1") == "1":
            from .ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9

            return ms_deform_attn_pallas_v9(
                value, spatial_shapes, sampling_locations, attention_weights
            )
        if os.environ.get("VNEXT_MSDA_V8", "0") == "1":
            from .attic.ms_deform_attn_pallas_v8 import ms_deform_attn_pallas_v8

            return ms_deform_attn_pallas_v8(
                value, spatial_shapes, sampling_locations, attention_weights
            )
        from .attic.ms_deform_attn_pallas_v7 import ms_deform_attn_pallas_v7

        q = sampling_locations.shape[1]
        if q <= 1024 and os.environ.get("VNEXT_MSDA_SORT", "1") == "1":
            loc_s, attn_s, inv = sort_queries_by_row(
                sampling_locations, attention_weights
            )
            out = ms_deform_attn_pallas_v7(value, spatial_shapes, loc_s, attn_s)
            return jnp.take_along_axis(out, inv[:, :, None], axis=1)

        return ms_deform_attn_pallas_v7(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "xla":
        return ms_deform_attn_factorized_xla(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    return ms_deform_attn_core_jnp(value, spatial_shapes, sampling_locations, attention_weights)
