"""Deformable transformer (flax) — the IDOL/SeqFormer detection trunk.

Capability parity with idol/models/deformable_transformer.py:28 and the MSDeformAttn
module (idol/models/ops/modules/ms_deform_attn.py:30), rebuilt TPU-first:

- all spatial shapes are static python tuples — the whole transformer jits once;
- the sampling/weighting core runs through vnext_tpu.ops.ms_deform_attn (pure-jnp
  gather math or the Pallas TPU kernel);
- padding is handled with rectangle validity masks derived from per-image sizes
  instead of boolean mask tensors + cumsums.

Box refinement (with_box_refine=True, the IDOL configuration) keeps per-layer
bbox MLPs inside this module; per-layer class heads live in the meta-arch.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ms_deform_attn import ms_deform_attn, ms_deform_attn_cm, ms_deform_attn_cm_fused
from .layers import MLP, DualDense, MultiHeadAttention, inverse_sigmoid

Array = jnp.ndarray
Dtype = Any


def _offset_bias_init(n_heads: int, n_levels: int, n_points: int):
    """Head-direction grid bias for sampling offsets (reference init scheme)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # [M, 2]
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        assert shape == (flat.shape[0],), shape
        return jnp.asarray(flat, dtype)

    return init


class MSDeformAttnModule(nn.Module):
    """Multi-scale deformable attention layer (projections + sampling core)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Dtype = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        query: Array,                      # [B, Q, C]  (CM: [B, C, S])
        reference_points: Array,           # [B, Q, L, 2] or [B, Q, L, 4], in [0,1]
        src: Array,                        # [B, S, C]  (CM: [B, C, S])
        spatial_shapes: Sequence[Tuple[int, int]],
        padding_mask: Optional[Array] = None,  # [B, S] True on padding
        channel_major: bool = False,       # CM: reference_points is [B, L, 2, S]
    ) -> Array:
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value_proj = DualDense(self.d_model, dtype=self.dtype, name="value_proj")
        offsets_proj = DualDense(
            m * l * p * 2,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(m, l, p),
            name="sampling_offsets",
        )
        attn_proj = DualDense(
            m * l * p,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="attention_weights",
        )
        output_proj = DualDense(self.d_model, dtype=self.dtype, name="output_proj")

        if channel_major:
            # feature-major inference path: projections emit head-major
            # channels directly, so the MSDA kernel needs no query relayout.
            # query may be shorter than src (decoder cross-attention: Q=300
            # object queries over the S-token memory).
            b, _, s = query.shape
            valueT = value_proj(src, channel_major=True)          # [B, MD, S]
            if padding_mask is not None:                          # [B, S]
                valueT = jnp.where(padding_mask[:, None, :], 0.0, valueT)
                assert valueT.ndim == 3

            offsets = offsets_proj(query, channel_major=True)     # [B, MLP2, Q]
            attn = attn_proj(query, channel_major=True)           # [B, MLP, Q]
            ref = reference_points.astype(jnp.float32)            # [B, L, 2|4, Q]

            import os
            if reference_points.shape[-2] == 4:
                # box-refined references (decoder): the reference math is
                # loc = ref_xy + off/P * ref_wh * 0.5 (deformable_transformer
                # .py:decoder, offsets scaled by the box extent). The fused
                # kernel computes x_pix = off_raw + (ref*wh - 0.5), so we
                # pre-scale the raw offsets by ref_wh*wh*0.5/P in f32 (exact:
                # Q is small, the scaled-offset tensor is a few MB) and feed
                # ref_xy as the reference grid.
                off = offsets.reshape(b, m, l, p, 2, s).astype(jnp.float32)
                wh = jnp.asarray(
                    [[w, h] for h, w in spatial_shapes], jnp.float32
                )                                                  # [L, 2]
                scale = ref[:, :, 2:] * wh[None, :, :, None] * (0.5 / p)
                off_s = off * scale[:, None, :, None]              # [B,M,L,P,2,Q]
                out = ms_deform_attn_cm_fused(
                    valueT, spatial_shapes, off_s, ref[:, :, :2],
                    attn.reshape(b, m, l, p, s), impl=self.impl,
                    attn_is_logits=True,
                )
            elif os.environ.get("VNEXT_MSDA_FUSED", "1") == "1":
                # raw offsets stay in the compute dtype; the kernel forms the
                # pixel locations in VMEM (no [B,M,L,P,2,S] f32 materialization)
                # and softmaxes the raw attention logits over (L, P) in VMEM
                off_cm = offsets.reshape(b, m, l, p, 2, s)
                out = ms_deform_attn_cm_fused(
                    valueT, spatial_shapes, off_cm, ref,
                    attn.reshape(b, m, l, p, s), impl=self.impl,
                    attn_is_logits=True,
                )
            else:
                attn = attn.reshape(b, m, l * p, s)
                attn = jax.nn.softmax(
                    attn.astype(jnp.float32), axis=2
                ).astype(self.dtype)
                attn = attn.reshape(b, m, l, p, s)
                offsets = offsets.reshape(b, m, l, p, 2, s).astype(jnp.float32)
                wh = jnp.asarray([[w, h] for h, w in spatial_shapes], dtype=jnp.float32)
                loc = ref[:, None, :, None] + offsets / wh[None, None, :, None, :, None]
                out = ms_deform_attn_cm(valueT, spatial_shapes, loc, attn, impl=self.impl)
            return output_proj(out, channel_major=True)

        b, q, _ = query.shape
        value = value_proj(src)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(b, -1, m, d)

        offsets = offsets_proj(query).reshape(b, q, m, l, p, 2)
        attn = attn_proj(query).reshape(b, q, m, l * p)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = attn.reshape(b, q, m, l, p)

        offsets = offsets.astype(jnp.float32)
        ref = reference_points.astype(jnp.float32)
        if reference_points.shape[-1] == 2:
            # normalize offsets by each level's (W, H)
            wh = jnp.asarray([[w, h] for h, w in spatial_shapes], dtype=jnp.float32)  # [L, 2]
            loc = ref[:, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]
        else:
            loc = (
                ref[:, :, None, :, None, :2]
                + offsets / p * ref[:, :, None, :, None, 2:] * 0.5
            )

        out = ms_deform_attn(value, spatial_shapes, loc, attn, impl=self.impl)
        return output_proj(out)


class EncoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    msda_impl: str = "auto"

    @nn.compact
    def __call__(
        self, src, pos, reference_points, spatial_shapes, padding_mask,
        train: bool, channel_major: bool = False,
    ):
        # channel_major: src/pos are [B, C, S], reference_points [B, L, 2, S],
        # padding_mask stays [B, S]; all ops run feature-major (axis -2)
        feat_ax = -2 if channel_major else -1
        attn_out = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, impl=self.msda_impl, name="self_attn",
        )(src + pos, reference_points, src, spatial_shapes, padding_mask,
          channel_major=channel_major)

        import os
        flag = os.environ.get("VNEXT_FUSED_EPILOGUE", "auto")
        if (
            channel_major and not train and flag != "0"
            and (jax.default_backend() == "tpu" or flag == "1")
        ):
            # fused Pallas tail: LN1(src+attn) -> FFN -> LN2 in one HBM pass
            # (ops/encoder_epilogue.py); declares the identical param tree
            from ..ops.encoder_epilogue import encoder_epilogue_cm
            from .layers import ParamHolder

            d, f = self.d_model, self.d_ffn
            ones, zeros = nn.initializers.ones, nn.initializers.zeros
            kinit = nn.linear.default_kernel_init
            g1, be1 = ParamHolder(
                (("scale", (d,), ones), ("bias", (d,), zeros)), name="norm1")()
            w1, b1 = ParamHolder(
                (("kernel", (d, f), kinit), ("bias", (f,), zeros)), name="linear1")()
            w2, b2 = ParamHolder(
                (("kernel", (f, d), kinit), ("bias", (d,), zeros)), name="linear2")()
            g2, be2 = ParamHolder(
                (("scale", (d,), ones), ("bias", (d,), zeros)), name="norm2")()
            return encoder_epilogue_cm(
                attn_out.astype(self.dtype), src.astype(self.dtype),
                g1, be1, w1, b1, w2, b2, g2, be2,
                interpret=jax.default_backend() != "tpu",
            )

        attn_out = nn.Dropout(self.dropout, deterministic=not train)(attn_out)
        src = nn.LayerNorm(
            dtype=self.dtype, reduction_axes=feat_ax, feature_axes=feat_ax,
            name="norm1",
        )(src + attn_out)

        ff = DualDense(self.d_ffn, dtype=self.dtype, name="linear1")(src, channel_major)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = DualDense(self.d_model, dtype=self.dtype, name="linear2")(ff, channel_major)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(
            dtype=self.dtype, reduction_axes=feat_ax, feature_axes=feat_ax,
            name="norm2",
        )(src + ff)


class DecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    msda_impl: str = "auto"

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 padding_mask, train: bool, src_cm: Optional[Array] = None):
        q = tgt + query_pos
        sa = MultiHeadAttention(self.n_heads, dtype=self.dtype, name="self_attn")(q, q, tgt)
        sa = nn.Dropout(self.dropout, deterministic=not train)(sa)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + sa)

        cross_attn = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, impl=self.msda_impl, name="cross_attn",
        )
        if src_cm is not None and not train:
            # channel-major cross-attention: Q=300 transposes are trivial and
            # the fused kernel skips the standard path's head-major relayouts
            # + f32 location materialization + XLA softmax (same params)
            qT = jnp.swapaxes(tgt + query_pos, 1, 2)               # [B, C, Q]
            refT = jnp.transpose(reference_points, (0, 2, 3, 1))   # [B, L, 2|4, Q]
            ca = cross_attn(qT, refT, src_cm, spatial_shapes, padding_mask,
                            channel_major=True)
            ca = jnp.swapaxes(ca, 1, 2)
        else:
            ca = cross_attn(tgt + query_pos, reference_points, src,
                            spatial_shapes, padding_mask)
        ca = nn.Dropout(self.dropout, deterministic=not train)(ca)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + ca)

        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + ff)


def encoder_reference_points(
    spatial_shapes: Sequence[Tuple[int, int]], valid_ratios: Array
) -> Array:
    """[B, S, L, 2] normalized per-level grid reference points scaled by valid ratios."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]  # [h,1]
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]  # [1,w]
        ry = jnp.broadcast_to(ry, (h, w)).reshape(-1)
        rx = jnp.broadcast_to(rx, (h, w)).reshape(-1)
        # normalize by the *valid* extent of this level
        ry = ry[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = rx[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], -1))  # [B, hw, 2]
    ref = jnp.concatenate(refs, 1)  # [B, S, 2]
    return ref[:, :, None] * valid_ratios[:, None]  # [B, S, L, 2]


class DeformableTransformer(nn.Module):
    """Encoder + box-refining decoder over flattened multi-level features."""

    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    with_box_refine: bool = True
    dtype: Dtype = jnp.float32
    msda_impl: str = "auto"
    # run encoder layers feature-major at inference: kills the per-layer
    # [B, Q, head...] relayouts feeding the MSDA kernel (see EncoderLayer)
    channel_major: bool = True

    def setup(self):
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, self.d_model)
        )
        self.encoder_layers = [
            EncoderLayer(
                self.d_model, self.d_ffn, self.num_feature_levels, self.n_heads,
                self.enc_n_points, self.dropout, self.dtype, self.msda_impl, name=f"encoder_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DecoderLayer(
                self.d_model, self.d_ffn, self.num_feature_levels, self.n_heads,
                self.dec_n_points, self.dropout, self.dtype, self.msda_impl, name=f"decoder_{i}",
            )
            for i in range(self.num_decoder_layers)
        ]
        self.reference_points_fc = nn.Dense(
            2, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name="reference_points"
        )
        if self.with_box_refine:
            # independent bbox head per decoder layer; layer 0's final bias [2:] = -2.0
            def make(i):
                bias_init = None
                if i == 0:
                    def bias_init(key, shape, dtype=jnp.float32):
                        b = jnp.zeros(shape, dtype)
                        return b.at[2:].set(-2.0)
                return MLP(
                    self.d_model, 4, 3, dtype=self.dtype,
                    final_kernel_init=nn.initializers.zeros,
                    final_bias_init=bias_init or nn.initializers.zeros,
                    name=f"bbox_embed_{i}",
                )

            self.bbox_embeds = [make(i) for i in range(self.num_decoder_layers)]
        else:
            self.bbox_embeds = None

    def __call__(
        self,
        srcs: List[Array],                 # L x [B, H_l, W_l, C]
        valid_hw: List[Array],             # L x [B, 2] valid (h, w) per level
        pos_embeds: List[Array],           # L x [B, H_l, W_l, C]
        query_embed: Array,                # [Q, 2C]
        train: bool = False,
    ):
        memory, spatial_shapes, mask_flat, valid_ratios = self.encode(
            srcs, valid_hw, pos_embeds, train
        )
        return self.decode(
            memory, spatial_shapes, mask_flat, valid_ratios, query_embed, train
        )

    def encode(
        self,
        srcs: List[Array],
        valid_hw: List[Array],
        pos_embeds: List[Array],
        train: bool = False,
    ):
        """Flatten levels + run the encoder stack; split from decode for
        stage-level profiling and feature reuse."""
        b = srcs[0].shape[0]
        c = self.d_model
        spatial_shapes = tuple((int(s.shape[1]), int(s.shape[2])) for s in srcs)

        src_flat, pos_flat, mask_flat = [], [], []
        for lvl, (src, pos) in enumerate(zip(srcs, pos_embeds)):
            h, w = spatial_shapes[lvl]
            src_flat.append(src.reshape(b, h * w, c))
            pos_flat.append(
                pos.reshape(b, h * w, c) + self.level_embed[lvl][None, None].astype(pos.dtype)
            )
            ys = jnp.arange(h)[None, :, None]
            xs = jnp.arange(w)[None, None, :]
            vh = valid_hw[lvl][:, 0][:, None, None]
            vw = valid_hw[lvl][:, 1][:, None, None]
            pad = ~((ys < vh) & (xs < vw))
            mask_flat.append(pad.reshape(b, h * w))
        src_flat = jnp.concatenate(src_flat, 1)      # [B, S, C]
        pos_flat = jnp.concatenate(pos_flat, 1)
        mask_flat = jnp.concatenate(mask_flat, 1)    # [B, S]

        # valid ratios [B, L, 2] in (w, h) order
        vr = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            vw = valid_hw[lvl][:, 1].astype(jnp.float32) / w
            vh = valid_hw[lvl][:, 0].astype(jnp.float32) / h
            vr.append(jnp.stack([vw, vh], -1))
        valid_ratios = jnp.stack(vr, 1)

        # encoder
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        if self.channel_major and not train:
            # one transpose in, one out; every layer in between is relayout-free
            memT = jnp.swapaxes(src_flat, 1, 2)                    # [B, C, S]
            posT = jnp.swapaxes(pos_flat, 1, 2)
            refT = jnp.transpose(enc_ref, (0, 2, 3, 1))            # [B, L, 2, S]
            for layer in self.encoder_layers:
                memT = layer(
                    memT, posT, refT, spatial_shapes, mask_flat, train,
                    channel_major=True,
                )
            memory = jnp.swapaxes(memT, 1, 2)
        else:
            memory = src_flat
            for layer in self.encoder_layers:
                memory = layer(memory, pos_flat, enc_ref, spatial_shapes, mask_flat, train)

        return memory, spatial_shapes, mask_flat, valid_ratios

    def decode(
        self,
        memory: Array,
        spatial_shapes,
        mask_flat: Array,
        valid_ratios: Array,
        query_embed: Array,
        train: bool = False,
    ):
        import os

        b = memory.shape[0]
        # one [B, S, C] -> [B, C, S] transpose shared by all decoder layers'
        # channel-major cross-attention (skipped in training: the fused CM
        # kernel entry has no VJP). VNEXT_DEC_CM=0 restores the standard
        # decoder layout for A/B.
        src_cm = (
            jnp.swapaxes(memory, 1, 2)
            if (
                self.channel_major
                and not train
                and os.environ.get("VNEXT_DEC_CM", "1") == "1"
            )
            else None
        )
        query_pos, tgt = jnp.split(query_embed, 2, axis=1)
        query_pos = jnp.broadcast_to(query_pos[None], (b, *query_pos.shape)).astype(self.dtype)
        tgt = jnp.broadcast_to(tgt[None], (b, *tgt.shape)).astype(self.dtype)
        reference_points = jax.nn.sigmoid(
            self.reference_points_fc(query_pos).astype(jnp.float32)
        )
        init_reference = reference_points

        hs_layers, ref_layers, coord_layers = [], [], []
        output = tgt
        for lid, layer in enumerate(self.decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (
                    reference_points[:, :, None]
                    * jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None]
                )
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]
            output = layer(
                output, query_pos, ref_input, memory, spatial_shapes, mask_flat,
                train, src_cm=src_cm,
            )
            if self.bbox_embeds is not None:
                tmp = self.bbox_embeds[lid](output).astype(jnp.float32)
                if reference_points.shape[-1] == 4:
                    new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
                else:
                    new_ref = jax.nn.sigmoid(
                        tmp.at[..., :2].add(inverse_sigmoid(reference_points))
                    )
                # the undetached refined box is the layer's box prediction
                # (reference: deformable_detr.py:196-214 outputs_coord)
                coord_layers.append(new_ref)
                reference_points = jax.lax.stop_gradient(new_ref)
            hs_layers.append(output)
            ref_layers.append(reference_points)

        hs = jnp.stack(hs_layers)                    # [n_dec, B, Q, C]
        inter_references = jnp.stack(ref_layers)     # [n_dec, B, Q, 2 or 4]
        out_coords = jnp.stack(coord_layers) if coord_layers else inter_references
        return hs, memory, init_reference, inter_references, out_coords
