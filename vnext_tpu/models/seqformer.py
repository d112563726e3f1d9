"""SeqFormer meta-architecture (flax): offline VIS with video-level instance queries.

Capability parity with projects/SeqFormer/seqformer (seqformer.py meta-arch,
models/deformable_transformer.py:264 decoder with shared instance query +
per-frame box queries + learned time-attention fusion, models/ops/modules/
ms_deform_attn.py:82 dual-output decode attention, models/matcher.py Hungarian
clip-level matching, segmentation_condInst.py per-frame dynamic mask head).

TPU-first redesign:
- frames fold into the batch dimension for the backbone/encoder (identical math,
  one big jit — the reference loops python-side over frames);
- the decoder's per-frame deformable attention is a single batched call with
  frames as a leading batch axis;
- Hungarian matching runs on device via the eps-scaling auction solver
  (ops/hungarian.py) instead of scipy on the host.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.hungarian import auction_lap
from ..ops.losses import dice_loss, sigmoid_focal_loss, sigmoid_focal_loss_elementwise
from ..ops.ms_deform_attn import ms_deform_attn
from ..structures.boxes import box_cxcywh_to_xyxy, elementwise_giou_loss, generalized_box_iou
from .backbones import SWIN_PRESETS, backbone_kwargs_from_cfg, make_backbone
from .condinst import MaskHeadSmallConv, num_dynamic_params, run_dynamic_mask_head
from .deformable_transformer import EncoderLayer, _offset_bias_init, encoder_reference_points
from .idol import FEATURE_STRIDES, _class_bias_init
from .layers import MLP, ConvGN, MultiHeadAttention, inverse_sigmoid
from .position_encoding import sine_position_embedding

Array = jnp.ndarray


class ClipTargets(NamedTuple):
    """Padded clip-level ground truth. K slots x nf frames."""

    labels: Array     # [B, K]
    boxes: Array      # [B, K, nf, 4] normalized cxcywh (zeros when absent)
    masks_s4: Array   # [B, K, nf, H/4, W/4]
    valid: Array      # [B, K]


class SeqFormerDecodeMSDA(nn.Module):
    """Dual-output per-frame deformable cross attention (reference ms_deform_attn.py:82)."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32
    impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        query_box: Array,          # [B, nf, Q, C] (first layer: broadcast of shared query)
        reference_points: Array,   # [B, nf, Q, L, 2 or 4]
        src: Array,                # [B, nf, S, C]
        spatial_shapes,
        padding_mask: Optional[Array] = None,  # [B, nf, S]
    ) -> Tuple[Array, Array]:
        b, nf, q, _ = query_box.shape
        m, l, p = self.n_heads, self.n_levels, self.n_points
        d = self.d_model // m

        value = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")(src)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(b * nf, -1, m, d)

        offsets = nn.Dense(
            m * l * p * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(m, l, p),
            name="sampling_offsets",
        )(query_box).reshape(b, nf, q, m, l, p, 2)
        attn = nn.Dense(
            m * l * p, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="attention_weights",
        )(query_box).reshape(b, nf, q, m, l * p)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).reshape(b, nf, q, m, l, p)

        offsets = offsets.astype(jnp.float32)
        ref = reference_points.astype(jnp.float32)
        if ref.shape[-1] == 2:
            wh = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)
            loc = ref[:, :, :, None, :, None, :] + offsets / wh[None, None, None, None, :, None, :]
        else:
            loc = (
                ref[:, :, :, None, :, None, :2]
                + offsets / p * ref[:, :, :, None, :, None, 2:] * 0.5
            )
        loc = loc.reshape(b * nf, q, m, l, p, 2)
        attn = attn.reshape(b * nf, q, m, l, p).astype(value.dtype)

        out = ms_deform_attn(value, spatial_shapes, loc, attn, impl=self.impl)
        out = out.reshape(b, nf, q, self.d_model)
        output = nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(out)
        output_box = nn.Dense(self.d_model, dtype=self.dtype, name="output_proj_box")(out)
        return output, output_box


class SeqFormerDecoderLayer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    dropout: float = 0.1
    dtype: Any = jnp.float32
    msda_impl: str = "auto"

    @nn.compact
    def __call__(self, tgt, tgt_box, query_pos, ref_input, src, spatial_shapes,
                 padding_mask, train: bool, first_layer: bool):
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)
        b, q, c = tgt.shape
        nf = src.shape[1]

        # instance-query self attention
        qk = tgt + query_pos
        sa = MultiHeadAttention(self.n_heads, dtype=self.dtype, name="self_attn")(qk, qk, tgt)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt + drop(sa))

        # box-query self attention (per frame; frames fold into batch)
        box_attn = MultiHeadAttention(self.n_heads, dtype=self.dtype, name="self_attn_box")
        norm2_box = nn.LayerNorm(dtype=self.dtype, name="norm2_box")
        if first_layer:
            qb = tgt_box + query_pos
            tb = norm2_box(tgt_box + drop(box_attn(qb, qb, tgt_box)))   # [B, Q, C]
            tb_frames = jnp.broadcast_to(tb[:, None], (b, nf, q, c))
            residual_box = tb[:, None]
        else:
            flat = tgt_box.reshape(b * nf, q, c)
            qp = jnp.broadcast_to(query_pos[:, None], (b, nf, q, c)).reshape(b * nf, q, c)
            tb = norm2_box(flat + drop(box_attn(flat + qp, flat + qp, flat)))
            tb_frames = tb.reshape(b, nf, q, c)
            residual_box = tb_frames

        # per-frame deformable cross attention with dual outputs
        qp_frames = jnp.broadcast_to(query_pos[:, None], (b, nf, q, c))
        tgt2, tgt2_box = SeqFormerDecodeMSDA(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            dtype=self.dtype, impl=self.msda_impl, name="cross_attn",
        )(tb_frames + qp_frames, ref_input, src, spatial_shapes, padding_mask)

        tgt_box = nn.LayerNorm(dtype=self.dtype, name="norm1_box")(residual_box + drop(tgt2_box))
        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1_box")(tgt_box)
        ff = drop(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2_box")(ff)
        tgt_box = nn.LayerNorm(dtype=self.dtype, name="norm3_box")(tgt_box + drop(ff))

        # learned time-attention fusion of per-frame features into the instance query
        tw = nn.Dense(1, dtype=self.dtype, name="time_attention_weights")(tgt_box)
        tw = jax.nn.softmax(tw.astype(jnp.float32), axis=1).astype(tgt2.dtype)  # over frames
        fused = jnp.sum(tgt2 * tw, axis=1)  # [B, Q, C]

        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt + drop(fused))
        ff = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        ff = drop(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt + drop(ff))
        return tgt, tgt_box


class SeqFormerTransformer(nn.Module):
    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    d_ffn: int = 1024
    dropout: float = 0.1
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    dtype: Any = jnp.float32
    msda_impl: str = "auto"
    channel_major: bool = True

    def setup(self):
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feature_levels, self.d_model)
        )
        self.encoder_layers = [
            EncoderLayer(self.d_model, self.d_ffn, self.num_feature_levels, self.n_heads,
                         self.enc_n_points, self.dropout, self.dtype, self.msda_impl,
                         name=f"encoder_{i}")
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            SeqFormerDecoderLayer(self.d_model, self.d_ffn, self.num_feature_levels,
                                  self.n_heads, self.dec_n_points, self.dropout,
                                  self.dtype, self.msda_impl, name=f"decoder_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.reference_points_fc = nn.Dense(
            2, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(),
            name="reference_points",
        )

        def make(i):
            def bias_init(key, shape, dtype=jnp.float32):
                bias = jnp.zeros(shape, dtype)
                return bias.at[2:].set(-2.0) if i == 0 else bias

            return MLP(self.d_model, 4, 3, dtype=self.dtype,
                       final_kernel_init=nn.initializers.zeros,
                       final_bias_init=bias_init, name=f"bbox_embed_{i}")

        self.bbox_embeds = [make(i) for i in range(self.num_decoder_layers)]

    def __call__(self, srcs: List[Array], valid_hw: List[Array], pos_embeds: List[Array],
                 query_embed: Array, train: bool = False):
        """srcs: L x [B, nf, H, W, C]; valid_hw: L x [B, 2] (shared by all frames)."""
        b, nf = srcs[0].shape[:2]
        c = self.d_model
        spatial_shapes = tuple((int(s.shape[2]), int(s.shape[3])) for s in srcs)

        src_flat, pos_flat, mask_flat = [], [], []
        for lvl, (src, pos) in enumerate(zip(srcs, pos_embeds)):
            h, w = spatial_shapes[lvl]
            src_flat.append(src.reshape(b, nf, h * w, c))
            pos_flat.append(
                pos.reshape(b, nf, h * w, c)
                + self.level_embed[lvl][None, None, None].astype(pos.dtype)
            )
            ys = jnp.arange(h)[None, :, None]
            xs = jnp.arange(w)[None, None, :]
            vh = valid_hw[lvl][:, 0][:, None, None]
            vw = valid_hw[lvl][:, 1][:, None, None]
            pad = ~((ys < vh) & (xs < vw))
            mask_flat.append(jnp.broadcast_to(pad.reshape(b, 1, h * w), (b, nf, h * w)))
        src_flat = jnp.concatenate(src_flat, 2)
        pos_flat = jnp.concatenate(pos_flat, 2)
        mask_flat = jnp.concatenate(mask_flat, 2)

        vr = []
        for lvl, (h, w) in enumerate(spatial_shapes):
            vw = valid_hw[lvl][:, 1].astype(jnp.float32) / w
            vh = valid_hw[lvl][:, 0].astype(jnp.float32) / h
            vr.append(jnp.stack([vw, vh], -1))
        valid_ratios = jnp.stack(vr, 1)  # [B, L, 2]
        vr_frames = jnp.repeat(valid_ratios, nf, axis=0)  # [B*nf, L, 2]

        # encoder: frames fold into the batch
        enc_ref = encoder_reference_points(spatial_shapes, vr_frames)
        memory = src_flat.reshape(b * nf, -1, c)
        pos_fold = pos_flat.reshape(b * nf, -1, c)
        mask_fold = mask_flat.reshape(b * nf, -1)
        if self.channel_major and not train:
            # feature-major encoder (see DeformableTransformer.channel_major)
            memT = jnp.swapaxes(memory, 1, 2)
            posT = jnp.swapaxes(pos_fold, 1, 2)
            refT = jnp.transpose(enc_ref, (0, 2, 3, 1))
            for layer in self.encoder_layers:
                memT = layer(
                    memT, posT, refT, spatial_shapes, mask_fold, train,
                    channel_major=True,
                )
            memory = jnp.swapaxes(memT, 1, 2)
        else:
            for layer in self.encoder_layers:
                memory = layer(memory, pos_fold, enc_ref, spatial_shapes, mask_fold, train)
        memory = memory.reshape(b, nf, -1, c)

        # decoder
        query_pos, tgt = jnp.split(query_embed, 2, axis=1)
        query_pos = jnp.broadcast_to(query_pos[None], (b, *query_pos.shape)).astype(self.dtype)
        tgt = jnp.broadcast_to(tgt[None], (b, *tgt.shape)).astype(self.dtype)
        ref = jax.nn.sigmoid(self.reference_points_fc(query_pos).astype(jnp.float32))
        reference_points = jnp.broadcast_to(ref[:, None], (b, nf, *ref.shape[1:]))
        init_reference = reference_points

        hs_layers, hs_box_layers, ref_layers, coord_layers = [], [], [], []
        output, output_box = tgt, tgt
        for lid, layer in enumerate(self.decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (
                    reference_points[:, :, :, None]
                    * jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None, None]
                )
            else:
                ref_input = reference_points[:, :, :, None] * valid_ratios[:, None, None]
            output, output_box = layer(
                output, output_box, query_pos, ref_input, memory, spatial_shapes,
                mask_flat, train, first_layer=(lid == 0),
            )
            tmp = self.bbox_embeds[lid](output_box).astype(jnp.float32)
            if reference_points.shape[-1] == 4:
                new_ref = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
            else:
                new_ref = jax.nn.sigmoid(tmp.at[..., :2].add(inverse_sigmoid(reference_points)))
            coord_layers.append(new_ref)
            reference_points = jax.lax.stop_gradient(new_ref)
            hs_layers.append(output)
            hs_box_layers.append(output_box)
            ref_layers.append(reference_points)

        return (
            jnp.stack(hs_layers),        # [L, B, Q, C] instance queries
            jnp.stack(hs_box_layers),    # [L, B, nf, Q, C]
            memory,                      # [B, nf, S, C]
            init_reference,              # [B, nf, Q, 2]
            jnp.stack(ref_layers),       # [L, B, nf, Q, 4]
            jnp.stack(coord_layers),     # [L, B, nf, Q, 4] undetached
        )


# ---------------------------------------------------------------------------
# matching + losses (clip level)
# ---------------------------------------------------------------------------
def seqformer_match_cost(
    logits: Array,     # [Q, C]
    boxes: Array,      # [nf, Q, 4]
    gt_labels: Array,  # [K]
    gt_boxes: Array,   # [K, nf, 4]
    gt_valid: Array,   # [K]
    cost_class_w: float = 2.0,
    cost_bbox_w: float = 5.0,
    cost_giou_w: float = 2.0,
) -> Array:
    """[Q, K] clip-level matching cost (reference matcher.py:52-92).

    Note the reference uses torch.cdist's default p=2 (euclidean) over the
    concatenated per-frame boxes; we reproduce that.
    """
    prob = jax.nn.sigmoid(logits.astype(jnp.float32))
    alpha, gamma = 0.25, 2.0
    neg = (1 - alpha) * prob**gamma * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    cost_class = pos[:, gt_labels] - neg[:, gt_labels]

    nf = boxes.shape[0]
    out_flat = jnp.transpose(boxes, (1, 0, 2)).reshape(boxes.shape[1], nf * 4)
    gt_clip = jnp.clip(gt_boxes, 1e-7, 1.0)
    gt_flat = gt_clip.reshape(gt_boxes.shape[0], nf * 4)
    diff = out_flat[:, None] - gt_flat[None]
    cost_bbox = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))

    cost_giou = jnp.zeros_like(cost_bbox)
    for f in range(nf):
        cost_giou = cost_giou - generalized_box_iou(
            box_cxcywh_to_xyxy(boxes[f]), box_cxcywh_to_xyxy(gt_clip[:, f])
        )
    cost_giou = cost_giou / nf

    cost = cost_class_w * cost_class + cost_bbox_w * cost_bbox + cost_giou_w * cost_giou
    return jnp.where(gt_valid[None, :], cost, 1e9)


class SeqFormer(nn.Module):
    num_classes: int = 40
    hidden_dim: int = 256
    num_queries: int = 300
    nheads: int = 8
    dim_feedforward: int = 1024
    enc_layers: int = 6
    dec_layers: int = 6
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    backbone_type: str = "resnet"  # "resnet" | "swin" (cfg.MODEL.BACKBONE.NAME)
    backbone_depth: int = 50
    swin: Any = SWIN_PRESETS["L"]  # (embed_dim, depths, heads, window, drop_path)
    dropout: float = 0.1
    rel_coord: bool = True
    mask_out_stride: int = 4
    max_insts: int = 24
    focal_alpha: float = 0.25
    dtype: Any = jnp.float32
    msda_impl: str = "auto"

    def setup(self):
        self.backbone = make_backbone(
            self.backbone_type, depth=self.backbone_depth,
            out_features=("res3", "res4", "res5"), swin=self.swin,
            dtype=self.dtype, name="backbone",
        )
        self.input_proj = [
            ConvGN(self.hidden_dim, kernel_size=3 if i >= 3 else 1,
                   stride=2 if i >= 3 else 1, dtype=self.dtype, name=f"input_proj_{i}")
            for i in range(self.num_feature_levels)
        ]
        self.transformer = SeqFormerTransformer(
            d_model=self.hidden_dim, n_heads=self.nheads,
            num_encoder_layers=self.enc_layers, num_decoder_layers=self.dec_layers,
            d_ffn=self.dim_feedforward, dropout=self.dropout,
            num_feature_levels=self.num_feature_levels,
            enc_n_points=self.enc_n_points, dec_n_points=self.dec_n_points,
            dtype=self.dtype, msda_impl=self.msda_impl, name="transformer",
        )
        self.class_embed = [
            nn.Dense(self.num_classes, dtype=self.dtype, bias_init=_class_bias_init,
                     name=f"class_embed_{i}")
            for i in range(self.dec_layers)
        ]
        self.controller = MLP(
            self.hidden_dim, num_dynamic_params(self.hidden_dim // 32, self.rel_coord),
            3, dtype=self.dtype, name="controller",
        )
        self.mask_head = MaskHeadSmallConv(self.hidden_dim, dtype=self.dtype, name="mask_head")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim * 2)
        )

    # ------------------------------------------------------------------ features
    def extract_features(self, images: Array, image_sizes: Array, train: bool = False):
        """images: [B, nf, H, W, 3]; image_sizes: [B, 2] (shared across the clip)."""
        b, nf = images.shape[:2]
        flat = images.reshape(b * nf, *images.shape[2:])
        if self.backbone_type == "swin":
            feats = self.backbone(flat, train)  # train enables drop-path
        else:
            feats = self.backbone(flat)
        base = [feats["res3"], feats["res4"], feats["res5"]]
        srcs, valid_hw, poses = [], [], []
        for lvl in range(self.num_feature_levels):
            src = self.input_proj[lvl](base[lvl] if lvl < 3 else base[2])
            stride = FEATURE_STRIDES[lvl]
            vhw = jnp.minimum(
                -(-image_sizes // stride),
                jnp.asarray([src.shape[1], src.shape[2]], dtype=image_sizes.dtype),
            )
            vhw_frames = jnp.repeat(vhw, nf, axis=0)
            pos = sine_position_embedding(
                vhw_frames, src.shape[1], src.shape[2], num_pos_feats=self.hidden_dim // 2
            ).astype(self.dtype)
            srcs.append(src.reshape(b, nf, *src.shape[1:]))
            poses.append(pos.reshape(b, nf, *pos.shape[1:]))
            valid_hw.append(vhw)
        return srcs, valid_hw, poses

    def forward_single(self, images: Array, image_sizes: Array, train: bool):
        srcs, valid_hw, poses = self.extract_features(images, image_sizes, train)
        spatial_shapes = tuple((int(s.shape[2]), int(s.shape[3])) for s in srcs)
        hs, hs_box, memory, init_ref, inter_refs, out_coords = self.transformer(
            srcs, valid_hw, poses, self.query_embed, train=train
        )
        logits = jnp.stack(
            [self.class_embed[i](hs[i]).astype(jnp.float32) for i in range(self.dec_layers)]
        )  # [L, B, Q, C]
        pre_refs = [init_ref[..., :2]] + [
            inter_refs[i][..., :2] for i in range(self.dec_layers - 1)
        ]  # each [B, nf, Q, 2]
        return {
            "hs": hs,
            "hs_box": hs_box,
            "memory": memory,
            "logits": logits,
            "boxes": out_coords,       # [L, B, nf, Q, 4]
            "pre_refs": pre_refs,
            "spatial_shapes": spatial_shapes,
        }

    def _mask_features(self, memory: Array, spatial_shapes) -> Array:
        """[B, nf, S, C] -> stride-8 mask features [B*nf, H8, W8, C/32]."""
        b, nf = memory.shape[:2]
        flat = memory.reshape(b * nf, *memory.shape[2:])
        feats = []
        start = 0
        for h, w in spatial_shapes[:3]:
            feats.append(flat[:, start : start + h * w].reshape(b * nf, h, w, -1))
            start += h * w
        return self.mask_head(feats)

    def _clip_masks(self, mask_feats, pre_ref, params, image_sizes, nf):
        """Per-frame dynamic conv with shared instance params.

        mask_feats: [B*nf, H8, W8, Cm]; pre_ref: [B, nf, N, 2] (normalized);
        params: [B, N, P]. Returns [B, N, nf, H4, W4].
        """
        b, _, n, _ = pre_ref.shape
        scale = image_sizes[:, ::-1].astype(jnp.float32)[:, None, None, :]
        ref_abs = (pre_ref * scale).reshape(b * nf, n, 2)
        params_f = jnp.broadcast_to(params[:, None], (b, nf, n, params.shape[-1]))
        params_f = params_f.reshape(b * nf, n, -1)
        logits = run_dynamic_mask_head(
            mask_feats, ref_abs, params_f, rel_coord=self.rel_coord,
            mask_feat_stride=8, mask_out_stride=self.mask_out_stride,
        )  # [B*nf, N, H4, W4]
        h4, w4 = logits.shape[-2:]
        return jnp.transpose(logits.reshape(b, nf, n, h4, w4), (0, 2, 1, 3, 4))

    # ------------------------------------------------------------------ training
    def __call__(
        self,
        images: Array,        # [B, nf, H, W, 3]
        image_sizes: Array,   # [B, 2]
        targets: ClipTargets,
        train: bool = True,
    ) -> Dict[str, Array]:
        out = self.forward_single(images, image_sizes, train)
        nf = images.shape[1]
        mask_feats = self._mask_features(out["memory"], out["spatial_shapes"])

        losses: Dict[str, Array] = {}
        num_boxes = jnp.maximum(jnp.sum(targets.valid), 1).astype(jnp.float32)
        for lvl in range(self.dec_layers):
            logits_l = out["logits"][lvl]                      # [B, Q, C]
            boxes_l = out["boxes"][lvl]                        # [B, nf, Q, 4]
            cost = jax.vmap(seqformer_match_cost)(
                jax.lax.stop_gradient(logits_l),
                jax.lax.stop_gradient(boxes_l),
                targets.labels, targets.boxes, targets.valid,
            )  # [B, Q, K]
            assignment = jax.vmap(auction_lap)(
                jnp.transpose(cost, (0, 2, 1)), targets.valid
            )  # [B, K] query per gt
            suffix = "" if lvl == self.dec_layers - 1 else f"_{lvl}"
            losses.update(
                {f"{k}{suffix}": v for k, v in self._layer_losses(
                    logits_l, boxes_l, assignment, targets, num_boxes,
                    out["hs"][lvl], out["pre_refs"][lvl], mask_feats, image_sizes, nf,
                ).items()}
            )
        return losses

    def _layer_losses(self, logits, boxes, assignment, targets, num_boxes,
                      hs, pre_ref, mask_feats, image_sizes, nf):
        b, q, _ = logits.shape
        k = assignment.shape[1]
        q_idx = jnp.clip(assignment, 0, q - 1)
        valid = targets.valid & (assignment >= 0)

        # classification (focal over all queries)
        target_classes = jnp.full((b, q), self.num_classes, jnp.int32)
        target_classes = jax.vmap(
            lambda tc, qi, lab, v: tc.at[jnp.where(v, qi, q)].set(lab, mode="drop")
        )(target_classes, q_idx, targets.labels, valid)
        onehot = jax.nn.one_hot(target_classes, self.num_classes + 1, dtype=jnp.float32)[..., :-1]
        ce = sigmoid_focal_loss_elementwise(logits.astype(jnp.float32), onehot, self.focal_alpha)
        out_losses = {"loss_ce": jnp.sum(ce) / num_boxes}

        # boxes: gather matched [B, K, nf, 4]
        src_boxes = jnp.take_along_axis(
            jnp.transpose(boxes, (0, 2, 1, 3)), q_idx[..., None, None], axis=1
        ).astype(jnp.float32)
        vmask = valid[..., None].astype(jnp.float32)
        l1 = jnp.abs(src_boxes - targets.boxes).sum(-1).mean(-1)  # mean over frames
        giou = elementwise_giou_loss(
            box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(jnp.clip(targets.boxes, 1e-7, 1.0))
        ).mean(-1)
        out_losses["loss_bbox"] = jnp.sum(l1 * valid) / num_boxes
        out_losses["loss_giou"] = jnp.sum(giou * valid) / num_boxes

        # masks: only max_insts slots (here K is already small)
        params = self.controller(hs)                                  # [B, Q, P]
        params_sel = jnp.take_along_axis(params, q_idx[..., None], axis=1)  # [B, K, P]
        ref_sel = jnp.take_along_axis(
            pre_ref, q_idx[:, None, :, None], axis=2
        )  # [B, nf, K, 2]
        mask_logits = self._clip_masks(mask_feats, ref_sel, params_sel, image_sizes, nf)
        gt = targets.masks_s4.astype(jnp.float32)
        flat_logits = mask_logits.reshape(mask_logits.shape[0] * k, -1).astype(jnp.float32)
        flat_gt = gt.reshape(gt.shape[0] * k, -1)
        flat_valid = valid.reshape(-1)
        out_losses["loss_mask"] = sigmoid_focal_loss(flat_logits, flat_gt, num_boxes, valid=flat_valid)
        out_losses["loss_dice"] = dice_loss(flat_logits, flat_gt, num_boxes, valid=flat_valid)
        return out_losses

    # ------------------------------------------------------------------ inference
    def inference(self, images: Array, image_sizes: Array) -> Dict[str, Array]:
        """Whole-clip inference: one shared instance query set decodes all frames.

        images: [1, nf, H, W, 3]. Returns pred_logits [Q, C], pred_boxes
        [nf, Q, 4], pred_masks [Q, nf, H/4, W/4].
        """
        out = self.forward_single(images, image_sizes, train=False)
        nf = images.shape[1]
        logits = out["logits"][-1][0]
        boxes = out["boxes"][-1][0]
        mask_feats = self._mask_features(out["memory"], out["spatial_shapes"])
        params = self.controller(out["hs"][-1])
        masks = self._clip_masks(mask_feats, out["pre_refs"][-1], params, image_sizes, nf)
        return {
            "pred_logits": logits,
            "pred_boxes": boxes,
            "pred_masks": masks[0],
        }


def build_seqformer_model(cfg, dtype=None) -> SeqFormer:
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    c = cfg.MODEL.SeqFormer
    return SeqFormer(
        num_classes=c.NUM_CLASSES,
        hidden_dim=c.HIDDEN_DIM,
        num_queries=c.NUM_OBJECT_QUERIES,
        nheads=c.NHEADS,
        dim_feedforward=c.DIM_FEEDFORWARD,
        enc_layers=c.ENC_LAYERS,
        dec_layers=c.DEC_LAYERS,
        num_feature_levels=c.NUM_FEATURE_LEVELS,
        enc_n_points=c.ENC_N_POINTS,
        dec_n_points=c.DEC_N_POINTS,
        dropout=c.DROPOUT,
        mask_out_stride=c.MASK_STRIDE,
        max_insts=cfg.TPU.MAX_INSTANCES,
        **backbone_kwargs_from_cfg(cfg),
        dtype=dtype,
        msda_impl=cfg.TPU.MSDA_IMPL,
    )
