"""Mask2Former (flax, NHWC, fixed-shape) + MinVIS frame matching.

Capability parity with the vendored stack in projects/InstMove/MinVIS_motion:
- MSDeformAttn pixel decoder (mask2former/modeling/pixel_decoder/msdeformattn.py):
  deformable-attention encoder over the 3 coarse levels + FPN-style fusion down
  to the stride-4 mask features — reuses this framework's EncoderLayer/MSDA core;
- masked-attention transformer decoder (transformer_decoder/
  mask2former_transformer_decoder.py:208): learnable query feats+pos, 3-level
  round-robin cross-attention masked by the previous layer's predicted masks,
  self-attention, FFN, per-layer class+mask heads;
- MaskFormer losses (mask2former_video/modeling/criterion.py): softmax CE with
  0.1 no-object weight + sigmoid BCE + dice on matched masks, Hungarian-matched
  (exact JV solver on device). Dense mask losses stand in for the reference's
  point-sampled variant (same capability, simpler memory story on TPU).
- MinVIS frame association (minvis/video_maskformer_model.py:326
  match_from_embds): cosine query-embedding cost (optionally fused with the
  InstMove motion IoU cost) solved per frame pair.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.hungarian import hungarian
from ..ops.interpolate import resize_bilinear
from ..ops.losses import dice_loss, sigmoid_bce_with_logits
from .backbones import SWIN_PRESETS, backbone_kwargs_from_cfg, make_backbone
from .deformable_transformer import EncoderLayer, encoder_reference_points
from .layers import MLP, MultiHeadAttention
from .position_encoding import sine_position_embedding

Array = jnp.ndarray


class MaskTargets(NamedTuple):
    labels: Array    # [B, K]
    masks_s4: Array  # [B, K, H/4, W/4] bool
    valid: Array     # [B, K]


class MSDeformAttnPixelDecoder(nn.Module):
    """Deformable encoder over strides 8/16/32 + fusion to stride-4 mask features."""

    hidden_dim: int = 256
    mask_dim: int = 256
    num_encoder_layers: int = 6
    n_heads: int = 8
    n_points: int = 4
    dtype: Any = jnp.float32
    msda_impl: str = "auto"

    @nn.compact
    def __call__(self, feats: Dict[str, Array], image_sizes: Array, train: bool):
        """feats: res2..res5 NHWC. Returns (mask_features [B,H4,W4,mask_dim],
        multi_scale [3 x [B,h,w,C]])."""
        b = feats["res2"].shape[0]
        srcs, poses = [], []
        # coarsest-first, mirroring the reference's top-down reversal
        # (msdeformattn.py:319 ``transformer_in_features[::-1]``): input_proj_0
        # and level_embed[0] belong to res5, and the decoder's level rotation
        # starts at stride 32 — real-checkpoint parity depends on this order
        for lvl, name in enumerate(("res5", "res4", "res3")):
            src = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype, name=f"input_proj_{lvl}")(
                feats[name]
            )
            src = nn.GroupNorm(num_groups=32, dtype=self.dtype, name=f"input_norm_{lvl}")(src)
            # the reference pixel decoder ignores padding entirely
            # (msdeformattn.py:62 ``masks = zeros``) and uses the plain-cumsum
            # sine convention; match both for checkpoint/AP parity
            vhw = jnp.broadcast_to(
                jnp.asarray([src.shape[1], src.shape[2]], jnp.int32), (b, 2)
            )
            pos = sine_position_embedding(
                vhw, src.shape[1], src.shape[2],
                num_pos_feats=self.hidden_dim // 2, offset=1.0,
            ).astype(self.dtype)
            srcs.append(src)
            poses.append(pos)

        spatial_shapes = tuple((int(s.shape[1]), int(s.shape[2])) for s in srcs)
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, self.hidden_dim)
        )
        src_flat, pos_flat, mask_flat = [], [], []
        for lvl, (src, pos) in enumerate(zip(srcs, poses)):
            h, w = spatial_shapes[lvl]
            src_flat.append(src.reshape(b, h * w, self.hidden_dim))
            pos_flat.append(
                pos.reshape(b, h * w, self.hidden_dim)
                + level_embed[lvl][None, None].astype(pos.dtype)
            )
            mask_flat.append(jnp.zeros((b, h * w), bool))
        src_flat = jnp.concatenate(src_flat, 1)
        pos_flat = jnp.concatenate(pos_flat, 1)
        mask_flat = jnp.concatenate(mask_flat, 1)

        valid_ratios = jnp.ones((b, len(spatial_shapes), 2), jnp.float32)
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)

        if not train:
            # feature-major encoder (see DeformableTransformer.channel_major)
            memT = jnp.swapaxes(src_flat, 1, 2)
            posT = jnp.swapaxes(pos_flat, 1, 2)
            refT = jnp.transpose(enc_ref, (0, 2, 3, 1))
            for i in range(self.num_encoder_layers):
                memT = EncoderLayer(
                    self.hidden_dim, self.hidden_dim * 4, 3, self.n_heads, self.n_points,
                    0.0, self.dtype, self.msda_impl, name=f"encoder_{i}",
                )(memT, posT, refT, spatial_shapes, mask_flat, train, channel_major=True)
            memory = jnp.swapaxes(memT, 1, 2)
        else:
            memory = src_flat
            for i in range(self.num_encoder_layers):
                memory = EncoderLayer(
                    self.hidden_dim, self.hidden_dim * 4, 3, self.n_heads, self.n_points,
                    0.0, self.dtype, self.msda_impl, name=f"encoder_{i}",
                )(memory, pos_flat, enc_ref, spatial_shapes, mask_flat, train)

        # split back into levels
        outs = []
        start = 0
        for h, w in spatial_shapes:
            outs.append(memory[:, start : start + h * w].reshape(b, h, w, self.hidden_dim))
            start += h * w

        # FPN fusion down to stride 4 (reference msdeformattn.py lateral+output convs)
        # reference lateral/output convs carry GN, hence bias=False (d2 Conv2d
        # sets use_bias = norm is None; msdeformattn.py:265-281)
        lateral = nn.Conv(
            self.hidden_dim, (1, 1), use_bias=False, dtype=self.dtype,
            name="adapter_res2",
        )(feats["res2"])
        lateral = nn.GroupNorm(num_groups=32, dtype=self.dtype, name="adapter_norm")(lateral)
        up = resize_bilinear(
            outs[-1].transpose(0, 3, 1, 2), lateral.shape[1], lateral.shape[2]
        ).transpose(0, 2, 3, 1).astype(self.dtype)
        y = lateral + up
        y = nn.Conv(self.hidden_dim, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="output_conv")(y)
        y = nn.relu(nn.GroupNorm(num_groups=32, dtype=self.dtype, name="output_norm")(y))
        mask_features = nn.Conv(self.mask_dim, (1, 1), dtype=self.dtype, name="mask_features")(y)
        return mask_features, outs


class MaskedTransformerDecoder(nn.Module):
    """Masked-attention decoder with per-layer prediction heads (reference :208)."""

    num_classes: int
    hidden_dim: int = 256
    num_queries: int = 100
    n_heads: int = 8
    dim_feedforward: int = 2048
    dec_layers: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, multi_scale: List[Array], mask_features: Array,
                 image_sizes: Array, train: bool):
        b = mask_features.shape[0]
        c = self.hidden_dim
        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (self.num_queries, c))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (self.num_queries, c))
        level_embed = self.param("dec_level_embed", nn.initializers.normal(1.0), (3, c))

        srcs, poses, sizes = [], [], []
        for lvl, f in enumerate(multi_scale):
            h, w = f.shape[1:3]
            # reference decoder pe: mask=None (all valid), plain-cumsum sine
            # (mask2former_transformer_decoder.py:374 pe_layer(x, None))
            vhw = jnp.broadcast_to(jnp.asarray([h, w], jnp.int32), (b, 2))
            pos = sine_position_embedding(
                vhw, h, w, num_pos_feats=c // 2, offset=1.0
            ).astype(self.dtype)
            srcs.append(f.reshape(b, h * w, c) + level_embed[lvl][None, None].astype(f.dtype))
            poses.append(pos.reshape(b, h * w, c))
            sizes.append((h, w))

        output = jnp.broadcast_to(query_feat[None], (b, self.num_queries, c)).astype(self.dtype)
        qpos = jnp.broadcast_to(query_embed[None], (b, self.num_queries, c)).astype(self.dtype)

        decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        class_head = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="class_embed")
        mask_head = MLP(c, mask_features.shape[-1], 3, dtype=self.dtype, name="mask_embed")

        def predict(output, target_size):
            x = decoder_norm(output)
            logits = class_head(x).astype(jnp.float32)
            membed = mask_head(x)
            masks = jnp.einsum("bqc,bhwc->bqhw", membed, mask_features).astype(jnp.float32)
            am = resize_bilinear(masks, *target_size)
            attn_mask = jax.nn.sigmoid(am).reshape(b, self.num_queries, -1) < 0.5
            # a query attending nowhere would NaN the softmax; let it see everything
            all_masked = jnp.all(attn_mask, axis=-1, keepdims=True)
            attn_mask = jnp.where(all_masked, False, attn_mask)
            return logits, masks, jax.lax.stop_gradient(attn_mask)

        pred_logits, pred_masks = [], []
        logits0, masks0, attn_mask = predict(output, sizes[0])
        pred_logits.append(logits0)
        pred_masks.append(masks0)

        for i in range(self.dec_layers):
            lvl = i % 3
            # masked cross attention (True in attn_mask = not allowed)
            ca = MultiHeadAttention(self.n_heads, dtype=self.dtype, name=f"cross_{i}")(
                output + qpos, srcs[lvl] + poses[lvl], srcs[lvl],
                mask=~attn_mask[:, None, :, :],
            )
            output = nn.LayerNorm(dtype=self.dtype, name=f"cross_norm_{i}")(output + ca)
            sa = MultiHeadAttention(self.n_heads, dtype=self.dtype, name=f"self_{i}")(
                output + qpos, output + qpos, output
            )
            output = nn.LayerNorm(dtype=self.dtype, name=f"self_norm_{i}")(output + sa)
            ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name=f"ffn1_{i}")(output)
            ff = nn.Dense(c, dtype=self.dtype, name=f"ffn2_{i}")(nn.relu(ff))
            output = nn.LayerNorm(dtype=self.dtype, name=f"ffn_norm_{i}")(output + ff)

            logits_i, masks_i, attn_mask = predict(output, sizes[(i + 1) % 3])
            pred_logits.append(logits_i)
            pred_masks.append(masks_i)

        query_embeddings = decoder_norm(output)  # MinVIS association embeddings
        return pred_logits, pred_masks, query_embeddings


def maskformer_match_cost(
    logits: Array,    # [Q, C+1]
    masks: Array,     # [Q, H4, W4] logits
    gt_labels: Array, # [K]
    gt_masks: Array,  # [K, H4, W4]
    gt_valid: Array,  # [K]
    cost_class: float = 2.0,
    cost_mask: float = 5.0,
    cost_dice: float = 5.0,
) -> Array:
    probs = jax.nn.softmax(logits, -1)
    c_class = -probs[:, gt_labels]  # [Q, K]
    m = masks.reshape(masks.shape[0], -1)
    g = gt_masks.reshape(gt_masks.shape[0], -1).astype(jnp.float32)
    n_pix = m.shape[1]
    pos = sigmoid_bce_with_logits(m, jnp.ones_like(m)) @ g.T
    neg = sigmoid_bce_with_logits(m, jnp.zeros_like(m)) @ (1 - g).T
    c_mask = (pos + neg) / n_pix
    prob_m = jax.nn.sigmoid(m)
    numer = 2 * (prob_m @ g.T)
    denom = prob_m.sum(1)[:, None] + g.sum(1)[None]
    c_dice = 1 - (numer + 1) / (denom + 1)
    cost = cost_class * c_class + cost_mask * c_mask + cost_dice * c_dice
    return jnp.where(gt_valid[None], cost, 1e9)


class MaskFormer(nn.Module):
    """Frame-level Mask2Former meta-arch (reference maskformer_model.py)."""

    num_classes: int = 40
    hidden_dim: int = 256
    num_queries: int = 100
    dec_layers: int = 9
    enc_layers: int = 6
    dim_feedforward: int = 2048
    backbone_type: str = "resnet"  # "resnet" | "swin" (cfg.MODEL.BACKBONE.NAME)
    backbone_depth: int = 50
    swin: Any = SWIN_PRESETS["L"]  # (embed_dim, depths, heads, window, drop_path)
    no_object_weight: float = 0.1
    deep_supervision: bool = True
    # >0 enables the reference's point-sampled mask losses (12544 points with
    # uncertainty-importance sampling); 0 keeps the dense stride-4 losses
    num_points: int = 0
    dtype: Any = jnp.float32
    msda_impl: str = "auto"

    def setup(self):
        self.backbone = make_backbone(
            self.backbone_type, depth=self.backbone_depth,
            out_features=("res2", "res3", "res4", "res5"), swin=self.swin,
            dtype=self.dtype, name="backbone")
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            hidden_dim=self.hidden_dim, mask_dim=self.hidden_dim,
            num_encoder_layers=self.enc_layers, dtype=self.dtype,
            msda_impl=self.msda_impl, name="pixel_decoder",
        )
        self.decoder = MaskedTransformerDecoder(
            num_classes=self.num_classes, hidden_dim=self.hidden_dim,
            num_queries=self.num_queries, dim_feedforward=self.dim_feedforward,
            dec_layers=self.dec_layers, dtype=self.dtype, name="transformer_decoder",
        )

    def forward_frames(self, images: Array, image_sizes: Array, train: bool = False):
        """images: [T, H, W, 3] -> per-layer logits/masks + query embeddings."""
        if self.backbone_type == "swin":
            feats = self.backbone(images, train)  # train enables drop-path
        else:
            feats = self.backbone(images)
        mask_features, multi_scale = self.pixel_decoder(feats, image_sizes, train)
        logits_l, masks_l, embeds = self.decoder(multi_scale, mask_features, image_sizes, train)
        return logits_l, masks_l, embeds

    def __call__(self, images: Array, image_sizes: Array, targets: MaskTargets,
                 train: bool = True) -> Dict[str, Array]:
        logits_l, masks_l, _ = self.forward_frames(images, image_sizes, train)
        losses: Dict[str, Array] = {}
        layers = range(len(logits_l)) if self.deep_supervision else [len(logits_l) - 1]
        for li in layers:
            logits = logits_l[li]
            masks = masks_l[li]
            # GT masks are stride-4; predicted masks are stride-4 (mask features res)
            cost = jax.vmap(maskformer_match_cost)(
                jax.lax.stop_gradient(logits), jax.lax.stop_gradient(masks),
                targets.labels, targets.masks_s4, targets.valid,
            )  # [B, Q, K]
            assignment = jax.vmap(hungarian)(jnp.transpose(cost, (0, 2, 1)), targets.valid)
            suffix = "" if li == len(logits_l) - 1 else f"_{li}"
            for k, v in self._losses(logits, masks, assignment, targets).items():
                losses[f"{k}{suffix}"] = v
        return losses

    def _losses(self, logits, masks, assignment, targets):
        b, q, _ = logits.shape
        k = assignment.shape[1]
        q_idx = jnp.clip(assignment, 0, q - 1)
        valid = targets.valid & (assignment >= 0)

        target_classes = jnp.full((b, q), self.num_classes, jnp.int32)
        target_classes = jax.vmap(
            lambda tc, qi, lab, v: tc.at[jnp.where(v, qi, q)].set(lab, mode="drop")
        )(target_classes, q_idx, targets.labels, valid)
        logp = jax.nn.log_softmax(logits, -1)
        ce = -jnp.take_along_axis(logp, target_classes[..., None], -1)[..., 0]
        w = jnp.where(target_classes == self.num_classes, self.no_object_weight, 1.0)
        loss_ce = jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)

        src_masks = jnp.take_along_axis(masks, q_idx[..., None, None], axis=1)  # [B,K,H,W]
        gt = targets.masks_s4.astype(jnp.float32)
        num = jnp.maximum(jnp.sum(valid), 1).astype(jnp.float32)
        flat_valid = valid.reshape(-1)
        if self.num_points > 0:
            # reference recipe: point-rend-style sampled BCE + dice
            # (criterion.py loss_masks with uncertainty-weighted point coords)
            from ..ops.point_sample import sampled_mask_losses

            hw = src_masks.shape[-2:]
            loss_mask, loss_dice = sampled_mask_losses(
                src_masks.reshape(b * k, *hw),
                gt.reshape(b * k, *hw),
                flat_valid, num,
                num_points=self.num_points,
                rng=self.make_rng("dropout") if self.has_rng("dropout") else None,
            )
        else:
            flat_src = src_masks.reshape(b * k, -1)
            flat_gt = gt.reshape(b * k, -1)
            bce = sigmoid_bce_with_logits(flat_src, flat_gt).mean(-1)
            loss_mask = jnp.sum(bce * flat_valid) / num
            loss_dice = dice_loss(flat_src, flat_gt, num, valid=flat_valid)
        return {"loss_ce": loss_ce, "loss_mask": loss_mask, "loss_dice": loss_dice}

    def inference(self, images: Array, image_sizes: Array) -> Dict[str, Array]:
        logits_l, masks_l, embeds = self.forward_frames(images, image_sizes, train=False)
        return {
            "pred_logits": logits_l[-1],   # [T, Q, C+1]
            "pred_masks": masks_l[-1],     # [T, Q, H4, W4]
            "pred_embds": embeds,          # [T, Q, C]
        }


def minvis_match_from_embds(
    tgt_embds: np.ndarray, cur_embds: np.ndarray,
    motion_mask: Optional[np.ndarray] = None, current_mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Frame-to-frame query alignment (reference video_maskformer_model.py:326).

    Returns the permutation aligning current-frame queries to the previous frame.
    """
    from scipy.optimize import linear_sum_assignment

    cur = cur_embds / np.maximum(np.linalg.norm(cur_embds, axis=1, keepdims=True), 1e-12)
    tgt = tgt_embds / np.maximum(np.linalg.norm(tgt_embds, axis=1, keepdims=True), 1e-12)
    cost = 1 - cur @ tgt.T
    if motion_mask is not None and current_mask is not None:
        cm = (current_mask > 0).reshape(len(current_mask), -1).astype(np.float32)
        mm = (1 / (1 + np.exp(-motion_mask)) > 0.5).reshape(len(motion_mask), -1).astype(np.float32)
        inter = cm @ mm.T
        union = cm.sum(1)[:, None] + mm.sum(1)[None] - inter
        iou = (inter + 1e-6) / (union + 1e-6)
        cost = 1.0 * cost + 0.5 * (1 - iou)
    _, indices = linear_sum_assignment(cost.T)
    return indices


def minvis_postprocess(outputs: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Align queries across frames by embedding matching (reference :348-368)."""
    logits = np.asarray(outputs["pred_logits"])
    masks = np.asarray(outputs["pred_masks"])
    embds = np.asarray(outputs["pred_embds"])
    t = len(logits)
    out_l, out_m = [logits[0]], [masks[0]]
    prev = embds[0]
    for f in range(1, t):
        perm = minvis_match_from_embds(prev, embds[f])
        out_l.append(logits[f][perm])
        out_m.append(masks[f][perm])
        prev = embds[f][perm]
    return {"pred_logits": np.stack(out_l), "pred_masks": np.stack(out_m)}


def build_maskformer_model(cfg, dtype=None) -> MaskFormer:
    """Construct MaskFormer from a CfgNode (reference maskformer_model.py from_config)."""
    import jax.numpy as jnp

    if dtype is None:
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    m = cfg.MODEL.MASK_FORMER
    return MaskFormer(
        num_classes=m.NUM_CLASSES,
        hidden_dim=m.HIDDEN_DIM,
        num_queries=m.NUM_OBJECT_QUERIES,
        dec_layers=m.DEC_LAYERS,
        enc_layers=m.ENC_LAYERS,
        dim_feedforward=m.DIM_FEEDFORWARD,
        no_object_weight=m.NO_OBJECT_WEIGHT,
        **backbone_kwargs_from_cfg(cfg),
        deep_supervision=m.DEEP_SUPERVISION,
        num_points=m.TRAIN_NUM_POINTS,
        dtype=dtype,
        msda_impl=cfg.TPU.MSDA_IMPL,
    )


def maskformer_weight_dict(cfg) -> dict:
    """Per-loss weights incl. deep-supervision aux terms (reference criterion wiring)."""
    m = cfg.MODEL.MASK_FORMER
    base = {"loss_ce": m.CLASS_WEIGHT, "loss_mask": m.MASK_WEIGHT, "loss_dice": m.DICE_WEIGHT}
    out = dict(base)
    if m.DEEP_SUPERVISION:
        # the decoder emits DEC_LAYERS+1 prediction sets (the pre-decoder
        # query prediction + one per layer, reference
        # mask2former_transformer_decoder.py) -> DEC_LAYERS aux terms
        for i in range(m.DEC_LAYERS):
            out.update({f"{k}_{i}": v for k, v in base.items()})
    return out
