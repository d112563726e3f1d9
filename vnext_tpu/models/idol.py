"""IDOL meta-architecture (flax): online VIS with contrastive ReID.

Capability parity with projects/IDOL/idol/idol.py:72 (IDOL) +
idol/models/segmentation_condInst.py:31 (CondInst_segm) +
idol/models/deformable_detr.py:42 (DeformableDETR, with_box_refine=True), rebuilt
TPU-first:

- one fixed-shape jitted function for the train forward (key+ref frames) and one
  for per-clip inference — no python loops over images/instances;
- simOTA matching runs on device per decoder layer (models/matcher.py), removing
  the reference's 6 host syncs per step (SURVEY.md §3.1 "hidden sync points");
- matched instances live in ``max_insts`` padded slots for the dynamic mask head.

Key/ref frame batching: the reference interleaves key/ref frames in one batch and
splits with strided indexing (idol.py:131-140); here the caller passes separate
[B, H, W, 3] key and ref tensors, which is the same computation without the
shuffle.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.registry import Registry
from .backbones import SWIN_PRESETS, backbone_kwargs_from_cfg, make_backbone
from .condinst import MaskHeadSmallConv, num_dynamic_params, run_dynamic_mask_head
from .criterion import (
    Targets,
    default_weight_dict,
    loss_boxes,
    loss_labels,
    loss_masks,
    loss_reid,
)
from .deformable_transformer import DeformableTransformer
from .layers import MLP, ConvGN
from .matcher import MatchResult, match, pos_neg_masks
from .position_encoding import sine_position_embedding

Array = jnp.ndarray

META_ARCH_REGISTRY = Registry("META_ARCH")

FEATURE_STRIDES = (8, 16, 32, 64)


def _class_bias_init(key, shape, dtype=jnp.float32):
    prior_prob = 0.01
    return jnp.full(shape, -math.log((1 - prior_prob) / prior_prob), dtype)


@META_ARCH_REGISTRY.register()
class IDOL(nn.Module):
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
    stride_in_1x1: bool = False  # IDOL configs use the torchvision layout
    swin: Any = SWIN_PRESETS["L"]  # (embed_dim, depths, heads, window, drop_path)
    dropout: float = 0.1
    rel_coord: bool = True
    mask_out_stride: int = 4
    max_insts: int = 48
    focal_alpha: float = 0.25
    dtype: Any = jnp.float32
    msda_impl: str = "auto"

    def setup(self):
        self.backbone = make_backbone(
            self.backbone_type,
            depth=self.backbone_depth,
            out_features=("res3", "res4", "res5"),
            stride_in_1x1=self.stride_in_1x1,
            swin=self.swin,
            dtype=self.dtype,
            name="backbone",
        )
        # 1x1 projections for res3/4/5 + one 3x3/s2 projection making the stride-64 level
        projs = []
        for i in range(self.num_feature_levels):
            extra = i >= 3
            projs.append(
                ConvGN(
                    self.hidden_dim,
                    kernel_size=3 if extra else 1,
                    stride=2 if extra else 1,
                    dtype=self.dtype,
                    name=f"input_proj_{i}",
                )
            )
        self.input_proj = projs
        self.transformer = DeformableTransformer(
            d_model=self.hidden_dim,
            n_heads=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            d_ffn=self.dim_feedforward,
            dropout=self.dropout,
            num_feature_levels=self.num_feature_levels,
            enc_n_points=self.enc_n_points,
            dec_n_points=self.dec_n_points,
            with_box_refine=True,
            dtype=self.dtype,
            msda_impl=self.msda_impl,
            name="transformer",
        )
        self.class_embed = [
            nn.Dense(
                self.num_classes,
                dtype=self.dtype,
                bias_init=_class_bias_init,
                name=f"class_embed_{i}",
            )
            for i in range(self.dec_layers)
        ]
        self.controller = MLP(
            self.hidden_dim,
            num_dynamic_params(self.hidden_dim // 32, self.rel_coord),
            3,
            dtype=self.dtype,
            name="controller",
        )
        self.mask_head = MaskHeadSmallConv(self.hidden_dim, dtype=self.dtype, name="mask_head")
        self.reid_embed = MLP(self.hidden_dim, self.hidden_dim, 3, dtype=self.dtype, name="reid_embed")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.hidden_dim * 2)
        )

    # ------------------------------------------------------------------ features
    def extract_features(self, images: Array, image_sizes: Array, train: bool = False):
        """images: [B, H, W, 3] normalized; image_sizes: [B, 2] true (h, w)."""
        if self.backbone_type == "swin":
            feats = self.backbone(images, train)  # train enables drop-path
        else:
            feats = self.backbone(images)
        return self.project_features(
            [feats["res3"], feats["res4"], feats["res5"]], image_sizes
        )

    def project_features(self, base: List[Array], image_sizes: Array):
        """Multi-level projection from backbone features [res3, res4, res5].

        Split from extract_features so tests (and alternative backbones) can
        inject features at the backbone boundary.
        """
        srcs, valid_hw, poses = [], [], []
        for lvl in range(self.num_feature_levels):
            if lvl < 3:
                src = self.input_proj[lvl](base[lvl])
            elif lvl == 3:
                src = self.input_proj[lvl](base[2])
            else:
                src = self.input_proj[lvl](srcs[-1])
            stride = FEATURE_STRIDES[lvl]
            vhw = jnp.minimum(
                -(-image_sizes // stride),  # ceil division
                jnp.asarray([src.shape[1], src.shape[2]], dtype=image_sizes.dtype),
            )
            pos = sine_position_embedding(
                vhw, src.shape[1], src.shape[2], num_pos_feats=self.hidden_dim // 2
            ).astype(self.dtype)
            srcs.append(src)
            valid_hw.append(vhw)
            poses.append(pos)
        return srcs, valid_hw, poses

    def forward_single(
        self, images: Array, image_sizes: Array, train: bool, base_feats=None
    ):
        """Backbone + transformer + per-layer class/box predictions for one frame batch."""
        if base_feats is None:
            srcs, valid_hw, poses = self.extract_features(images, image_sizes, train)
        else:
            srcs, valid_hw, poses = self.project_features(base_feats, image_sizes)
        spatial_shapes = tuple((int(s.shape[1]), int(s.shape[2])) for s in srcs)
        hs, memory, init_ref, inter_refs, out_coords = self.transformer(
            srcs, valid_hw, poses, self.query_embed, train=train
        )
        logits = jnp.stack(
            [self.class_embed[i](hs[i]).astype(jnp.float32) for i in range(self.dec_layers)]
        )
        # reference points *before* each decoder layer (sigmoid space):
        pre_refs = [init_ref[..., :2]] + [inter_refs[i][..., :2] for i in range(self.dec_layers - 1)]
        return {
            "hs": hs,
            "memory": memory,
            "logits": logits,             # [L, B, Q, C]
            "boxes": out_coords,          # [L, B, Q, 4] cxcywh (undetached)
            "pre_refs": pre_refs,         # list of [B, Q, 2]
            "spatial_shapes": spatial_shapes,
        }

    def _mask_features(self, memory: Array, spatial_shapes) -> Array:
        """Slice flattened memory back into the 3 finest levels and fuse."""
        feats = []
        start = 0
        b = memory.shape[0]
        for h, w in spatial_shapes[:3]:
            feats.append(memory[:, start : start + h * w].reshape(b, h, w, -1))
            start += h * w
        # skip stride-64 level (reference uses num_feature_levels-1 levels, :332)
        return self.mask_head(feats)

    # ------------------------------------------------------------------ training
    def __call__(
        self,
        key_images: Array,      # [B, H, W, 3]
        key_sizes: Array,       # [B, 2]
        ref_images: Array,
        ref_sizes: Array,
        det_targets: Targets,
        ref_targets: Targets,
        train: bool = True,
    ) -> Dict[str, Array]:
        out_key = self.forward_single(key_images, key_sizes, train)
        out_ref = self.forward_single(ref_images, ref_sizes, train)

        mask_feats = self._mask_features(out_key["memory"], out_key["spatial_shapes"])
        losses: Dict[str, Array] = {}
        last_match: Optional[MatchResult] = None
        for lvl in range(self.dec_layers):
            logits_l = out_key["logits"][lvl]
            boxes_l = out_key["boxes"][lvl]
            m = match(
                jax.lax.stop_gradient(logits_l),
                jax.lax.stop_gradient(boxes_l),
                det_targets.labels,
                det_targets.boxes,
                det_targets.valid,
            )
            last_match = m
            suffix = "" if lvl == self.dec_layers - 1 else f"_{lvl}"
            losses[f"loss_ce{suffix}"] = loss_labels(
                logits_l, m, det_targets, self.num_classes, self.focal_alpha
            )
            for k, v in loss_boxes(boxes_l, m, det_targets).items():
                losses[f"{k}{suffix}"] = v

            # fixed-capacity matched-instance slots for the dynamic mask head
            sel_score = m.selected_query.astype(jnp.float32)
            _, inst_query = jax.lax.top_k(sel_score, self.max_insts)     # [B, N]
            inst_valid = jnp.take_along_axis(m.selected_query, inst_query, axis=1)
            inst_gt = jnp.take_along_axis(m.gt_index, inst_query, axis=1)

            params = self.controller(out_key["hs"][lvl])                  # [B, Q, P]
            params_sel = jnp.take_along_axis(params, inst_query[..., None], axis=1)
            ref_pts = out_key["pre_refs"][lvl]                            # [B, Q, 2]
            scale = key_sizes[:, ::-1].astype(jnp.float32)[:, None, :]    # (w, h)
            ref_pts = jnp.take_along_axis(ref_pts * scale, inst_query[..., None], axis=1)
            mask_logits = run_dynamic_mask_head(
                mask_feats,
                ref_pts,
                params_sel,
                rel_coord=self.rel_coord,
                mask_feat_stride=8,
                mask_out_stride=self.mask_out_stride,
            )
            for k, v in loss_masks(mask_logits, inst_gt, inst_valid, det_targets).items():
                losses[f"{k}{suffix}"] = v

        # contrastive ReID on the final layer (reference :418 loss_reid)
        key_embeds = self.reid_embed(out_key["hs"][-1])
        ref_embeds = self.reid_embed(out_ref["hs"][-1])
        ref_cls = jax.nn.sigmoid(jax.lax.stop_gradient(out_ref["logits"][-1]))
        ref_box = jax.lax.stop_gradient(out_ref["boxes"][-1])
        item_valid = det_targets.valid & ref_targets.valid
        pos_mask, neg_mask = jax.vmap(pos_neg_masks)(
            ref_cls, ref_box, ref_targets.labels, ref_targets.boxes, item_valid
        )
        losses.update(
            loss_reid(
                key_embeds,
                ref_embeds,
                last_match.matched_query_per_gt,
                pos_mask,
                neg_mask,
                item_valid,
            )
        )
        return losses

    # ------------------------------------------------------------------ inference
    def inference(
        self, images: Array, image_sizes: Array, base_feats=None
    ) -> Dict[str, Array]:
        """Per-clip forward (reference: segmentation_condInst.py:234 inference_forward).

        images: [T, H, W, 3] — frames of one video clip as the batch dimension.
        Returns pred_logits [T, Q, C], pred_boxes [T, Q, 4], pred_inst_embed
        [T, Q, C'], pred_masks [T, Q, H/4, W/4].
        """
        out = self.forward_single(images, image_sizes, train=False, base_feats=base_feats)
        logits = out["logits"][-1]
        boxes = out["boxes"][-1]
        inst_embed = self.reid_embed(out["hs"][-1])

        mask_feats = self._mask_features(out["memory"], out["spatial_shapes"])
        params = self.controller(out["hs"][-1])
        ref_pts = out["pre_refs"][-1]  # == inter_references[-2][..., :2] in the reference
        scale = image_sizes[:, ::-1].astype(jnp.float32)[:, None, :]
        masks = run_dynamic_mask_head(
            mask_feats,
            ref_pts * scale,
            params,
            rel_coord=self.rel_coord,
            mask_feat_stride=8,
            mask_out_stride=self.mask_out_stride,
        )
        return {
            "pred_logits": logits,
            "pred_boxes": boxes,
            "pred_inst_embed": inst_embed,
            "pred_masks": masks,
        }


def build_idol_model(cfg, dtype=None) -> IDOL:
    """Construct IDOL from a CfgNode (keys: MODEL.IDOL.*, reference idol/config.py)."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    c = cfg.MODEL.IDOL
    return IDOL(
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
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        dropout=c.DROPOUT,
        mask_out_stride=c.MASK_STRIDE,
        max_insts=cfg.TPU.MAX_INSTANCES,
        dtype=dtype,
        msda_impl=cfg.TPU.MSDA_IMPL,
        **backbone_kwargs_from_cfg(cfg),
    )
