from .backbones.resnet import BACKBONE_REGISTRY, ResNet, build_resnet_backbone
from .condinst import MaskHeadSmallConv, num_dynamic_params, run_dynamic_mask_head
from .criterion import Targets, default_weight_dict
from .deformable_transformer import DeformableTransformer, MSDeformAttnModule
from .idol import IDOL, META_ARCH_REGISTRY, build_idol_model
from .layers import MLP, ConvGN, FrozenBatchNorm, MultiHeadAttention, inverse_sigmoid
from .matcher import MatchResult, match, pos_neg_masks
from .position_encoding import sine_position_embedding
from .seqformer import ClipTargets, SeqFormer, build_seqformer_model


def _build_rcnn(cfg, panoptic=False):
    import jax.numpy as jnp

    from .rcnn import GeneralizedRCNN, PanopticFPN

    cls = PanopticFPN if panoptic else GeneralizedRCNN
    kwargs = dict(
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        backbone_depth=cfg.MODEL.RESNETS.DEPTH,
        fpn_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        proposals_per_image=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
        roi_batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
        roi_pos_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        mask_on=cfg.MODEL.MASK_ON,
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
        test_score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
        test_nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
        max_detections=cfg.TEST.DETECTIONS_PER_IMAGE,
        cascade_on=cfg.MODEL.ROI_HEADS.NAME == "CascadeROIHeads",
        dtype=jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32,
    )
    if panoptic:
        kwargs.update(
            sem_seg_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
            sem_seg_ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE,
            sem_seg_loss_weight=cfg.MODEL.SEM_SEG_HEAD.LOSS_WEIGHT,
        )
    return cls(**kwargs)


def build_model(cfg):
    """Build the configured meta-architecture (reference: modeling/meta_arch/build.py:16)."""
    name = cfg.MODEL.META_ARCHITECTURE

    def _retinanet(cfg):
        from .retinanet import RetinaNet

        return RetinaNet(num_classes=cfg.MODEL.RETINANET.NUM_CLASSES,
                         backbone_depth=cfg.MODEL.RESNETS.DEPTH)

    def _fcos(cfg):
        from .fcos import FCOS

        return FCOS(num_classes=cfg.MODEL.FCOS.NUM_CLASSES,
                    backbone_depth=cfg.MODEL.RESNETS.DEPTH)

    def _semseg(cfg):
        from .semantic_seg import SemanticSegmentor

        return SemanticSegmentor(num_classes=cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES,
                                 backbone_depth=cfg.MODEL.RESNETS.DEPTH,
                                 ignore_value=cfg.MODEL.SEM_SEG_HEAD.IGNORE_VALUE)

    def _proposal(cfg):
        from .rcnn import ProposalNetwork

        return ProposalNetwork(backbone_depth=cfg.MODEL.RESNETS.DEPTH,
                               fpn_channels=cfg.MODEL.FPN.OUT_CHANNELS,
                               proposals_per_image=cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN)

    def _maskformer(cfg):
        from .mask2former import build_maskformer_model

        return build_maskformer_model(cfg)

    builder = {
        "IDOL": build_idol_model,
        "SeqFormer": build_seqformer_model,
        "MaskFormer": _maskformer,
        "VideoMaskFormer_frame": _maskformer,  # reference minvis registry name
        "GeneralizedRCNN": _build_rcnn,
        "PanopticFPN": lambda c: _build_rcnn(c, panoptic=True),
        "ProposalNetwork": _proposal,
        "RetinaNet": _retinanet,
        "FCOS": _fcos,
        "SemanticSegmentor": _semseg,
    }.get(name)
    if builder is None:
        # fall back to registry classes constructed with defaults
        return META_ARCH_REGISTRY.get(name)()
    return builder(cfg)


__all__ = [
    "BACKBONE_REGISTRY",
    "ResNet",
    "build_resnet_backbone",
    "MaskHeadSmallConv",
    "num_dynamic_params",
    "run_dynamic_mask_head",
    "Targets",
    "default_weight_dict",
    "DeformableTransformer",
    "MSDeformAttnModule",
    "IDOL",
    "META_ARCH_REGISTRY",
    "build_idol_model",
    "build_model",
    "MLP",
    "ConvGN",
    "FrozenBatchNorm",
    "MultiHeadAttention",
    "inverse_sigmoid",
    "MatchResult",
    "match",
    "pos_neg_masks",
    "sine_position_embedding",
]

from .backbones.regnet import RegNet  # noqa: E402
from .cascade_rcnn import CascadeROIHeads  # noqa: E402
from .fcos import FCOS  # noqa: E402
from .instmove import InstMovePredictor, motion_match_cost  # noqa: E402
from .mask2former import MaskFormer, MaskTargets, minvis_postprocess  # noqa: E402
from .rcnn import (  # noqa: E402
    GeneralizedRCNN,
    PanopticFPN,
    ProposalNetwork,
    RPN,
    StandardROIHeads,
)
from .retinanet import DetTargets, RetinaNet  # noqa: E402
from .roi_heads_extra import (  # noqa: E402
    Box2BoxTransformRotated,
    KRCNNConvDeconvUpsampleHead,
    Res5ROIHeads,
    RROIHeads,
)
from .semantic_seg import SemanticSegmentor, combine_semantic_and_instance_outputs  # noqa: E402
from .tta import DetectorWithTTA, GeneralizedRCNNWithTTA  # noqa: E402

__all__ += [
    "RegNet",
    "CascadeROIHeads",
    "FCOS",
    "InstMovePredictor",
    "motion_match_cost",
    "MaskFormer",
    "MaskTargets",
    "minvis_postprocess",
    "GeneralizedRCNN",
    "PanopticFPN",
    "ProposalNetwork",
    "StandardROIHeads",
    "RPN",
    "DetTargets",
    "RetinaNet",
    "Box2BoxTransformRotated",
    "KRCNNConvDeconvUpsampleHead",
    "Res5ROIHeads",
    "RROIHeads",
    "SemanticSegmentor",
    "combine_semantic_and_instance_outputs",
    "DetectorWithTTA",
    "GeneralizedRCNNWithTTA",
]
