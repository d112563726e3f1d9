from .backbones.resnet import BACKBONE_REGISTRY, ResNet, build_resnet_backbone
from .condinst import MaskHeadSmallConv, num_dynamic_params, run_dynamic_mask_head
from .criterion import Targets, default_weight_dict
from .deformable_transformer import DeformableTransformer, MSDeformAttnModule
from .idol import IDOL, META_ARCH_REGISTRY, build_idol_model
from .layers import MLP, ConvGN, FrozenBatchNorm, MultiHeadAttention, inverse_sigmoid
from .matcher import MatchResult, match, pos_neg_masks
from .position_encoding import sine_position_embedding
from .seqformer import ClipTargets, SeqFormer, build_seqformer_model


def build_model(cfg):
    """Build the configured meta-architecture (reference: modeling/meta_arch/build.py:16)."""
    name = cfg.MODEL.META_ARCHITECTURE
    builder = {"IDOL": build_idol_model, "SeqFormer": build_seqformer_model}.get(name)
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
from .tta import DetectorWithTTA  # noqa: E402

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
]
