"""Full-model numerical parity against the ACTUAL reference PyTorch code.

Builds the reference IDOL head stack (DeformableTransformer + DeformableDETR +
CondInst_segm, projects/IDOL/idol/models/*) on CPU using the reference's own
pure-PyTorch MSDeformAttn fallback (ms_deform_attn_func.py:42
``ms_deform_attn_core_pytorch``), exports its state_dict, imports it through
``checkpoint/torch_import.py``, and asserts logits / boxes / reid embeds /
masks match the vnext_tpu IDOL end to end.

The reference's CUDA extension, torchvision, and fvcore are absent in this
environment, so minimal import stubs are injected (the stubbed symbols are
never exercised beyond a version string and the MSDA dispatch, which is routed
back to the reference's own grid_sample fallback). The detectron2 ResNet is
not importable without fvcore/yacs, so parity is cut at the backbone boundary:
both sides consume identical multi-scale features (our IDOL grows
``base_feats`` injection for exactly this purpose); everything downstream —
input projections, position encodings, padding masks, encoder/decoder,
box refinement, CondInst dynamic mask head, ReID head — runs both
implementations in full.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/projects/IDOL"

# tiny but structurally complete: 4 levels, box refine, rel-coord mask head
HIDDEN = 64
NHEADS = 4
ENC_LAYERS = 2
DEC_LAYERS = 2
FFN = 128
QUERIES = 12
CLASSES = 7
LEVELS = 4


def _install_stubs():
    if "MultiScaleDeformableAttention" not in sys.modules:
        sys.modules["MultiScaleDeformableAttention"] = types.ModuleType(
            "MultiScaleDeformableAttention"
        )
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__version__ = "0.15.2"
        tv.ops = types.ModuleType("torchvision.ops")
        tv.ops.boxes = types.ModuleType("torchvision.ops.boxes")

        def box_area(boxes):  # torchvision.ops.boxes.box_area semantics
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        tv.ops.boxes.box_area = box_area
        tv.ops.box_area = box_area
        tv.models = types.ModuleType("torchvision.models")
        tv.models._utils = types.ModuleType("torchvision.models._utils")
        tv.models._utils.IntermediateLayerGetter = object
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = tv.ops
        sys.modules["torchvision.ops.boxes"] = tv.ops.boxes
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.models._utils"] = tv.models._utils
    if "detectron2.structures" not in sys.modules:
        d2 = sys.modules.setdefault("detectron2", types.ModuleType("detectron2"))
        d2s = types.ModuleType("detectron2.structures")
        d2s.Instances = object  # only referenced by post-processing we don't call
        d2s.ROIMasks = object
        d2.structures = d2s
        sys.modules["detectron2.structures"] = d2s
    fv = sys.modules.setdefault("fvcore", types.ModuleType("fvcore"))
    fvnn = sys.modules.setdefault("fvcore.nn", types.ModuleType("fvcore.nn"))
    fv.nn = fvnn
    if not hasattr(fvnn, "giou_loss"):

        def giou_loss(*a, **k):  # imported by deformable_detr, unused at eval
            raise NotImplementedError

        fvnn.giou_loss = giou_loss
        fvnn.smooth_l1_loss = giou_loss


@pytest.fixture(scope="module")
def ref_modules():
    _install_stubs()
    # register "idol" as a namespace-style package WITHOUT executing its
    # __init__.py (which pulls in detectron2.config, unimportable here)
    if "idol" not in sys.modules:
        pkg = types.ModuleType("idol")
        pkg.__path__ = [f"{REF}/idol"]
        pkg.__package__ = "idol"
        sys.modules["idol"] = pkg
    from idol.models import deformable_transformer as dt
    from idol.models import deformable_detr as dd
    from idol.models import segmentation_condInst as sc
    from idol.models.backbone import Joiner
    from idol.models.position_encoding import PositionEmbeddingSine
    from idol.models.ops.functions import ms_deform_attn_func as func
    from idol.util.misc import NestedTensor

    # route the CUDA-extension entry point to the reference's own
    # grid_sample fallback (exactly what idol/models/ops/test.py validates)
    msda_stub = sys.modules["MultiScaleDeformableAttention"]

    def ms_deform_attn_forward(value, shapes, level_start_index, loc, attn, step):
        shp = [(int(h), int(w)) for h, w in shapes.tolist()]
        return func.ms_deform_attn_core_pytorch(value, shp, loc, attn)

    msda_stub.ms_deform_attn_forward = ms_deform_attn_forward
    return types.SimpleNamespace(
        dt=dt, dd=dd, sc=sc, Joiner=Joiner,
        PositionEmbeddingSine=PositionEmbeddingSine, NestedTensor=NestedTensor,
    )


class _FeatureBackbone(torch.nn.Module):
    """Stand-in for the d2 ResNet: returns precomputed res2..res5 NestedTensors."""

    def __init__(self, feats):
        super().__init__()
        self.feats = feats  # dict name -> tensor [B, C, H, W]

    def forward(self, tensor_list):
        out = {}
        m = tensor_list.mask
        for name, x in self.feats.items():
            mask = (
                torch.nn.functional.interpolate(m[None].float(), size=x.shape[-2:])
                .to(torch.bool)[0]
            )
            out[name] = type(tensor_list)(x, mask)
        return out


def _build_reference(ref, feats):
    backbone = ref.Joiner(
        _FeatureBackbone(feats), ref.PositionEmbeddingSine(HIDDEN // 2, normalize=True)
    )
    backbone.num_channels = [feats["res3"].shape[1], feats["res4"].shape[1], feats["res5"].shape[1]]
    backbone.strides = [8, 16, 32]
    transformer = ref.dt.DeformableTransformer(
        d_model=HIDDEN, nhead=NHEADS,
        num_encoder_layers=ENC_LAYERS, num_decoder_layers=DEC_LAYERS,
        dim_feedforward=FFN, dropout=0.0, activation="relu",
        return_intermediate_dec=True, num_frames=1,
        num_feature_levels=LEVELS, dec_n_points=4, enc_n_points=4,
    )
    detr = ref.dd.DeformableDETR(
        backbone, transformer, num_classes=CLASSES, num_frames=1,
        num_queries=QUERIES, num_feature_levels=LEVELS,
        aux_loss=True, with_box_refine=True,
    )
    model = ref.sc.CondInst_segm(detr, rel_coord=True, freeze_detr=False)
    model.eval()
    return model


def _make_inputs(seed=0, B=2, H=128, W=192, true_sizes=((128, 192), (64, 128))):
    """Multiples of 64 everywhere so padding masks are exact on both sides."""
    rng = np.random.RandomState(seed)
    images = rng.randn(B, 3, H, W).astype(np.float32)
    feats = {}
    chans = {"res2": 24, "res3": 40, "res4": 56, "res5": 72}
    for name, stride in (("res2", 4), ("res3", 8), ("res4", 16), ("res5", 32)):
        feats[name] = rng.randn(B, chans[name], H // stride, W // stride).astype(np.float32)
    mask = np.ones((B, H, W), bool)
    for i, (h, w) in enumerate(true_sizes):
        mask[i, :h, :w] = False
    return images, feats, mask, true_sizes


def _ref_outputs(ref, feats_np, images, mask, true_sizes):
    feats = {k: torch.from_numpy(v) for k, v in feats_np.items()}
    model = _build_reference(ref, feats)
    samples = ref.NestedTensor(torch.from_numpy(images), torch.from_numpy(mask))
    samples.image_sizes = list(true_sizes)
    with torch.no_grad():
        out = model.inference_forward(samples, size_divisib=32)
    sd = {f"detr.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    return out, sd


def _our_outputs(feats_np, sd, true_sizes, H, W):
    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.torch_import import apply_to_params, convert_idol_checkpoint
    from vnext_tpu.models.idol import IDOL

    model = IDOL(
        num_classes=CLASSES, hidden_dim=HIDDEN, num_queries=QUERIES,
        nheads=NHEADS, dim_feedforward=FFN, enc_layers=ENC_LAYERS,
        dec_layers=DEC_LAYERS, num_feature_levels=LEVELS, dropout=0.0,
        msda_impl="jnp", dtype=jnp.float32,
    )
    base = [
        jnp.moveaxis(jnp.asarray(feats_np[n]), 1, 3) for n in ("res3", "res4", "res5")
    ]
    sizes = jnp.asarray(true_sizes, jnp.int32)
    B = base[0].shape[0]
    images = jnp.zeros((B, H, W, 3), jnp.float32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, sizes,
        base_feats=base, method=IDOL.inference,
    )
    flat = convert_idol_checkpoint(
        sd, dec_layers=DEC_LAYERS, enc_layers=ENC_LAYERS, num_feature_levels=LEVELS
    )
    params, report = apply_to_params(flat, variables["params"])
    assert not report["shape_mismatch"], report["shape_mismatch"]
    # everything except the (uninstantiated-on-the-reference-side) backbone
    non_backbone_missing = [p for p in report["missing"] if p[0] != "backbone"]
    assert not non_backbone_missing, non_backbone_missing

    out = model.apply(
        {"params": params}, images, sizes, base_feats=base, method=IDOL.inference
    )
    return out


def test_idol_full_model_parity(ref_modules):
    """logits/boxes/embeds/masks match the reference network end to end."""
    H, W = 128, 192
    true_sizes = ((128, 192), (64, 128))
    images, feats, mask, _ = _make_inputs(H=H, W=W, true_sizes=true_sizes)
    ref_out, sd = _ref_outputs(ref_modules, feats, images, mask, true_sizes)
    ours = _our_outputs(feats, sd, true_sizes, H, W)

    def diff(a, b):
        return float(np.max(np.abs(np.asarray(a) - b.detach().numpy())))

    assert diff(ours["pred_logits"], ref_out["pred_logits"]) < 1e-4
    assert diff(ours["pred_boxes"], ref_out["pred_boxes"]) < 1e-4
    assert diff(ours["pred_inst_embed"], ref_out["pred_inst_embed"]) < 1e-4
    ref_masks = ref_out["pred_masks"].squeeze(2)  # [B, Q, 1, h, w] -> [B, Q, h, w]
    # mask logits reach |30|; compare with a relative term so f32
    # accumulation-order wobble (~4e-5 rel) can't flake the threshold
    np.testing.assert_allclose(
        np.asarray(ours["pred_masks"]),
        ref_masks.detach().numpy(),
        rtol=2e-4,
        atol=1e-3,
    )


# ---------------------------------------------------------------------------
# FULL-SIZE parity, backbone included (round-2 verdict item 2): the real R50
# IDOL configuration (256 hidden, 8 heads, 6+6 layers, 1024 FFN, 300 queries)
# with the REAL detectron2 ResNet-50 (loaded verbatim by
# test_reference_backbone_parity._load_d2_resnet) inside the reference stack,
# diffed pixels-to-masks against our full IDOL with imported weights.
# ---------------------------------------------------------------------------

FULL_HIDDEN = 256
FULL_HEADS = 8
FULL_LAYERS = 6
FULL_FFN = 1024
FULL_QUERIES = 300
FULL_CLASSES = 40


class _D2ResNetBackbone(torch.nn.Module):
    """MaskedBackbone (idol/idol.py:35) equivalent wrapping the real d2 R50:
    runs the backbone on the padded tensor and downsamples the padding mask
    per feature level."""

    def __init__(self, resnet):
        super().__init__()
        self.backbone = resnet

    def forward(self, tensor_list):
        feats = self.backbone(tensor_list.tensors)
        m = tensor_list.mask
        out = {}
        # all four levels, like MaskedBackbone: DeformableDETR drops the
        # first (res2) itself via features[1:]
        for name in ("res2", "res3", "res4", "res5"):
            x = feats[name]
            mask = (
                torch.nn.functional.interpolate(m[None].float(), size=x.shape[-2:])
                .to(torch.bool)[0]
            )
            out[name] = type(tensor_list)(x, mask)
        return out


def _build_full_reference(ref, d2r, seed=11):
    from tests.test_reference_backbone_parity import _build_d2

    resnet = _build_d2(d2r, 50, stride_in_1x1=False, seed=seed)
    backbone = ref.Joiner(
        _D2ResNetBackbone(resnet),
        ref.PositionEmbeddingSine(FULL_HIDDEN // 2, normalize=True),
    )
    backbone.num_channels = [512, 1024, 2048]
    backbone.strides = [8, 16, 32]
    transformer = ref.dt.DeformableTransformer(
        d_model=FULL_HIDDEN, nhead=FULL_HEADS,
        num_encoder_layers=FULL_LAYERS, num_decoder_layers=FULL_LAYERS,
        dim_feedforward=FULL_FFN, dropout=0.0, activation="relu",
        return_intermediate_dec=True, num_frames=1,
        num_feature_levels=LEVELS, dec_n_points=4, enc_n_points=4,
    )
    detr = ref.dd.DeformableDETR(
        backbone, transformer, num_classes=FULL_CLASSES, num_frames=1,
        num_queries=FULL_QUERIES, num_feature_levels=LEVELS,
        aux_loss=True, with_box_refine=True,
    )
    model = ref.sc.CondInst_segm(detr, rel_coord=True, freeze_detr=False)
    model.eval()
    return model


def test_idol_full_size_parity_with_backbone(ref_modules):
    """Real-config IDOL-R50 at an eval-like shape: full pixels-to-masks diff.

    Covers what the tiny-config test cannot: f32 accumulation over 6 encoder
    layers at 256-dim, 300-query box refinement, and the d2-ResNet backbone
    numerics inside the same graph."""
    from tests.test_reference_backbone_parity import _load_d2_resnet

    d2r = _load_d2_resnet()
    model = _build_full_reference(ref_modules, d2r)

    H, W = 192, 320
    true_sizes = ((192, 320), (128, 256))
    rng = np.random.RandomState(5)
    images = rng.randn(2, 3, H, W).astype(np.float32)
    mask = np.ones((2, H, W), bool)
    for i, (h, w) in enumerate(true_sizes):
        mask[i, :h, :w] = False
    samples = ref_modules.NestedTensor(torch.from_numpy(images), torch.from_numpy(mask))
    samples.image_sizes = list(true_sizes)
    with torch.no_grad():
        ref_out = model.inference_forward(samples, size_divisib=32)
    sd = {f"detr.{k}": v.detach().numpy() for k, v in model.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.torch_import import apply_to_params, convert_idol_checkpoint
    from vnext_tpu.models.idol import IDOL

    ours_model = IDOL(
        num_classes=FULL_CLASSES, hidden_dim=FULL_HIDDEN, num_queries=FULL_QUERIES,
        nheads=FULL_HEADS, dim_feedforward=FULL_FFN, enc_layers=FULL_LAYERS,
        dec_layers=FULL_LAYERS, num_feature_levels=LEVELS, dropout=0.0,
        backbone_depth=50, stride_in_1x1=False, msda_impl="jnp", dtype=jnp.float32,
    )
    sizes = jnp.asarray(true_sizes, jnp.int32)
    x_nhwc = jnp.asarray(images.transpose(0, 2, 3, 1))
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)}, x_nhwc, sizes, method=IDOL.inference
    )
    flat = convert_idol_checkpoint(
        sd, dec_layers=FULL_LAYERS, enc_layers=FULL_LAYERS, num_feature_levels=LEVELS
    )
    params, report = apply_to_params(flat, variables["params"])
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing"], report["missing"]

    ours = ours_model.apply({"params": params}, x_nhwc, sizes, method=IDOL.inference)

    def diff(a, b):
        return float(np.max(np.abs(np.asarray(a) - b.detach().numpy())))

    # f32 accumulation-order wobble compounds over 6 layers at 256-dim;
    # these bounds are ~100x above observed noise yet far below any real
    # architectural mismatch
    assert diff(ours["pred_logits"], ref_out["pred_logits"]) < 5e-3
    assert diff(ours["pred_boxes"], ref_out["pred_boxes"]) < 2e-3
    assert diff(ours["pred_inst_embed"], ref_out["pred_inst_embed"]) < 5e-3
    ref_masks = ref_out["pred_masks"].squeeze(2)
    np.testing.assert_allclose(
        np.asarray(ours["pred_masks"]), ref_masks.detach().numpy(),
        rtol=2e-3, atol=5e-3,
    )
