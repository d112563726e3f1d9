"""End-to-end SeqFormer instance equality against the reference's FULL
whole-video eval path.

Completes VERDICT round-3 item 5: the SeqFormer transformer is tensor-parity
tested (test_reference_seqformer_parity), but tensor tests cannot catch the
inference wiring — top-k query selection, multi-class thresholding, the mask
upsample/crop/resize chain, score/label conventions. This test runs the REAL
reference chain verbatim — ``SeqFormer.forward`` eval branch with
clip_matching=False (seqformer/seqformer.py:227-236) + the real
``CondInst_segm.inference`` (models/segmentation_condInst.py:241) + the real
``whole_video_inference`` postprocess (seqformer.py:363-409) — on a synthetic
video with a real d2-ResNet-50 backbone + tiny SeqFormer head, and the same
weights + frames through our ``engine/seqformer_inference.SeqFormerVideoInference``.
Asserts instance-by-instance equality: labels, scores, and mask pixels.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_reference_seqformer_parity import (  # noqa: E402
    _install_stubs as _install_sf_stubs,
    ref_modules as sf_transformer_modules,  # noqa: F401 (dependency ordering)
)
from tests.test_reference_backbone_parity import _build_d2, _load_d2_resnet, _load

REF = "/root/reference/projects/SeqFormer"

HIDDEN = 64
NHEADS = 4
N_LAYERS = 2
FFN = 128
QUERIES = 300  # the reference inference hardcodes num_insts=[300] (segmentation_condInst.py:341)
CLASSES = 7
LEVELS = 4
T_FRAMES = 6
H, W = 128, 192   # model input == original video size (no resize step)


@pytest.fixture(scope="module")
def ref_sf(sf_transformer_modules):
    """Load the verbatim seqformer model stack + meta-arch module."""
    _install_sf_stubs()
    fv = sys.modules.setdefault("fvcore", types.ModuleType("fvcore"))
    fvnn = sys.modules.setdefault("fvcore.nn", types.ModuleType("fvcore.nn"))
    fv.nn = fvnn
    if not hasattr(fvnn, "giou_loss"):
        def _unused(*a, **k):  # imported by matcher/deformable_detr, train-only
            raise NotImplementedError

        fvnn.giou_loss = _unused
        fvnn.smooth_l1_loss = _unused
    # detectron2 stubs needed by seqformer/seqformer.py (import-time only for
    # the symbols the eval path never touches) + the REAL d2 ImageList
    _load_d2_resnet()
    image_list = _load(
        "detectron2.structures.image_list",
        "/root/reference/detectron2/structures/image_list.py",
    )
    d2s = sys.modules.setdefault(
        "detectron2.structures", types.ModuleType("detectron2.structures")
    )
    d2s.ImageList = image_list.ImageList
    d2s.Boxes = object
    d2s.BitMasks = object
    d2s.Instances = object
    sys.modules["detectron2"].structures = d2s

    d2m = sys.modules.setdefault(
        "detectron2.modeling", types.ModuleType("detectron2.modeling")
    )

    class _Reg:
        def register(self, obj=None):
            return obj if obj is not None else (lambda o: o)

    d2m.META_ARCH_REGISTRY = _Reg()
    d2m.build_backbone = None
    d2m.detector_postprocess = None
    sys.modules["detectron2"].modeling = d2m

    # clip_output.py imports retry_if_cuda_oom (clip-matching path, unused here)
    d2u = sys.modules.setdefault(
        "detectron2.utils", types.ModuleType("detectron2.utils")
    )
    d2um = types.ModuleType("detectron2.utils.memory")
    d2um.retry_if_cuda_oom = lambda fn: fn
    d2u.memory = d2um
    sys.modules["detectron2.utils.memory"] = d2um

    tv = sys.modules["torchvision"]
    if not hasattr(tv.ops, "nms"):
        tv.ops.nms = None
    if "torchvision.models" not in sys.modules:
        tv.models = types.ModuleType("torchvision.models")
        tv.models._utils = types.ModuleType("torchvision.models._utils")
        tv.models._utils.IntermediateLayerGetter = object
        sys.modules["torchvision.models"] = tv.models
        sys.modules["torchvision.models._utils"] = tv.models._utils

    # seqformer.data.coco imports pycocotools; the symbol is train-only
    data_pkg = types.ModuleType("seqformer_ref.data")
    data_pkg.__path__ = [f"{REF}/seqformer/data"]
    coco_stub = types.ModuleType("seqformer_ref.data.coco")
    coco_stub.convert_coco_poly_to_mask = None
    sys.modules.setdefault("seqformer_ref.data", data_pkg)
    sys.modules["seqformer_ref.data.coco"] = coco_stub

    import importlib

    meta = importlib.import_module("seqformer_ref.seqformer")
    from seqformer_ref.models import deformable_detr as dd
    from seqformer_ref.models import segmentation_condInst as sc
    from seqformer_ref.models.backbone import Joiner
    from seqformer_ref.models.position_encoding import PositionEmbeddingSine

    return types.SimpleNamespace(
        meta=meta, dd=dd, sc=sc, Joiner=Joiner,
        PositionEmbeddingSine=PositionEmbeddingSine,
    )


class _D2ResNetBackbone(torch.nn.Module):
    """MaskedBackbone equivalent wrapping the real d2 R50 (same shape as the
    IDOL e2e test's; seqformer's Joiner consumes the same interface)."""

    def __init__(self, resnet):
        super().__init__()
        self.backbone = resnet

    def forward(self, tensor_list):
        feats = self.backbone(tensor_list.tensors)
        m = tensor_list.mask
        out = {}
        for name in ("res2", "res3", "res4", "res5"):
            x = feats[name]
            mask = (
                torch.nn.functional.interpolate(m[None].float(), size=x.shape[-2:])
                .to(torch.bool)[0]
            )
            out[name] = type(tensor_list)(x, mask)
        return out


def _build_reference(ref_sf):
    d2r = _load_d2_resnet()
    resnet = _build_d2(d2r, 50, stride_in_1x1=False, seed=13)
    backbone = ref_sf.Joiner(
        _D2ResNetBackbone(resnet),
        ref_sf.PositionEmbeddingSine(HIDDEN // 2, normalize=True),
    )
    backbone.num_channels = [512, 1024, 2048]
    backbone.strides = [8, 16, 32]
    from seqformer_ref.models.deformable_transformer import DeformableTransformer

    transformer = DeformableTransformer(
        d_model=HIDDEN, nhead=NHEADS,
        num_encoder_layers=N_LAYERS, num_decoder_layers=N_LAYERS,
        dim_feedforward=FFN, dropout=0.0, activation="relu",
        return_intermediate_dec=True, num_frames=T_FRAMES,
        num_feature_levels=LEVELS, dec_n_points=4, enc_n_points=4,
    )
    detr = ref_sf.dd.DeformableDETR(
        backbone, transformer, num_classes=CLASSES, num_frames=T_FRAMES,
        num_queries=QUERIES, num_feature_levels=LEVELS,
        aux_loss=True, with_box_refine=True,
    )
    segm = ref_sf.sc.CondInst_segm(detr, rel_coord=True, freeze_detr=False)
    # lift the focal prior bias so random-init scores clear apply_cls_thres
    with torch.no_grad():
        g = torch.Generator().manual_seed(21)
        for ce in detr.class_embed:
            ce.bias.add_(3.5 + 0.7 * torch.randn(ce.bias.shape, generator=g))
    segm.eval()

    Meta = ref_sf.meta.SeqFormer
    obj = Meta.__new__(Meta)
    torch.nn.Module.__init__(obj)
    obj.detr = segm
    obj.device = torch.device("cpu")
    obj.clip_matching = False
    obj.mask_stride = 4
    obj.is_multi_cls = True
    obj.apply_cls_thres = 0.05
    obj.num_classes = CLASSES
    obj.num_frames = T_FRAMES
    obj.merge_device = "cpu"
    mean = torch.tensor([123.675, 116.280, 103.530]).view(3, 1, 1)
    std = torch.tensor([58.395, 57.120, 57.375]).view(3, 1, 1)
    obj.normalizer = lambda x: (x - mean) / std
    obj.eval()
    return obj, segm


def _make_video(seed=1):
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 40, (T_FRAMES, H, W, 3)).astype(np.uint8)
    for t in range(T_FRAMES):
        x0 = 20 + 8 * t
        frames[t, 30:80, x0 : x0 + 40] = (220, 30, 30)
        frames[t, 70:110, 140 - 5 * t : 180 - 5 * t] = (20, 200, 240)
    return frames


def test_e2e_seqformer_whole_video_equality(ref_sf):
    frames = _make_video()
    ref_model, segm = _build_reference(ref_sf)

    batched_inputs = [{
        "image": [torch.from_numpy(f.transpose(2, 0, 1).astype(np.float32)) for f in frames],
        "height": H, "width": W,
        "file_names": [f"f{t}.jpg" for t in range(T_FRAMES)],
        "video_id": 1, "length": T_FRAMES,
    }]
    with torch.no_grad():
        ref_out = ref_model.forward(batched_inputs)
    assert len(ref_out["pred_scores"]) > 0, "reference produced no instances"

    # ---- ours: same weights through our whole driver
    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.torch_import import (
        apply_to_params,
        convert_seqformer_checkpoint,
    )
    from vnext_tpu.engine.seqformer_inference import SeqFormerVideoInference
    from vnext_tpu.models.seqformer import SeqFormer

    ours_model = SeqFormer(
        num_classes=CLASSES, hidden_dim=HIDDEN, num_queries=QUERIES,
        nheads=NHEADS, dim_feedforward=FFN, enc_layers=N_LAYERS,
        dec_layers=N_LAYERS, num_feature_levels=LEVELS, dropout=0.0,
        backbone_depth=50, msda_impl="jnp", dtype=jnp.float32,
    )
    sizes0 = jnp.asarray([[H, W]], jnp.int32)
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 1, H, W, 3)), sizes0, method=SeqFormer.inference,
    )
    sd = {f"detr.{k}": v.detach().numpy() for k, v in segm.state_dict().items()}
    flat = convert_seqformer_checkpoint(
        sd, dec_layers=N_LAYERS, enc_layers=N_LAYERS, num_feature_levels=LEVELS
    )
    params, report = apply_to_params(flat, variables["params"])
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing"], report["missing"]

    driver = SeqFormerVideoInference(
        ours_model, params,
        clip_matching=False, clip_length=T_FRAMES, topk=10,
        test_short_edge=H, test_max_size=W, target_size=(H, W),
        apply_cls_thres=0.05,
        image_loader=lambda path: frames[int(path[1:-4])],
    )
    record = {
        "file_names": [f"f{t}.jpg" for t in range(T_FRAMES)],
        "height": H, "width": W, "video_id": 1, "length": T_FRAMES,
    }
    ours = driver(record)

    ref_scores = [float(s) for s in ref_out["pred_scores"]]
    ref_labels = [int(l) for l in ref_out["pred_labels"]]
    ref_masks = [m.numpy() for m in ref_out["pred_masks"]]  # [T, H, W] bool each

    our_scores = ours["pred_scores"]
    our_labels = ours["pred_labels"]
    our_masks = ours["pred_masks"]

    assert len(our_scores) == len(ref_scores), (len(our_scores), len(ref_scores))
    order_r = np.lexsort((ref_labels, np.negative(ref_scores)))
    order_o = np.lexsort((our_labels, np.negative(our_scores)))
    agree_min = 1.0
    for ir, io in zip(order_r, order_o):
        assert ref_labels[ir] == our_labels[io], (ref_labels[ir], our_labels[io])
        assert abs(ref_scores[ir] - our_scores[io]) < 1e-3
        for t in range(T_FRAMES):
            mr = np.asarray(ref_masks[ir][t], bool)
            mo = np.asarray(our_masks[io][t], bool)
            agree = float((mr == mo).mean())
            agree_min = min(agree_min, agree)
            assert agree > 0.999, f"inst {ir} frame {t}: mask agreement {agree}"
    # bit-exactness on most pixels; record the worst for the log
    assert agree_min > 0.999
