"""End-to-end AP equality against the reference's FULL video eval path.

Round-2 verdict item 3: tensor-level parity tests cannot catch tracker
thresholds, mask pasting, category-id conventions, score aggregation, or RLE
wiring. This test runs the REAL reference eval chain verbatim — the actual
``IDOL.forward`` eval branch (idol/idol.py:249-295 clip chunking) + the actual
``IDOL.inference`` (idol.py:328-473: per-frame NMS, IDOL_Tracker association,
mask assembly/upsample/crop/threshold) + the actual
``instances_to_coco_json_video`` writer (idol/data/ytvis_eval.py:174) — on a
synthetic video with a real d2-ResNet-50 backbone + tiny IDOL head, and the
same weights + frames through our ``engine/vis_inference.IDOLVideoInference``.
It asserts the two results agree instance-by-instance (labels, scores, mask
pixels) and that the final mAP under ``evaluation/ytvos_eval`` is identical.

pycocotools is absent here, so the reference writer's ``mask_util.encode`` is
routed to our RLE encoder on BOTH sides; the RLE wire format itself is pinned
separately by test_results_json_golden.py. The reference's
``torchvision.ops.batched_nms`` is replaced by an exact per-class-offset
greedy NMS in torch (same semantics, deterministic).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_reference_model_parity import (  # noqa: E402
    _install_stubs,
    ref_modules,  # fixture
    LEVELS,
)
from tests.test_reference_backbone_parity import _build_d2, _load_d2_resnet  # noqa: E402

REF = "/root/reference/projects/IDOL"

HIDDEN = 64
NHEADS = 4
N_LAYERS = 2
FFN = 128
QUERIES = 12
CLASSES = 7
T_FRAMES = 12        # > batch_infer_len -> exercises clip chunking
CLIP_LEN = 5
H, W = 128, 192      # model input == original video size (no resize step)


def _exact_batched_nms(boxes, scores, idxs, iou_threshold):
    """torchvision.ops.batched_nms semantics in pure torch (exact greedy)."""
    if boxes.numel() == 0:
        return torch.zeros((0,), dtype=torch.int64)
    max_coord = boxes.max()
    offsets = idxs.to(boxes) * (max_coord + 1)
    b = boxes + offsets[:, None]
    order = torch.argsort(scores, descending=True)
    keep = []
    suppressed = torch.zeros(len(b), dtype=torch.bool)
    x1, y1, x2, y2 = b.unbind(1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    for i in order.tolist():
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = torch.maximum(x1[i], x1[order])
        yy1 = torch.maximum(y1[i], y1[order])
        xx2 = torch.minimum(x2[i], x2[order])
        yy2 = torch.minimum(y2[i], y2[order])
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[i] + areas[order] - inter).clamp(min=1e-12)
        suppressed[order[iou > iou_threshold]] = True
        suppressed[i] = False
    return torch.as_tensor(keep, dtype=torch.int64)


@pytest.fixture(scope="module")
def ref_idol_module(ref_modules):
    """Load the REAL idol/idol.py with its unimportable deps stubbed."""
    _install_stubs()
    tv = sys.modules["torchvision"]
    tv.ops.batched_nms = _exact_batched_nms

    # real d2 ImageList (needs real layers.wrappers, loaded by the backbone
    # parity loader) + class stubs for the coco-only code paths
    _load_d2_resnet()
    from tests.test_reference_backbone_parity import _load

    image_list = _load(
        "detectron2.structures.image_list", "/root/reference/detectron2/structures/image_list.py"
    )
    d2s = sys.modules["detectron2.structures"]
    d2s.ImageList = image_list.ImageList
    d2s.Boxes = object
    d2s.BitMasks = object

    modeling = sys.modules["detectron2.modeling"]

    class _Reg:
        def register(self, obj=None):
            return obj if obj is not None else (lambda o: o)

    modeling.META_ARCH_REGISTRY = _Reg()
    modeling.build_backbone = None
    modeling.detector_postprocess = None

    # idol.data.coco imports pycocotools; the symbol is train-only
    data_pkg = types.ModuleType("idol.data")
    data_pkg.__path__ = [f"{REF}/idol/data"]
    coco_stub = types.ModuleType("idol.data.coco")
    coco_stub.convert_coco_poly_to_mask = None
    sys.modules.setdefault("idol.data", data_pkg)
    sys.modules["idol.data.coco"] = coco_stub

    import importlib

    return importlib.import_module("idol.idol")


@pytest.fixture(scope="module")
def ref_writer():
    """The REAL instances_to_coco_json_video with mask_util -> our RLE codec."""
    from vnext_tpu.evaluation import rle as our_rle

    mask_util = types.ModuleType("pycocotools.mask")

    def encode(arr):
        m = np.asarray(arr)[:, :, 0] > 0
        r = our_rle.rle_encode(m)
        return [{"size": r["size"], "counts": r["counts"].encode()
                 if isinstance(r["counts"], str) else r["counts"]}]

    mask_util.encode = encode
    pct = types.ModuleType("pycocotools")
    pct.mask = mask_util
    ytvos_stub = types.ModuleType("pycocotools.ytvos")
    ytvos_stub.YTVOS = object
    sys.modules.setdefault("pycocotools", pct)
    sys.modules["pycocotools.mask"] = mask_util
    sys.modules["pycocotools.ytvos"] = ytvos_stub

    # d2 deps of ytvis_eval.py, import-time only
    for name, attrs in (
        ("detectron2.utils.comm", {}),
        ("detectron2.config", {"CfgNode": object}),
        ("detectron2.data", {"MetadataCatalog": object}),
        ("detectron2.evaluation", {"DatasetEvaluator": object}),
        ("detectron2.utils.file_io", {"PathManager": object}),
    ):
        mod = sys.modules.setdefault(name, types.ModuleType(name))
        for k, v in attrs.items():
            if not hasattr(mod, k):
                setattr(mod, k, v)

    from tests.test_reference_backbone_parity import _load

    ev = _load("ref_ytvis_eval", f"{REF}/idol/data/ytvis_eval.py")
    return ev.instances_to_coco_json_video


def _make_video(seed=0):
    """Synthetic uint8 frames with moving box-shaped blobs."""
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 40, (T_FRAMES, H, W, 3)).astype(np.uint8)
    for t in range(T_FRAMES):
        x0 = 20 + 6 * t
        frames[t, 30:80, x0 : x0 + 40] = (220, 30, 30)
        frames[t, 70:110, 120 - 3 * t : 160 - 3 * t] = (20, 200, 240)
    return frames


def _build_models(ref_modules, ref_idol_module):
    """Reference IDOL (real eval-path class) + our IDOL with same weights."""
    d2r = _load_d2_resnet()
    resnet = _build_d2(d2r, 50, stride_in_1x1=False, seed=9)

    from tests.test_reference_model_parity import _D2ResNetBackbone

    backbone = ref_modules.Joiner(
        _D2ResNetBackbone(resnet),
        ref_modules.PositionEmbeddingSine(HIDDEN // 2, normalize=True),
    )
    backbone.num_channels = [512, 1024, 2048]
    backbone.strides = [8, 16, 32]
    transformer = ref_modules.dt.DeformableTransformer(
        d_model=HIDDEN, nhead=NHEADS,
        num_encoder_layers=N_LAYERS, num_decoder_layers=N_LAYERS,
        dim_feedforward=FFN, dropout=0.0, activation="relu",
        return_intermediate_dec=True, num_frames=1,
        num_feature_levels=LEVELS, dec_n_points=4, enc_n_points=4,
    )
    detr = ref_modules.dd.DeformableDETR(
        backbone, transformer, num_classes=CLASSES, num_frames=1,
        num_queries=QUERIES, num_feature_levels=LEVELS,
        aux_loss=True, with_box_refine=True,
    )
    segm = ref_modules.sc.CondInst_segm(detr, rel_coord=True, freeze_detr=False)
    # the focal prior bias (-4.6) keeps random-init scores ~0.01, below every
    # tracker threshold; lift it so real tracks form and the pipelines have
    # something nontrivial to agree on
    with torch.no_grad():
        g = torch.Generator().manual_seed(42)
        for ce in detr.class_embed:
            ce.bias.add_(4.0 + 0.8 * torch.randn(ce.bias.shape, generator=g))
    segm.eval()

    IDOLCls = ref_idol_module.IDOL
    obj = IDOLCls.__new__(IDOLCls)
    torch.nn.Module.__init__(obj)
    obj.detr = segm
    obj.device = torch.device("cpu")
    obj.batch_infer_len = CLIP_LEN
    obj.merge_on_cpu = True
    obj.merge_device = "cpu"
    obj.coco_pretrain = False
    obj.mask_on = True
    obj.is_multi_cls = True
    obj.apply_cls_thres = 0.05
    obj.temporal_score_type = "mean"
    obj.inference_select_thres = 0.1
    obj.inference_fw = True
    obj.inference_tw = True
    obj.memory_len = 3
    obj.nms_pre = 0.5
    obj.add_new_score = 0.2
    obj.num_frames = 1
    mean = torch.tensor([123.675, 116.280, 103.530]).view(3, 1, 1)
    std = torch.tensor([58.395, 57.120, 57.375]).view(3, 1, 1)
    obj.normalizer = lambda x: (x - mean) / std
    obj.eval()
    return obj, segm


def test_e2e_video_results_and_ap_equality(ref_modules, ref_idol_module, ref_writer, tmp_path):
    frames = _make_video()

    ref_model, segm = _build_models(ref_modules, ref_idol_module)
    batched_inputs = [{
        "image": [torch.from_numpy(f.transpose(2, 0, 1).astype(np.float32)) for f in frames],
        "height": H, "width": W,
        "file_names": [f"f{t}.jpg" for t in range(T_FRAMES)],
        "video_id": 1, "length": T_FRAMES,
    }]
    with torch.no_grad():
        ref_video = ref_model.forward(batched_inputs)
    ref_results = ref_writer(batched_inputs, ref_video)

    # ---- ours: same weights through our whole driver
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.torch_import import apply_to_params, convert_idol_checkpoint
    from vnext_tpu.engine.vis_inference import IDOLVideoInference
    from vnext_tpu.evaluation.ytvis_eval import video_output_to_json
    from vnext_tpu.models.idol import IDOL

    ours_model = IDOL(
        num_classes=CLASSES, hidden_dim=HIDDEN, num_queries=QUERIES,
        nheads=NHEADS, dim_feedforward=FFN, enc_layers=N_LAYERS,
        dec_layers=N_LAYERS, num_feature_levels=LEVELS, dropout=0.0,
        backbone_depth=50, stride_in_1x1=False, msda_impl="jnp", dtype=jnp.float32,
    )
    import jax

    sizes0 = jnp.asarray([[H, W]], jnp.int32)
    variables = ours_model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, H, W, 3)), sizes0, method=IDOL.inference,
    )
    sd = {f"detr.{k}": v.detach().numpy() for k, v in segm.state_dict().items()}
    flat = convert_idol_checkpoint(
        sd, dec_layers=N_LAYERS, enc_layers=N_LAYERS, num_feature_levels=LEVELS
    )
    params, report = apply_to_params(flat, variables["params"])
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing"], report["missing"]

    driver = IDOLVideoInference(
        ours_model, params,
        test_short_edge=H, test_max_size=W, target_size=(H, W),
        batch_infer_len=CLIP_LEN, inference_select_thres=0.1,
        image_loader=lambda path: frames[int(path[1:-4])],
    )
    record = {
        "file_names": [f"f{t}.jpg" for t in range(T_FRAMES)],
        "height": H, "width": W, "video_id": 1, "length": T_FRAMES,
    }
    our_video = driver(record)
    our_results = video_output_to_json(our_video, video_id=1, height=H, width=W)

    # the reference writer emits contiguous 0-based ids; its evaluator remaps
    # them to dataset ids before scoring (ytvis_eval.py:153-161). Apply the
    # same standard 0->1-based map so both sides use one convention.
    for r in ref_results:
        r["category_id"] = int(r["category_id"]) + 1

    # ---- instance-level equality
    assert len(our_results) == len(ref_results), (len(our_results), len(ref_results))
    key = lambda r: (-r["score"], r["category_id"])
    ref_sorted = sorted(ref_results, key=key)
    our_sorted = sorted(our_results, key=key)
    from vnext_tpu.evaluation.rle import rle_decode

    exact_rle, total_rle = 0, 0
    for r, o in zip(ref_sorted, our_sorted):
        assert r["category_id"] == o["category_id"], (r["category_id"], o["category_id"])
        assert abs(r["score"] - o["score"]) < 1e-3, (r["score"], o["score"])
        assert len(r["segmentations"]) == len(o["segmentations"])
        for sr, so in zip(r["segmentations"], o["segmentations"]):
            cr = sr["counts"] if isinstance(sr["counts"], str) else sr["counts"].decode()
            co = so["counts"] if isinstance(so["counts"], str) else so["counts"].decode()
            total_rle += 1
            if cr == co:
                exact_rle += 1
                continue
            mr = rle_decode({"size": sr["size"], "counts": cr})
            mo = rle_decode({"size": so["size"], "counts": co})
            agree = (mr == mo).mean()
            assert agree > 0.999, f"mask pixel agreement {agree}"
    assert exact_rle / max(total_rle, 1) > 0.8, f"{exact_rle}/{total_rle} exact RLEs"

    # ---- AP equality: GT derived from reference predictions (so AP > 0)
    from vnext_tpu.evaluation.ytvos_eval import YTVOSeval

    best = max(ref_results, key=lambda r: r["score"])
    gt_ann = {
        "id": 1, "video_id": 1, "category_id": best["category_id"],
        "segmentations": best["segmentations"],
        "areas": [None] * T_FRAMES, "iscrowd": 0,
        "height": H, "width": W, "length": T_FRAMES,
    }
    gt = {
        "videos": [{"id": 1, "height": H, "width": W, "length": T_FRAMES}],
        "annotations": [gt_ann],
        "categories": [{"id": c} for c in range(1, CLASSES + 1)],
    }

    def score(results):
        return YTVOSeval(gt, results).evaluate()

    ap_ref = score(ref_results)
    ap_ours = score(our_results)
    assert ap_ref["AP"] > 0.0
    for k in ap_ref:
        assert ap_ref[k] == ap_ours[k] or (
            np.isnan(ap_ref[k]) and np.isnan(ap_ours[k])
        ), (k, ap_ref[k], ap_ours[k])
