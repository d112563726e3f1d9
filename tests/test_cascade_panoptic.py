"""CascadeROIHeads / ProposalNetwork / PanopticFPN tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models.cascade_rcnn import CascadeROIHeads
from vnext_tpu.models.rcnn import PanopticFPN, ProposalNetwork
from vnext_tpu.models.retinanet import DetTargets


def _tiny_feats(rng, c=32):
    shapes = {"p2": (1, 16, 24, c), "p3": (1, 8, 12, c), "p4": (1, 4, 6, c), "p5": (1, 2, 3, c)}
    return {k: jnp.asarray(np.random.RandomState(rng).randn(*s), jnp.float32) * 0.1
            for rng, (k, s) in enumerate(shapes.items())}


def _targets():
    return DetTargets(
        labels=jnp.asarray([[1, 2, 0]], jnp.int32),
        boxes=jnp.asarray([[[8, 8, 40, 40], [50, 20, 90, 60], [0, 0, 1, 1]]], jnp.float32),
        valid=jnp.asarray([[True, True, False]]),
    )


def test_cascade_roi_heads_train_and_inference():
    heads = CascadeROIHeads(num_classes=4, batch_per_image=16)
    feats = _tiny_feats(0)
    proposals = jnp.asarray(
        np.random.RandomState(0).uniform(0, 60, (1, 24, 4)).astype(np.float32)
    )
    proposals = jnp.concatenate(
        [jnp.minimum(proposals[..., :2], proposals[..., 2:]),
         jnp.maximum(proposals[..., :2], proposals[..., 2:]) + 4], -1
    )
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = _targets()

    params = jax.jit(
        lambda: heads.init(jax.random.PRNGKey(0), feats, proposals, sizes, targets,
                           train=True)["params"]
    )()
    # three stages' heads exist with separate parameters
    assert {"stage0", "stage1", "stage2"} <= set(params)

    losses = jax.jit(
        lambda p: heads.apply({"params": p}, feats, proposals, sizes, targets,
                              train=True, rng_key=jax.random.PRNGKey(3))
    )(params)
    assert set(losses) == {f"loss_{n}_stage{k}" for n in ("cls", "box_reg") for k in range(3)}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, k

    out = jax.jit(
        lambda p: heads.apply({"params": p}, feats, proposals, sizes, train=False)
    )(params)
    assert out["boxes"].shape == (1, 24, 4)
    assert out["scores"].shape == (1, 24, 4)
    b = np.asarray(out["boxes"])
    assert np.isfinite(b).all()
    assert (b[..., 0::2] <= 96 + 1e-3).all() and (b[..., 1::2] <= 64 + 1e-3).all()
    s = np.asarray(out["scores"])
    assert (s >= 0).all() and (s <= 1 + 1e-6).all()


def test_proposal_network():
    model = ProposalNetwork(fpn_channels=32, proposals_per_image=16)
    images = jnp.zeros((1, 64, 96, 3))
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = _targets()
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets, train=True)["params"]
    )()
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, targets, train=True)
    )(params)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc"}
    out = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, train=False)
    )(params)
    assert out["proposal_boxes"].shape == (1, 16, 4)
    assert out["objectness_logits"].shape == (1, 16)


def test_panoptic_fpn_train_and_inference():
    model = PanopticFPN(
        num_classes=4, fpn_channels=32, proposals_per_image=32,
        roi_batch_per_image=16, max_detections=8, mask_on=True, sem_seg_classes=5,
    )
    images = jnp.zeros((1, 64, 96, 3))
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = _targets()
    gt_masks = np.zeros((1, 3, 64, 96), np.float32)
    gt_masks[0, 0, 8:40, 8:40] = 1.0
    gt_masks[0, 1, 20:60, 50:90] = 1.0
    gt_masks = jnp.asarray(gt_masks)
    sem_gt = np.zeros((1, 16, 24), np.int32)
    sem_gt[0, :4] = 255  # ignore strip
    sem_gt[0, 8:, :] = 3
    sem_gt = jnp.asarray(sem_gt)

    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets,
                           sem_seg_gt=sem_gt, train=True, gt_masks=gt_masks)["params"]
    )()
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, targets, sem_seg_gt=sem_gt,
                              train=True, rng_key=jax.random.PRNGKey(5), gt_masks=gt_masks)
    )(params)
    assert {"loss_rpn_cls", "loss_cls", "loss_mask", "loss_sem_seg"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_sem_seg"]) > 0

    out = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, method=PanopticFPN.inference)
    )(params)
    assert out["sem_seg"].shape == (1, 16, 24)
    assert out["mask_probs"].shape == (1, 8, 14, 14)
    assert np.asarray(out["sem_seg"]).max() < 5

    # fusion: instance overrides stuff where confident
    from vnext_tpu.models.semantic_seg import combine_semantic_and_instance_outputs

    sem = np.asarray(out["sem_seg"][0])
    inst_masks = np.zeros((1, 16, 24), bool)
    inst_masks[0, 2:8, 2:10] = True
    pan, segs = combine_semantic_and_instance_outputs(
        sem, inst_masks, np.asarray([0.9]), np.asarray([1]), stuff_area_limit=10
    )
    assert pan.shape == sem.shape
    assert any(s["isthing"] for s in segs)


def test_cascade_generalized_rcnn_from_config():
    """ROI_HEADS.NAME: CascadeROIHeads reaches GeneralizedRCNN end-to-end
    (config -> build -> train losses + inference), round-5 wiring."""
    from vnext_tpu.config import get_cfg
    from vnext_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.MASK_ON = False
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    model = build_model(cfg)
    assert model.cascade_on

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = _targets()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, sizes, targets, train=True)
    losses = model.apply(variables, images, sizes, targets, train=True,
                         rng_key=jax.random.PRNGKey(1))
    assert any(k.endswith("stage2") for k in losses), losses.keys()
    assert all(np.isfinite(float(v)) for v in losses.values()), losses

    out = model.apply(variables, images, sizes, method=type(model).inference)
    assert out["boxes"].shape[-1] == 4
    assert out["scores"].shape == out["classes"].shape
