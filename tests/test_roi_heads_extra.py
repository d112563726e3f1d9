"""Res5ROIHeads / keypoint head / rotated ROI heads tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models.roi_heads_extra import (
    Box2BoxTransformRotated,
    KRCNNConvDeconvUpsampleHead,
    Res5ROIHeads,
    RROIHeads,
    keypoint_rcnn_inference,
    keypoint_rcnn_loss,
)


def test_res5_roi_heads():
    heads = Res5ROIHeads(num_classes=4, mask_on=True)
    res4 = jnp.asarray(np.random.RandomState(0).randn(1, 8, 12, 64), jnp.float32)
    rois = jnp.asarray([[[8, 8, 60, 60], [40, 16, 100, 80]]], jnp.float32)
    params = jax.jit(lambda: heads.init(jax.random.PRNGKey(0), res4, rois))()
    out = jax.jit(lambda v: heads.apply(v, res4, rois))(params)
    assert out["cls_logits"].shape == (1, 2, 5)
    assert out["box_deltas"].shape == (1, 2, 16)
    assert out["mask_logits"].shape == (1, 2, 14, 14, 4)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


def test_keypoint_head_and_loss():
    head = KRCNNConvDeconvUpsampleHead(num_keypoints=3, conv_dims=(32, 32))
    pooled = jnp.asarray(np.random.RandomState(0).randn(2, 14, 14, 16), jnp.float32)
    params = jax.jit(lambda: head.init(jax.random.PRNGKey(0), pooled))()
    hm = jax.jit(lambda v: head.apply(v, pooled))(params)
    assert hm.shape == (2, 56, 56, 3)

    rois = jnp.asarray([[0, 0, 56, 56], [10, 10, 40, 40]], jnp.float32)
    kps = jnp.asarray(
        [[[10, 20, 2], [30, 30, 1], [0, 0, 0]],
         [[12, 12, 2], [38, 38, 2], [0, 0, 0]]], jnp.float32
    )
    fg = jnp.asarray([1.0, 1.0])
    loss = jax.jit(lambda h: keypoint_rcnn_loss(h, kps, rois, fg))(hm)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # a perfectly peaked heatmap at the GT index gives near-zero loss
    from vnext_tpu.structures.keypoints import Keypoints

    idx, valid = Keypoints(kps).to_heatmap(rois, heatmap_size=56)
    perfect = np.full((2, 3, 56 * 56), -20.0, np.float32)
    for n in range(2):
        for k in range(3):
            if valid[n, k]:
                perfect[n, k, int(idx[n, k])] = 20.0
    perfect = jnp.asarray(perfect.reshape(2, 3, 56, 56).transpose(0, 2, 3, 1))
    near0 = float(keypoint_rcnn_loss(perfect, kps, rois, fg))
    assert near0 < 1e-3

    decoded = np.asarray(keypoint_rcnn_inference(perfect, rois))
    assert decoded.shape == (2, 3, 3)
    # visible keypoints decode within one heatmap cell
    assert abs(decoded[0, 0, 0] - 10) < 2 and abs(decoded[0, 0, 1] - 20) < 2


def test_rotated_transform_roundtrip():
    t = Box2BoxTransformRotated()
    src = jnp.asarray([[20.0, 30.0, 10.0, 6.0, 15.0], [50.0, 50.0, 8.0, 8.0, -170.0]])
    tgt = jnp.asarray([[22.0, 28.0, 12.0, 5.0, 40.0], [48.0, 52.0, 10.0, 6.0, 175.0]])
    deltas = t.get_deltas(src, tgt)
    rec = np.asarray(t.apply_deltas(deltas, src))
    np.testing.assert_allclose(rec[:, :4], np.asarray(tgt)[:, :4], atol=1e-4)
    # angles equal mod 360
    da = (rec[:, 4] - np.asarray(tgt)[:, 4] + 180) % 360 - 180
    np.testing.assert_allclose(da, 0, atol=1e-4)


def test_rroi_heads_train_and_inference():
    heads = RROIHeads(num_classes=3, max_detections=4)
    feats = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 32), jnp.float32)
    rois = jnp.asarray(
        [[[30, 30, 20, 10, 0.0], [40, 40, 16, 16, 45.0], [10, 50, 12, 8, -30.0]]],
        jnp.float32,
    )
    params = jax.jit(
        lambda: heads.init(jax.random.PRNGKey(0), feats, rois, 0.25, train=True)
    )()
    out = jax.jit(lambda v: heads.apply(v, feats, rois, 0.25, train=True))(params)
    assert out["cls_logits"].shape == (1, 3, 4)
    assert out["box_deltas"].shape == (1, 3, 5)

    gt_boxes = jnp.asarray([[[31, 30, 20, 10, 5.0], [0, 0, 1, 1, 0.0]]], jnp.float32)
    gt_labels = jnp.asarray([[1, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, False]])
    losses = jax.jit(
        lambda o: RROIHeads.losses(o["cls_logits"], o["box_deltas"], rois,
                                   gt_boxes, gt_labels, gt_valid, num_classes=3)
    )(out)
    assert np.isfinite(float(losses["loss_cls_rotated"]))
    assert np.isfinite(float(losses["loss_box_reg_rotated"]))

    inf = jax.jit(lambda v: heads.apply(v, feats, rois, 0.25, train=False))(params)
    # top-k clamps to the number of proposals (3 < max_detections=4)
    assert inf["boxes"].shape == (1, 3, 5)
    assert inf["scores"].shape == (1, 3)
