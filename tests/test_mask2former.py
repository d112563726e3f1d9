"""Mask2Former + MinVIS tests (tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.mask2former import (
    MaskFormer,
    MaskTargets,
    maskformer_match_cost,
    minvis_match_from_embds,
    minvis_postprocess,
)

H, W, K, NQ = 64, 96, 4, 8


@pytest.fixture(scope="module")
def tiny_maskformer():
    model = MaskFormer(
        num_classes=5, hidden_dim=32, num_queries=NQ, dec_layers=3, enc_layers=1,
        dim_feedforward=64, msda_impl="jnp",
    )
    images = jnp.zeros((2, H, W, 3))  # 2 frames
    sizes = jnp.asarray([[H, W], [H, W]], jnp.int32)
    targets = _targets(np.random.RandomState(0))
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets, train=False)["params"]
    )()
    return model, params, images, sizes, targets


def _targets(rng, n_valid=2):
    masks = np.zeros((2, K, H // 4, W // 4), bool)
    for f in range(2):
        for i in range(n_valid):
            masks[f, i, 2 + 3 * i : 8 + 3 * i, 4 : 12 + i] = True
    return MaskTargets(
        labels=jnp.asarray(rng.randint(0, 5, (2, K)), jnp.int32),
        masks_s4=jnp.asarray(masks),
        valid=jnp.asarray(np.tile(np.arange(K) < n_valid, (2, 1))),
    )


def test_maskformer_losses(tiny_maskformer):
    model, params, images, sizes, targets = tiny_maskformer
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, targets, train=True)
    )(params)
    assert {"loss_ce", "loss_mask", "loss_dice", "loss_ce_0"}.issubset(losses)
    # dec_layers+1 prediction sets
    assert sum(1 for k in losses if k.startswith("loss_ce")) == 4
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_maskformer_empty_gt(tiny_maskformer):
    model, params, images, sizes, targets = tiny_maskformer
    empty = MaskTargets(targets.labels, targets.masks_s4, jnp.zeros_like(targets.valid))
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, empty, train=True)
    )(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_maskformer_inference_and_minvis_postprocess(tiny_maskformer):
    model, params, images, sizes, _ = tiny_maskformer
    out = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, method=MaskFormer.inference)
    )(params)
    assert out["pred_logits"].shape == (2, NQ, 6)
    assert out["pred_masks"].shape == (2, NQ, H // 4, W // 4)
    assert out["pred_embds"].shape == (2, NQ, 32)
    aligned = minvis_postprocess({k: np.asarray(v) for k, v in out.items()})
    assert aligned["pred_logits"].shape == (2, NQ, 6)
    assert aligned["pred_masks"].shape == (2, NQ, H // 4, W // 4)


def test_match_cost_prefers_matching_mask():
    rng = np.random.RandomState(1)
    q, k, h, w = 3, 2, 8, 8
    masks = np.full((q, h, w), -8.0, np.float32)
    masks[0, :4, :4] = 8.0
    masks[1, 4:, 4:] = 8.0
    gt = np.zeros((k, h, w), bool)
    gt[0, :4, :4] = True
    gt[1, 4:, 4:] = True
    logits = rng.randn(q, 3).astype(np.float32) * 0.1
    labels = np.asarray([0, 1])
    cost = np.asarray(
        maskformer_match_cost(
            jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(labels),
            jnp.asarray(gt), jnp.asarray([True, True]),
        )
    )
    assert cost[0, 0] < cost[1, 0] and cost[0, 0] < cost[2, 0]
    assert cost[1, 1] < cost[0, 1] and cost[1, 1] < cost[2, 1]


def test_minvis_match_identity_and_swap():
    e = np.eye(4, dtype=np.float32)
    perm = minvis_match_from_embds(e, e)
    assert perm.tolist() == [0, 1, 2, 3]
    swapped = e[[1, 0, 2, 3]]
    perm = minvis_match_from_embds(e, swapped)
    assert perm.tolist() == [1, 0, 2, 3]


def test_minvis_motion_cost_breaks_ties():
    # two identical embeddings; motion mask disambiguates
    e = np.ones((2, 4), np.float32)
    cur_mask = np.zeros((2, 8, 8), np.float32)
    cur_mask[0, :4] = 1
    cur_mask[1, 4:] = 1
    motion = np.full((2, 8, 8), -8.0, np.float32)
    motion[0, :4] = 8.0   # predicted mask for track 0 matches current det 0
    motion[1, 4:] = 8.0
    perm = minvis_match_from_embds(e, e, motion_mask=motion, current_mask=cur_mask)
    assert perm.tolist() == [0, 1]


def test_minvis_video_inference_driver(tiny_maskformer):
    from vnext_tpu.data.synthetic import make_image_loader, make_synthetic_videos
    from vnext_tpu.engine.minvis_inference import MinVISVideoInference

    model, params, _, _, _ = tiny_maskformer
    records, store = make_synthetic_videos(
        num_videos=1, length=4, height=100, width=140, max_objects=2, num_classes=5, seed=21
    )
    runner = MinVISVideoInference(
        model, params,
        window_size=2, topk=5,
        test_short_edge=64, test_max_size=96, target_size=(H, W),
        image_loader=make_image_loader(store),
    )
    out = runner(records[0])
    assert out["image_size"] == (100, 140)
    assert len(out["pred_scores"]) == 5
    assert len(out["pred_masks"][0]) == 4
    m = out["pred_masks"][0][0]
    assert m.shape == (100, 140)
