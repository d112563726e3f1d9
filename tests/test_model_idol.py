"""Tiny-model e2e tests for the IDOL meta-architecture (reference test style:
tests/modeling/test_model_e2e.py — train forward on random + empty instances,
eval forward shape checks, gradient flow). All paths are jitted: eager dispatch
of the full model is too slow on the test CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models import IDOL

from _tiny_idol import H, W, K, NQ, make_model, random_targets


@pytest.fixture(scope="module")
def setup():
    model = make_model()
    img = jnp.zeros((1, H, W, 3))
    sz = jnp.asarray([[H, W]], jnp.int32)
    tgt = random_targets(np.random.RandomState(0))
    variables = jax.jit(
        lambda t: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            img, sz, img, sz, t, t, train=False,
        )
    )(tgt)

    @jax.jit
    def train_losses(params, key_images, key_sizes, targets):
        return model.apply(
            {"params": params}, key_images, key_sizes, key_images, key_sizes,
            targets, targets, train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        )

    @jax.jit
    def infer(params, frames, sizes):
        return model.apply({"params": params}, frames, sizes, method=IDOL.inference)

    return model, variables["params"], train_losses, infer


def test_train_forward_losses(setup):
    _, params, train_losses, _ = setup
    rng = np.random.RandomState(1)
    key_images = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    key_sizes = jnp.asarray([[H - 10, W - 20]], jnp.int32)
    losses = train_losses(params, key_images, key_sizes, random_targets(rng))
    expected = {"loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_dice",
                "loss_reid", "loss_reid_aux", "loss_ce_0", "loss_bbox_0",
                "loss_giou_0", "loss_mask_0", "loss_dice_0"}
    assert expected.issubset(losses.keys())
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} is not finite"
    assert float(losses["loss_ce"]) > 0


def test_train_forward_empty_gt(setup):
    """Empty key frame must not produce NaNs (reference handles this at
    matcher.py:61-68 and via zero-fallback losses)."""
    _, params, train_losses, _ = setup
    rng = np.random.RandomState(2)
    key_images = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    key_sizes = jnp.asarray([[H, W]], jnp.int32)
    losses = train_losses(params, key_images, key_sizes, random_targets(rng, empty=True))
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite on empty GT"


def test_inference_shapes(setup):
    _, params, _, infer = setup
    rng = np.random.RandomState(3)
    frames = jnp.asarray(rng.randn(2, H, W, 3), jnp.float32)  # clip of 2 frames
    sizes = jnp.asarray([[H, W], [H, W]], jnp.int32)
    out = infer(params, frames, sizes)
    assert out["pred_logits"].shape == (2, NQ, 5)
    assert out["pred_boxes"].shape == (2, NQ, 4)
    assert out["pred_inst_embed"].shape == (2, NQ, 32)
    assert out["pred_masks"].shape == (2, NQ, H // 4, W // 4)
    boxes = np.asarray(out["pred_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()


def test_gradients_flow(setup):
    model, params, _, _ = setup
    rng = np.random.RandomState(4)
    key_images = jnp.asarray(rng.randn(1, H, W, 3), jnp.float32)
    key_sizes = jnp.asarray([[H, W]], jnp.int32)
    targets = random_targets(rng)

    @jax.jit
    def grad_fn(params):
        def loss_fn(p):
            losses = model.apply(
                {"params": p}, key_images, key_sizes, key_images, key_sizes,
                targets, targets, train=True, rngs={"dropout": jax.random.PRNGKey(5)},
            )
            return sum(jnp.asarray(v) for v in losses.values())

        return jax.grad(loss_fn)(params)

    grads = grad_fn(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["transformer"]))
    assert gnorm > 0
    gnorm_cls = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads["class_embed_1"])
    )
    assert gnorm_cls > 0
