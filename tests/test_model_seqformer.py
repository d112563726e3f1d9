"""Tiny-model e2e tests for SeqFormer (shared instance query + per-frame box
queries + time-attention fusion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.seqformer import ClipTargets, SeqFormer

H, W, NF, K, NQ = 64, 96, 3, 4, 12


@pytest.fixture(scope="module")
def setup():
    model = SeqFormer(
        num_classes=5, hidden_dim=32, num_queries=NQ, nheads=4, dim_feedforward=64,
        enc_layers=1, dec_layers=2, max_insts=K, msda_impl="jnp",
    )
    imgs = jnp.zeros((1, NF, H, W, 3))
    sizes = jnp.asarray([[H, W]], jnp.int32)
    tgt = _targets(np.random.RandomState(0))
    variables = jax.jit(
        lambda t: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            imgs, sizes, t, train=False,
        )
    )(tgt)

    @jax.jit
    def losses_fn(params, imgs, sizes, t):
        return model.apply(
            {"params": params}, imgs, sizes, t, train=True,
            rngs={"dropout": jax.random.PRNGKey(2)},
        )

    @jax.jit
    def infer(params, imgs, sizes):
        return model.apply({"params": params}, imgs, sizes, method=SeqFormer.inference)

    return model, variables["params"], losses_fn, infer


def _targets(rng, n_valid=2):
    boxes = np.zeros((1, K, NF, 4), np.float32)
    boxes[..., :2] = rng.rand(1, K, NF, 2) * 0.5 + 0.25
    boxes[..., 2:] = rng.rand(1, K, NF, 2) * 0.2 + 0.1
    masks = np.zeros((1, K, NF, H // 4, W // 4), bool)
    for i in range(n_valid):
        masks[0, i, :, 3 + i : 9 + i, 2:10] = True
    return ClipTargets(
        labels=jnp.asarray(rng.randint(0, 5, (1, K)), jnp.int32),
        boxes=jnp.asarray(boxes),
        masks_s4=jnp.asarray(masks),
        valid=jnp.asarray(np.arange(K)[None] < n_valid),
    )


def test_train_losses_finite(setup):
    _, params, losses_fn, _ = setup
    rng = np.random.RandomState(1)
    imgs = jnp.asarray(rng.randn(1, NF, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H - 8, W - 16]], jnp.int32)
    losses = losses_fn(params, imgs, sizes, _targets(rng))
    expected = {"loss_ce", "loss_bbox", "loss_giou", "loss_mask", "loss_dice",
                "loss_ce_0", "loss_bbox_0"}
    assert expected.issubset(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_empty_clip_targets(setup):
    _, params, losses_fn, _ = setup
    rng = np.random.RandomState(2)
    imgs = jnp.asarray(rng.randn(1, NF, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    losses = losses_fn(params, imgs, sizes, _targets(rng, n_valid=0))
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite on empty GT"


def test_inference_shapes(setup):
    _, params, _, infer = setup
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(rng.randn(1, NF, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    out = infer(params, imgs, sizes)
    assert out["pred_logits"].shape == (NQ, 5)
    assert out["pred_boxes"].shape == (NF, NQ, 4)
    assert out["pred_masks"].shape == (NQ, NF, H // 4, W // 4)
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()


def test_gradients_flow(setup):
    model, params, _, _ = setup
    rng = np.random.RandomState(4)
    imgs = jnp.asarray(rng.randn(1, NF, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    t = _targets(rng)

    @jax.jit
    def grad_fn(p):
        def loss(p):
            losses = model.apply(
                {"params": p}, imgs, sizes, t, train=True,
                rngs={"dropout": jax.random.PRNGKey(5)},
            )
            return sum(jnp.asarray(v) for v in losses.values())

        return jax.grad(loss)(p)

    grads = grad_fn(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))
    tw = grads["transformer"]["decoder_1"]["time_attention_weights"]["kernel"]
    assert np.abs(np.asarray(tw)).sum() > 0
