"""MinVIS/MaskFormer + InstMove training-path tests (reference:
projects/InstMove/MinVIS_motion/train_net_video.py:64 Trainer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vnext_tpu.models.mask2former import MaskFormer, MaskTargets


def _tiny_maskformer():
    return MaskFormer(
        num_classes=3, hidden_dim=32, num_queries=8, dec_layers=2, enc_layers=1,
        dim_feedforward=64, backbone_depth=18, num_points=64, msda_impl="jnp",
    )


def _tiny_batch(rng, b=1, h=64, w=96, k=4):
    images = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    sizes = jnp.asarray([[h, w]] * b, jnp.int32)
    masks = np.zeros((b, k, h // 4, w // 4), bool)
    masks[:, 0, 2:8, 3:12] = True
    masks[:, 1, 8:14, 1:6] = True
    targets = MaskTargets(
        labels=jnp.asarray(rng.randint(0, 3, (b, k)), jnp.int32),
        masks_s4=jnp.asarray(masks),
        valid=jnp.asarray(np.arange(k)[None] < 2).repeat(b, 0),
    )
    return images, sizes, targets


def test_maskformer_train_step_decreases_loss():
    from vnext_tpu.engine.train_step import TrainState, make_train_step

    rng = np.random.RandomState(0)
    model = _tiny_maskformer()
    images, sizes, targets = _tiny_batch(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, sizes, targets, train=False,
    )["params"]
    tx = optax.adam(1e-3)
    weights = {"loss_ce": 2.0, "loss_mask": 5.0, "loss_dice": 5.0,
               "loss_ce_0": 2.0, "loss_mask_0": 5.0, "loss_dice_0": 5.0}
    step = make_train_step(model, tx, weights, donate=False)
    state = TrainState.create(params, tx)

    losses = []
    for _ in range(6):
        state, metrics = step(state, (images, sizes, targets), jax.random.PRNGKey(2))
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_build_model_maskformer_from_config():
    from vnext_tpu.config import add_maskformer_config, get_cfg
    from vnext_tpu.models import build_model

    cfg = get_cfg()
    add_maskformer_config(cfg)
    cfg.merge_from_file("configs/quick_schedules/minvis_instant_test.yaml")
    model = build_model(cfg)
    assert isinstance(model, MaskFormer)
    assert model.num_queries == 16 and model.dec_layers == 2


def test_maskformer_weight_dict_covers_aux():
    from vnext_tpu.config import add_maskformer_config, get_cfg
    from vnext_tpu.models.mask2former import maskformer_weight_dict

    cfg = get_cfg()
    add_maskformer_config(cfg)
    wd = maskformer_weight_dict(cfg)
    assert wd["loss_ce"] == 2.0 and wd["loss_mask_0"] == 5.0
    # DEC_LAYERS+1 prediction sets -> aux terms _0.._{DEC_LAYERS-1}
    assert f"loss_dice_{cfg.MODEL.MASK_FORMER.DEC_LAYERS - 1}" in wd


def test_instmove_training_decreases_loss():
    from vnext_tpu.models.instmove import InstMovePredictor, instmove_loss

    rng = np.random.RandomState(0)
    h = w = 32
    model = InstMovePredictor(memory_size=8, num_lstm_layers=2, lstm_channels=16)
    past = np.zeros((2, 3, h, w, 1), np.float32)
    nxt = np.zeros((2, 1, h, w, 1), np.float32)
    # a box translating right by 2 px/frame; target continues the motion
    for t in range(3):
        past[:, t, 8:20, 4 + 2 * t : 16 + 2 * t] = 1.0
    nxt[:, 0, 8:20, 10:22] = 1.0
    past, nxt = jnp.asarray(past), jnp.asarray(nxt)
    image = jnp.asarray(rng.randn(2, h, w, 3), jnp.float32)

    params = model.init({"params": jax.random.PRNGKey(0)}, past, image)["params"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply({"params": p}, past, image, out_len=1)
            losses = instmove_loss(pred, nxt)
            return losses["loss_mask"] + losses["loss_dice"], losses

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, total

    losses = []
    for _ in range(5):
        params, opt_state, total = step(params, opt_state)
        losses.append(float(total))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
