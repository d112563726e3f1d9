"""Point sampling (point-rend loss machinery) vs torch grid_sample oracle."""

import jax
import jax.numpy as jnp
import numpy as np


def test_point_sample_matches_grid_sample():
    import torch
    import torch.nn.functional as F

    from vnext_tpu.ops.point_sample import point_sample

    rng = np.random.RandomState(0)
    x = rng.randn(3, 12, 17).astype(np.float32)
    pts = rng.rand(3, 50, 2).astype(np.float32)

    ours = np.asarray(point_sample(jnp.asarray(x), jnp.asarray(pts)))
    # reference point_sample: grid_sample on [N,1,H,W] with 2*p-1 grid
    ref = F.grid_sample(
        torch.from_numpy(x)[:, None],
        2.0 * torch.from_numpy(pts)[:, None] - 1.0,
        align_corners=False,
    )[:, 0, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_uncertain_point_coords_shapes_and_bias():
    from vnext_tpu.ops.point_sample import (
        get_uncertain_point_coords_with_randomness,
        point_sample,
    )

    # a mask whose boundary (logit ~ 0) runs down the middle column
    logits = np.full((1, 32, 32), -8.0, np.float32)
    logits[0, :, 16:] = 8.0
    logits[0, :, 14:18] = 0.1
    coords = get_uncertain_point_coords_with_randomness(
        jnp.asarray(logits), num_points=128, rng=jax.random.PRNGKey(0)
    )
    assert coords.shape == (1, 128, 2)
    c = np.asarray(coords)
    assert (c >= 0).all() and (c <= 1).all()
    # importance-sampled picks concentrate near the uncertain band x~0.5: the
    # in-band fraction must far exceed the uniform expectation (4/32 = 12.5%)
    importance = c[0, :96, 0]  # first 75% are the uncertainty-ranked picks
    assert (np.abs(importance - 0.5) < 0.1).mean() > 0.35


def test_sampled_mask_losses_sensible():
    from vnext_tpu.ops.point_sample import sampled_mask_losses

    # smooth GT (rectangles) so bilinear point targets stay ~binary
    gt = np.zeros((4, 24, 24), np.float32)
    for i in range(4):
        gt[i, 4 + i : 18, 6 : 20 - i] = 1.0
    perfect = jnp.asarray((gt * 2 - 1) * 12.0)  # +-12 logits matching gt
    wrong = -perfect
    valid = jnp.ones(4)
    num = jnp.asarray(4.0)
    bce_p, dice_p = sampled_mask_losses(perfect, jnp.asarray(gt), valid, num,
                                        num_points=256, rng=jax.random.PRNGKey(1))
    bce_w, dice_w = sampled_mask_losses(wrong, jnp.asarray(gt), valid, num,
                                        num_points=256, rng=jax.random.PRNGKey(1))
    # sampling targets the boundary where even a perfect mask pays some loss,
    # but a perfect mask must be far better than an inverted one
    assert float(bce_p) < 0.25 * float(bce_w)
    assert float(dice_p) < 0.5 * float(dice_w)
    assert float(bce_w) > 1.0 and float(dice_w) > 0.5
    # gradients flow to the mask logits
    g = jax.grad(lambda m: sampled_mask_losses(m, jnp.asarray(gt), valid, num,
                                               num_points=64,
                                               rng=jax.random.PRNGKey(2))[0])(perfect * 0.1)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_maskformer_point_loss_path():
    from vnext_tpu.models.mask2former import MaskFormer, MaskTargets

    model = MaskFormer(
        num_classes=4, hidden_dim=32, num_queries=8, dim_feedforward=64,
        dec_layers=2, enc_layers=1, num_points=64, msda_impl="jnp",
    )
    h, w = 64, 96
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    sizes = jnp.asarray([[h, w]], jnp.int32)
    masks = np.zeros((1, 4, h // 4, w // 4), bool)
    masks[0, 0, 2:8, 4:12] = True
    masks[0, 1, 6:14, 10:20] = True
    targets = MaskTargets(
        labels=jnp.asarray([[1, 2, 0, 0]], jnp.int32),
        masks_s4=jnp.asarray(masks),
        valid=jnp.asarray([[True, True, False, False]]),
    )
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets,
                           train=False)["params"]
    )()
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, sizes, targets, train=True)
    )(params)
    assert {"loss_ce", "loss_mask", "loss_dice"} <= set(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert float(losses["loss_mask"]) > 0
