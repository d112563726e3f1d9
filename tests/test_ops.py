"""Op-vs-oracle tests.

Follows the reference's test strategy (projects/IDOL/idol/models/ops/test.py:32):
the custom op is compared against an independent torch oracle (grid_sample /
F.interpolate), including gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vnext_tpu.ops import (
    aligned_bilinear,
    dice_loss,
    mask_nms_keep,
    ms_deform_attn_core_jnp,
    nms_mask,
    resize_bilinear,
    resize_bilinear_ac,
    resize_nearest,
    sigmoid_focal_loss,
)


# ---------------------------------------------------------------------------
# torch oracle for multi-scale deformable attention, built from grid_sample —
# the same oracle the reference uses to validate its CUDA kernel.
# ---------------------------------------------------------------------------
def _msda_torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    N, S, M, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    out = torch.zeros(N, M, D, Q, dtype=value.dtype)
    start = 0
    grids = 2 * sampling_locations - 1
    for lid, (H, W) in enumerate(spatial_shapes):
        v = value[:, start : start + H * W]  # [N, HW, M, D]
        v = v.permute(0, 2, 3, 1).reshape(N * M, D, H, W)
        g = grids[:, :, :, lid].permute(0, 2, 1, 3, 4).reshape(N * M, Q, P, 2)
        sampled = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        w = attention_weights[:, :, :, lid].permute(0, 2, 1, 3).reshape(N * M, 1, Q, P)
        out += (sampled * w).sum(-1).reshape(N, M, D, Q)
        start += H * W
    return out.reshape(N, M * D, Q).transpose(1, 2).contiguous()


def _random_msda_inputs(seed=0, B=2, M=4, D=8, Q=10, P=3):
    rng = np.random.RandomState(seed)
    shapes = ((6, 9), (4, 5), (2, 3))
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = rng.rand(B, Q, M, L, P, 2).astype(np.float32) * 1.2 - 0.1  # include out-of-bounds
    attn = rng.rand(B, Q, M, L, P).astype(np.float32) + 1e-5
    attn = attn / attn.reshape(B, Q, M, L * P).sum(-1, keepdims=True).reshape(B, Q, M, 1, 1)
    return value, shapes, loc, attn


def test_msda_matches_grid_sample_oracle():
    value, shapes, loc, attn = _random_msda_inputs()
    out_jax = np.asarray(ms_deform_attn_core_jnp(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn)))
    out_torch = (
        _msda_torch_oracle(
            torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(attn)
        )
        .numpy()
    )
    np.testing.assert_allclose(out_jax, out_torch, rtol=1e-4, atol=1e-5)


def test_msda_gradients_match_torch():
    value, shapes, loc, attn = _random_msda_inputs(seed=1, B=1, M=2, D=4, Q=5, P=2)

    def f_jax(v, l, a):
        return jnp.sum(ms_deform_attn_core_jnp(v, shapes, l, a) ** 2)

    gv, gl, ga = jax.grad(f_jax, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    )

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    (_msda_torch_oracle(tv, shapes, tl, ta) ** 2).sum().backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ga), ta.grad.numpy(), rtol=1e-3, atol=1e-4)
    # location grads involve the bilinear kernel's derivative; compare where defined
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# resize parity
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("out_size", [(13, 17), (32, 48), (7, 5)])
def test_resize_bilinear_matches_torch(out_size):
    x = np.random.RandomState(0).randn(2, 3, 16, 24).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), *out_size))
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_resize_bilinear_ac_matches_torch():
    x = np.random.RandomState(1).randn(1, 2, 9, 11).astype(np.float32)
    ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), 17, 23))
    ref = F.interpolate(torch.from_numpy(x), size=(17, 23), mode="bilinear", align_corners=True).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_size", [(8, 8), (15, 9), (40, 60)])
def test_resize_nearest_matches_torch(out_size):
    x = np.random.RandomState(2).randn(2, 1, 20, 30).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), *out_size))
    ref = F.interpolate(torch.from_numpy(x), size=out_size, mode="nearest").numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_aligned_bilinear_matches_reference_sequence():
    def torch_aligned_bilinear(tensor, factor):
        # the reference upsampler, reproduced as an oracle
        # (projects/IDOL/idol/models/segmentation_condInst.py:616)
        h, w = tensor.size()[2:]
        tensor = F.pad(tensor, pad=(0, 1, 0, 1), mode="replicate")
        oh, ow = factor * h + 1, factor * w + 1
        tensor = F.interpolate(tensor, size=(oh, ow), mode="bilinear", align_corners=True)
        tensor = F.pad(tensor, pad=(factor // 2, 0, factor // 2, 0), mode="replicate")
        return tensor[:, :, : oh - 1, : ow - 1]

    x = np.random.RandomState(3).randn(2, 4, 6, 5).astype(np.float32)
    for factor in (1, 2, 4):
        ours = np.asarray(aligned_bilinear(jnp.asarray(x), factor))
        if factor == 1:
            ref = x
        else:
            ref = torch_aligned_bilinear(torch.from_numpy(x), factor).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------
def test_focal_and_dice_match_reference_formulas():
    rng = np.random.RandomState(4)
    logits = rng.randn(5, 37).astype(np.float32)
    targets = (rng.rand(5, 37) > 0.5).astype(np.float32)

    t_logits = torch.from_numpy(logits)
    t_targets = torch.from_numpy(targets)
    prob = t_logits.sigmoid()
    ce = F.binary_cross_entropy_with_logits(t_logits, t_targets, reduction="none")
    p_t = prob * t_targets + (1 - prob) * (1 - t_targets)
    ref_focal = (0.25 * t_targets + 0.75 * (1 - t_targets)) * ce * (1 - p_t) ** 2
    ref_focal = (ref_focal.mean(1).sum() / 3.0).item()
    ours_focal = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets), 3.0))
    assert abs(ours_focal - ref_focal) < 1e-5

    inp = prob.flatten(1)
    num = 2 * (inp * t_targets).sum(1)
    den = inp.sum(-1) + t_targets.sum(-1)
    ref_dice = ((1 - (num + 1) / (den + 1)).sum() / 3.0).item()
    ours_dice = float(dice_loss(jnp.asarray(logits), jnp.asarray(targets), 3.0))
    assert abs(ours_dice - ref_dice) < 1e-5


def test_losses_ignore_invalid_rows():
    logits = jnp.zeros((4, 8))
    targets = jnp.ones((4, 8))
    valid = jnp.array([1, 1, 0, 0], bool)
    full = float(sigmoid_focal_loss(logits[:2], targets[:2], 2.0))
    masked = float(sigmoid_focal_loss(logits, targets, 2.0, valid=valid))
    assert abs(full - masked) < 1e-6


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------
def _nms_python_oracle(boxes, scores, thr):
    idxs = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in idxs:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in idxs:
            if j == i or suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter) > thr:
                suppressed[j] = True
    return sorted(keep)


def test_nms_matches_oracle():
    rng = np.random.RandomState(5)
    xy = rng.rand(32, 2) * 50
    wh = rng.rand(32, 2) * 30 + 1
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(32).astype(np.float32)
    keep_mask = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    ours = sorted(np.nonzero(keep_mask)[0].tolist())
    ref = _nms_python_oracle(boxes, scores, 0.5)
    assert ours == ref


def test_nms_respects_valid_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([False, True, True])
    keep = np.asarray(nms_mask(boxes, scores, 0.5, valid=valid))
    assert not keep[0] and keep[1] and keep[2]


def test_mask_nms_input_order_semantics():
    # two identical masks: the FIRST in input order survives regardless of score
    m = np.full((3, 8, 8), -10.0, np.float32)
    m[0, :4, :4] = 10.0
    m[1, :4, :4] = 10.0
    m[2, 4:, 4:] = 10.0
    keep = np.asarray(mask_nms_keep(jnp.asarray(m), jnp.asarray([0.1, 0.9, 0.5]), 0.5))
    assert keep.tolist() == [True, False, True]


def test_msda_factorized_xla_matches_oracle():
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_factorized_xla

    value, shapes, loc, attn = _random_msda_inputs(seed=7)
    ref = np.asarray(
        _msda_torch_oracle(
            torch.from_numpy(value), shapes, torch.from_numpy(loc), torch.from_numpy(attn)
        )
    )
    out = np.asarray(
        ms_deform_attn_factorized_xla(
            jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn), chunk=4
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_msda_factorized_xla_gradients():
    from vnext_tpu.ops.ms_deform_attn import (
        ms_deform_attn_core_jnp,
        ms_deform_attn_factorized_xla,
    )

    value, shapes, loc, attn = _random_msda_inputs(seed=8, B=1, M=2, D=4, Q=6, P=2)
    args = (jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn))

    g1 = jax.grad(lambda v, l, a: jnp.sum(ms_deform_attn_factorized_xla(v, shapes, l, a, chunk=3) ** 2),
                  argnums=(0, 1, 2))(*args)
    g2 = jax.grad(lambda v, l, a: jnp.sum(ms_deform_attn_core_jnp(v, shapes, l, a) ** 2),
                  argnums=(0, 1, 2))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# roi_align / paste_masks
# ---------------------------------------------------------------------------
def test_paste_masks_matches_torch_grid_sample():
    """paste_masks_in_image vs the reference's own grid_sample formulation
    (detectron2/layers/mask_ops.py _do_paste_mask)."""
    from vnext_tpu.ops.mask_ops import paste_masks_in_image

    rng = np.random.RandomState(6)
    n, m, H, W = 3, 8, 24, 32
    masks = rng.rand(n, m, m).astype(np.float32)
    boxes = np.asarray(
        [[2.0, 3.0, 18.0, 15.0], [-4.0, -2.0, 10.0, 12.0], [20.0, 10.0, 35.0, 26.0]],
        np.float32,
    )

    # torch oracle: grid_sample the mask onto the pixel grid of its box
    t_masks = torch.from_numpy(masks)[:, None]
    ys = torch.arange(H, dtype=torch.float32) + 0.5
    xs = torch.arange(W, dtype=torch.float32) + 0.5
    refs = []
    for i in range(n):
        x0, y0, x1, y1 = boxes[i]
        gy = ((ys - y0) / (y1 - y0)) * 2 - 1
        gx = ((xs - x0) / (x1 - x0)) * 2 - 1
        grid = torch.stack(torch.meshgrid(gy, gx, indexing="ij"), dim=-1)[..., [1, 0]]
        sampled = F.grid_sample(
            t_masks[i : i + 1], grid[None], align_corners=False, padding_mode="zeros"
        )
        refs.append(sampled[0, 0].numpy())
    ref = np.stack(refs) >= 0.5

    out = np.asarray(
        paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), (H, W), 0.5)
    )
    np.testing.assert_array_equal(out, ref)
