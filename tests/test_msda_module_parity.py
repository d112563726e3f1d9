"""MSDeformAttnModule (projections + offsets + softmax + sampling) vs a torch
module oracle with IDENTICAL weights — validates the full layer wiring, not just
the sampling core (the key prerequisite for reference-weight AP parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vnext_tpu.models.deformable_transformer import MSDeformAttnModule, _offset_bias_init


def _torch_msda_module(query, ref_points, src, shapes, weights, M, L, P):
    """Reference-equivalent torch forward using our flax weights.

    query [B,Q,C], ref_points [B,Q,L,2], src [B,S,C]."""
    def lin(x, name):
        w = torch.from_numpy(np.asarray(weights[name]["kernel"]))
        b = torch.from_numpy(np.asarray(weights[name]["bias"]))
        return x @ w + b

    B, Q, C = query.shape
    D = C // M
    value = lin(src, "value_proj").reshape(B, -1, M, D)
    offsets = lin(query, "sampling_offsets").reshape(B, Q, M, L, P, 2)
    attn = lin(query, "attention_weights").reshape(B, Q, M, L * P)
    attn = F.softmax(attn, -1).reshape(B, Q, M, L, P)

    wh = torch.tensor([[w, h] for h, w in shapes], dtype=torch.float32)
    loc = ref_points[:, :, None, :, None, :] + offsets / wh[None, None, None, :, None, :]

    # grid_sample core (same oracle as tests/test_ops.py)
    out = torch.zeros(B, M, D, Q)
    start = 0
    grids = 2 * loc - 1
    for lid, (H, W) in enumerate(shapes):
        v = value[:, start : start + H * W].permute(0, 2, 3, 1).reshape(B * M, D, H, W)
        g = grids[:, :, :, lid].permute(0, 2, 1, 3, 4).reshape(B * M, Q, P, 2)
        sampled = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        w_ = attn[:, :, :, lid].permute(0, 2, 1, 3).reshape(B * M, 1, Q, P)
        out += (sampled * w_).sum(-1).reshape(B, M, D, Q)
        start += H * W
    out = out.reshape(B, M * D, Q).transpose(1, 2)
    return lin(out, "output_proj")


def test_msda_module_matches_torch_with_same_weights():
    rng = np.random.RandomState(0)
    B, Q, C, M, L, P = 1, 7, 16, 4, 3, 2
    shapes = ((6, 8), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    query = rng.randn(B, Q, C).astype(np.float32)
    src = rng.randn(B, S, C).astype(np.float32)
    ref = rng.rand(B, Q, L, 2).astype(np.float32)

    mod = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=P, impl="jnp")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(query), jnp.asarray(ref),
                         jnp.asarray(src), shapes)
    # randomize all weights (init zeros some of them)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.2), variables["params"]
    )
    out_ours = np.asarray(
        mod.apply({"params": params}, jnp.asarray(query), jnp.asarray(ref),
                  jnp.asarray(src), shapes)
    )
    out_ref = _torch_msda_module(
        torch.from_numpy(query), torch.from_numpy(ref), torch.from_numpy(src),
        shapes, jax.tree_util.tree_map(np.asarray, params), M, L, P,
    ).numpy()
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-4, atol=1e-5)


def test_msda_module_box_reference_points():
    """4-d reference boxes use the box-scaled offset formula (reference
    ms_deform_attn.py:108-110)."""
    rng = np.random.RandomState(1)
    B, Q, C, M, L, P = 1, 5, 16, 4, 2, 3
    shapes = ((5, 6), (3, 3))
    S = sum(h * w for h, w in shapes)
    query = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    src = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    ref4 = jnp.asarray(np.concatenate([rng.rand(B, Q, L, 2) * 0.6 + 0.2,
                                       rng.rand(B, Q, L, 2) * 0.2 + 0.1], -1), jnp.float32)
    mod = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=P, impl="jnp")
    variables = mod.init(jax.random.PRNGKey(0), query, ref4, src, shapes)
    out = mod.apply(variables, query, ref4, src, shapes)
    assert out.shape == (B, Q, C)
    assert np.isfinite(np.asarray(out)).all()


def test_offset_bias_init_matches_reference_scheme():
    """Head-direction grid init (reference _reset_parameters, ms_deform_attn.py:63)."""
    import math

    M, L, P = 8, 4, 4
    init = _offset_bias_init(M, L, P)(None, (M * L * P * 2,))
    grid = np.asarray(init).reshape(M, L, P, 2)
    thetas = np.arange(M) * (2 * math.pi / M)
    base = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    base = base / np.abs(base).max(-1, keepdims=True)
    for p in range(P):
        np.testing.assert_allclose(grid[:, 0, p], base * (p + 1), rtol=1e-5, atol=1e-6)
    # same across levels
    np.testing.assert_allclose(grid[:, 0], grid[:, L - 1])


def test_msda_module_channel_major_matches_standard():
    """channel_major=True path == standard path with the same params."""
    rng = np.random.RandomState(3)
    M, L, P, C = 2, 2, 2, 16
    shapes = ((8, 10), (4, 5))
    S = sum(h * w for h, w in shapes)
    B = 2
    src = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    query = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    ref = jnp.asarray(rng.rand(B, S, L, 2), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.9)

    mod = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=P)
    params = mod.init(jax.random.PRNGKey(0), query, ref, src, shapes, mask)
    out_std = mod.apply(params, query, ref, src, shapes, mask)

    queryT = jnp.swapaxes(query, 1, 2)
    srcT = jnp.swapaxes(src, 1, 2)
    refT = jnp.transpose(ref, (0, 2, 3, 1))           # [B, L, 2, S]
    outT = mod.apply(
        params, queryT, refT, srcT, shapes, mask, channel_major=True
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(outT, 1, 2)), np.asarray(out_std), atol=2e-5
    )


def test_encoder_layer_channel_major_matches_standard():
    from vnext_tpu.models.deformable_transformer import EncoderLayer

    rng = np.random.RandomState(5)
    M, L, P, C = 2, 2, 2, 16
    shapes = ((8, 10), (4, 5))
    S = sum(h * w for h, w in shapes)
    B = 2
    src = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    pos = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    ref = jnp.asarray(rng.rand(B, S, L, 2), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.9)

    layer = EncoderLayer(d_model=C, d_ffn=32, n_levels=L, n_heads=M, n_points=P)
    params = layer.init(
        {"params": jax.random.PRNGKey(0)}, src, pos, ref, shapes, mask, False
    )
    out_std = layer.apply(params, src, pos, ref, shapes, mask, False)

    outT = layer.apply(
        params,
        jnp.swapaxes(src, 1, 2),
        jnp.swapaxes(pos, 1, 2),
        jnp.transpose(ref, (0, 2, 3, 1)),
        shapes,
        mask,
        False,
        channel_major=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(outT, 1, 2)), np.asarray(out_std), atol=2e-5
    )


def test_msda_module_channel_major_box_refs_matches_standard():
    """CM path with 4-d (box-refined) references == standard path — the
    decoder cross-attention layout (reference ms_deform_attn.py:108-110)."""
    rng = np.random.RandomState(7)
    M, L, P, C, Q = 2, 2, 2, 16, 9
    shapes = ((8, 10), (4, 5))
    S = sum(h * w for h, w in shapes)
    B = 2
    src = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    query = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    ref4 = jnp.asarray(
        np.concatenate(
            [rng.rand(B, Q, L, 2) * 0.6 + 0.2, rng.rand(B, Q, L, 2) * 0.2 + 0.1],
            -1,
        ),
        jnp.float32,
    )
    mask = jnp.asarray(rng.rand(B, S) > 0.9)

    mod = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=P)
    params = mod.init(jax.random.PRNGKey(0), query, ref4, src, shapes, mask)
    out_std = mod.apply(params, query, ref4, src, shapes, mask)

    outT = mod.apply(
        params,
        jnp.swapaxes(query, 1, 2),
        jnp.transpose(ref4, (0, 2, 3, 1)),            # [B, L, 4, Q]
        jnp.swapaxes(src, 1, 2),
        shapes,
        mask,
        channel_major=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(outT, 1, 2)), np.asarray(out_std), atol=2e-5
    )


def test_decoder_layer_channel_major_matches_standard():
    """DecoderLayer with src_cm (CM cross-attention) == standard decoder layer
    at inference, for both 2-d (first layer) and 4-d (box-refined) refs."""
    from vnext_tpu.models.deformable_transformer import DecoderLayer

    rng = np.random.RandomState(11)
    M, L, P, C, Q = 2, 2, 2, 16, 9
    shapes = ((8, 10), (4, 5))
    S = sum(h * w for h, w in shapes)
    B = 2
    src = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    tgt = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    qpos = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    mask = jnp.asarray(rng.rand(B, S) > 0.9)

    layer = DecoderLayer(d_model=C, d_ffn=32, n_levels=L, n_heads=M, n_points=P)
    for refdim in (2, 4):
        if refdim == 2:
            ref = jnp.asarray(rng.rand(B, Q, L, 2), jnp.float32)
        else:
            ref = jnp.asarray(
                np.concatenate(
                    [rng.rand(B, Q, L, 2) * 0.6 + 0.2,
                     rng.rand(B, Q, L, 2) * 0.2 + 0.1],
                    -1,
                ),
                jnp.float32,
            )
        params = layer.init(
            {"params": jax.random.PRNGKey(0)}, tgt, qpos, ref, src, shapes,
            mask, False,
        )
        out_std = layer.apply(params, tgt, qpos, ref, src, shapes, mask, False)
        out_cm = layer.apply(
            params, tgt, qpos, ref, src, shapes, mask, False,
            src_cm=jnp.swapaxes(src, 1, 2),
        )
        np.testing.assert_allclose(
            np.asarray(out_cm), np.asarray(out_std), atol=2e-5,
            err_msg=f"refdim={refdim}",
        )
