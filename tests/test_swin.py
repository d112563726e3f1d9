"""Swin backbone tests: shapes, shift masks, and a torch oracle for window attention."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vnext_tpu.models.backbones.swin import (
    SwinTransformer,
    WindowAttention,
    _relative_position_index,
    _shift_attn_mask,
)


def test_output_shapes_and_channels():
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8),
                            window_size=4)
    x = jnp.zeros((1, 64, 96, 3))
    variables = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    out = jax.jit(lambda v, x: model.apply(v, x))(variables, x)
    assert out["res2"].shape == (1, 16, 24, 32)
    assert out["res3"].shape == (1, 8, 12, 64)
    assert out["res4"].shape == (1, 4, 6, 128)
    assert out["res5"].shape == (1, 2, 3, 256)


def test_relative_position_index_properties():
    idx = _relative_position_index(3)
    assert idx.shape == (9, 9)
    assert idx.min() >= 0 and idx.max() < 25
    # symmetric offsets map to mirrored table entries; center diagonal constant
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_mask_blocks_cross_region_attention():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m == -100).any()
    # unshifted top-left window has no mixing
    assert (m[0] == 0).all()


def test_window_attention_matches_torch_oracle():
    """Our window attention vs a reference torch implementation with identical weights."""
    dim, win, heads, n = 16, 3, 4, 9
    rng = np.random.RandomState(0)
    x = rng.randn(2, n, dim).astype(np.float32)

    mod = WindowAttention(dim, win, heads)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), None)
    params = variables["params"]
    out_ours = np.asarray(mod.apply(variables, jnp.asarray(x), None))

    qkv_w = np.asarray(params["qkv"]["kernel"])      # [dim, 3dim]
    qkv_b = np.asarray(params["qkv"]["bias"])
    proj_w = np.asarray(params["proj"]["kernel"])
    proj_b = np.asarray(params["proj"]["bias"])
    table = np.asarray(params["relative_position_bias_table"])

    tx = torch.from_numpy(x)
    qkv = tx @ torch.from_numpy(qkv_w) + torch.from_numpy(qkv_b)
    qkv = qkv.reshape(2, n, 3, heads, dim // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scale = (dim // heads) ** -0.5
    attn = (q * scale) @ k.transpose(-2, -1)
    idx = torch.from_numpy(_relative_position_index(win).reshape(-1))
    bias = torch.from_numpy(table)[idx].reshape(n, n, heads).permute(2, 0, 1)
    attn = F.softmax(attn + bias[None], dim=-1)
    out_ref = (attn @ v).transpose(1, 2).reshape(2, n, dim)
    out_ref = out_ref @ torch.from_numpy(proj_w) + torch.from_numpy(proj_b)
    np.testing.assert_allclose(out_ours, out_ref.numpy(), rtol=2e-4, atol=2e-5)


def test_shifted_block_changes_output():
    """Shifted vs unshifted blocks must differ (mask active)."""
    from vnext_tpu.models.backbones.swin import SwinBlock

    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 16), jnp.float32)
    b0 = SwinBlock(dim=16, num_heads=2, window_size=4, shift_size=0)
    b1 = SwinBlock(dim=16, num_heads=2, window_size=4, shift_size=2)
    v0 = b0.init(jax.random.PRNGKey(0), x)
    out0 = b0.apply(v0, x)
    out1 = b1.apply(v0, x)  # same weights, shifted windows
    assert np.abs(np.asarray(out0) - np.asarray(out1)).max() > 1e-5
