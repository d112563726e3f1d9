"""Deformable conv vs torch oracle built from grid_sample + unfold-style math."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vnext_tpu.ops.deform_conv import deform_conv2d


def _torch_oracle(x, offsets, weight, bias, stride, padding, dilation, modulation=None):
    """Independent torch implementation: per-tap grid_sample + weighted sum.
    x: [B, Cin, H, W]; offsets: [B, 2K², Ho, Wo]; weight: [Cout, Cin, Kh, Kw]."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    ys = torch.arange(ho) * stride - padding
    xs = torch.arange(wo) * stride - padding
    gy, gx = torch.meshgrid(ys.float(), xs.float(), indexing="ij")
    out = torch.zeros(b, cout, ho, wo)
    k = 0
    for iy in range(kh):
        for ix in range(kw):
            sy = gy[None] + iy * dilation + offsets[:, 2 * k]
            sx = gx[None] + ix * dilation + offsets[:, 2 * k + 1]
            gx_n = 2 * (sx + 0.5) / w - 1
            gy_n = 2 * (sy + 0.5) / h - 1
            grid = torch.stack([gx_n, gy_n], dim=-1)
            sampled = F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                                    align_corners=False)
            if modulation is not None:
                sampled = sampled * modulation[:, k : k + 1]
            out = out + torch.einsum("bchw,oc->bohw", sampled, weight[:, :, iy, ix])
            k += 1
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def test_deform_conv_matches_oracle():
    rng = np.random.RandomState(0)
    b, h, w, cin, cout, kk = 2, 9, 11, 4, 6, 3
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offsets = (rng.randn(b, h, w, 2 * kk * kk) * 1.5).astype(np.float32)
    weight = rng.randn(kk, kk, cin, cout).astype(np.float32)
    bias = rng.randn(cout).astype(np.float32)

    ours = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
                      jnp.asarray(bias), stride=1, padding=1)
    )
    ref = _torch_oracle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(offsets.transpose(0, 3, 1, 2)),
        torch.from_numpy(weight.transpose(3, 2, 0, 1)),
        torch.from_numpy(bias), 1, 1, 1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_modulated_deform_conv_and_stride():
    rng = np.random.RandomState(1)
    b, h, w, cin, cout, kk = 1, 10, 8, 3, 5, 3
    stride = 2
    ho = (h + 2 * 1 - 1 * (kk - 1) - 1) // stride + 1
    wo = (w + 2 * 1 - 1 * (kk - 1) - 1) // stride + 1
    x = rng.randn(b, h, w, cin).astype(np.float32)
    offsets = (rng.randn(b, ho, wo, 2 * kk * kk)).astype(np.float32)
    modulation = rng.rand(b, ho, wo, kk * kk).astype(np.float32)
    weight = rng.randn(kk, kk, cin, cout).astype(np.float32)

    ours = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight),
                      None, stride=stride, padding=1,
                      modulation=jnp.asarray(modulation))
    )
    ref = _torch_oracle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(offsets.transpose(0, 3, 1, 2)),
        torch.from_numpy(weight.transpose(3, 2, 0, 1)),
        None, stride, 1, 1,
        modulation=torch.from_numpy(modulation.transpose(0, 3, 1, 2)),
    ).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == (b, ho, wo, cout)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_zero_offsets_equal_regular_conv():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    weight = rng.randn(3, 3, 3, 4).astype(np.float32)
    offsets = np.zeros((1, 8, 8, 18), np.float32)
    ours = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight), None)
    )
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(weight.transpose(3, 2, 0, 1)), padding=1)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)
