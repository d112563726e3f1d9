"""Swin Transformer backbone (flax, NHWC) for detection/VIS.

Capability parity with the reference's detection Swin
(projects/IDOL/idol/backbone/swin.py: window attention :72, shifted blocks :172,
D2SwinTransformer :685). TPU-first details:

- all window partitioning / shift masks are computed at trace time from static
  feature shapes (numpy), so the whole backbone is one fused XLA program;
- attention uses f32 softmax with bf16 matmuls under the compute dtype policy;
- relative-position bias tables are stored exactly like the torch checkpoints
  ([(2w-1)^2, n_heads]) so Swin-L weights import directly.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _variants() -> set:
    """Trace-time perf-diagnostic ablations (tools/profile_swin.py).

    Comma-separated VNEXT_SWIN_VARIANT values; production default is the empty
    set. These change numerics and exist ONLY to attribute time inside the
    backbone: noattn (skip the whole attention branch), nomlp (skip the MLP
    branch), sm_bf16 (softmax in compute dtype instead of f32), noshift
    (drop rolls + masks), nobias (skip relative-position bias).
    """
    return set(v for v in os.environ.get("VNEXT_SWIN_VARIANT", "").split(",") if v)


def _relative_position_index(window_size: int) -> np.ndarray:
    """[w*w, w*w] index into the (2w-1)^2 bias table (standard Swin indexing)."""
    w = window_size
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))  # [2, w, w]
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # [2, ww, ww]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """[num_windows, ww, ww] additive mask (0 / -100) for shifted windows."""
    img_mask = np.zeros((hp, wp), np.int32)
    cnt = 0
    for h_sl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w_sl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[h_sl, w_sl] = cnt
            cnt += 1
    m = img_mask.reshape(hp // window, window, wp // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = m[:, None, :] != m[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array]) -> Array:
        """x: [nW*B, ww, C]; mask: [nW, ww, ww] or None."""
        b_, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        scale = self.qk_scale or head_dim**-0.5

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        variants = _variants()
        acc_t = self.dtype if "sm_bf16" in variants else jnp.float32
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k).astype(acc_t)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = _relative_position_index(self.window_size).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # [h, ww, ww]
        if "nobias" not in variants:
            attn = attn + bias[None].astype(acc_t)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + mask[None, :, None].astype(acc_t)
            attn = attn.reshape(b_, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: [B, H, W, C]."""
        b, h0, w0, c = x.shape
        # NO window/shift clamping on small maps: the reference detection Swin
        # (idol/backbone/swin.py:247-262, BasicLayer:404-439) always pads the
        # map to a multiple of window_size and keeps shift = ws//2, unlike the
        # classification Swin. Clamping would re-index the 169-entry relative
        # position bias table and misapply released Swin-L weights.
        win = self.window_size
        shift = self.shift_size
        variants = _variants()
        if "noshift" in variants:
            shift = 0

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)

        if "noattn" in variants:
            x = shortcut
            y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
            y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
            return x + self._drop_path(y, train)

        pad_b = (win - h0 % win) % win
        pad_r = (win - w0 % win) % win
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h0 + pad_b, w0 + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, win, shift))
        else:
            mask = None

        # window partition
        x = x.reshape(b, hp // win, win, wp // win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        x = WindowAttention(
            self.dim, win, self.num_heads, self.qkv_bias, self.qk_scale,
            dtype=self.dtype, name="attn",
        )(x, mask)
        # reverse partition
        x = x.reshape(b, hp // win, wp // win, win, win, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h0, :w0]

        x = shortcut + self._drop_path(x, train)
        if "nomlp" in variants:
            return x
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + self._drop_path(y, train)

    def _drop_path(self, x: Array, train: bool) -> Array:
        if not train or self.drop_path == 0.0:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
        return x * mask.astype(x.dtype) / keep


class PatchMerging(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Hierarchical Swin backbone; returns {"res2".."res5"} NHWC feature maps."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    dtype: Any = jnp.float32

    @property
    def output_channels(self) -> Dict[str, int]:
        return {f"res{i + 2}": int(self.embed_dim * 2**i) for i in range(len(self.depths))}

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Dict[str, Array]:
        p = self.patch_size
        b, h, w, _ = x.shape
        pad_b = (p - h % p) % p
        pad_r = (p - w % p) % p
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype, name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        outputs = {}
        blk_i = 0
        for stage, depth in enumerate(self.depths):
            dim = int(self.embed_dim * 2**stage)
            for d in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[stage],
                    window_size=self.window_size,
                    shift_size=0 if d % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale,
                    drop_path=dpr[blk_i],
                    dtype=self.dtype,
                    name=f"layers_{stage}_blocks_{d}",
                )(x, train)
                blk_i += 1
            name = f"res{stage + 2}"
            if name in self.out_features:
                out = nn.LayerNorm(dtype=self.dtype, name=f"out_norm{stage}")(x)
                outputs[name] = out
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"downsample_{stage}")(x)
        return outputs


def build_swin_backbone(cfg, dtype=jnp.float32) -> SwinTransformer:
    s = cfg.MODEL.SWIN
    return SwinTransformer(
        embed_dim=s.EMBED_DIM,
        depths=tuple(s.DEPTHS),
        num_heads=tuple(s.NUM_HEADS),
        window_size=s.WINDOW_SIZE,
        patch_size=s.PATCH_SIZE,
        mlp_ratio=s.MLP_RATIO,
        qkv_bias=s.QKV_BIAS,
        qk_scale=s.QK_SCALE,
        drop_path_rate=s.DROP_PATH_RATE,
        patch_norm=s.PATCH_NORM,
        dtype=dtype,
    )
