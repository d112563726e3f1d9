"""Shared flax building blocks: MLP, FrozenBatchNorm, conv+GN projections, MHA.

Reference surfaces: idol/models/deformable_detr.py (MLP), idol/models/backbone.py:27
(FrozenBatchNorm2d), detectron2/layers/batch_norm.py. All modules are NHWC and take a
``dtype`` for bf16 compute with f32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray
Dtype = Any


def inverse_sigmoid(x: Array, eps: float = 1e-5) -> Array:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1 - x, eps, None)
    return jnp.log(x1 / x2)


class DualDense(nn.Module):
    """nn.Dense-compatible linear that also accepts channel-major input.

    Same param names/shapes as nn.Dense (kernel [in, out], bias [out]) so
    checkpoints and torch-imported weights are layout-agnostic. With
    ``channel_major=True`` the input/output are [B, C, S] (feature axis -2)
    and the matmul runs as einsum over the major axis — used by the
    channel-major encoder path to keep tokens feature-major end to end.
    """

    features: int
    dtype: Dtype = jnp.float32
    use_bias: bool = True
    kernel_init: Callable = nn.linear.default_kernel_init
    bias_init: Callable = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x: Array, channel_major: bool = False) -> Array:
        in_c = x.shape[-2] if channel_major else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_c, self.features))
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        k = kernel.astype(self.dtype)
        xc = x.astype(self.dtype)
        if channel_major:
            y = jnp.einsum("io,bis->bos", k, xc)
            if bias is not None:
                y = y + bias.astype(self.dtype)[:, None]
            return y
        y = xc @ k
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class ParamHolder(nn.Module):
    """Declares params with exact (name, shape, init) specs and returns them.

    Used by fused-kernel branches to materialize the SAME parameter tree as
    the module chain they replace (e.g. norm1/linear1/linear2/norm2 of an
    encoder layer) without running the unfused compute — name this module as
    the module it stands in for and checkpoints stay path-compatible. The RNG
    fold path (scope name + param name) also matches, so init values are
    bit-identical to the unfused branch.
    """

    specs: Tuple[Tuple[str, Tuple[int, ...], Callable], ...]

    @nn.compact
    def __call__(self):
        return tuple(self.param(n, init, shape) for n, shape, init in self.specs)


class MLP(nn.Module):
    """Simple relu MLP (reference: deformable_detr.py MLP)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32
    final_bias_init: Optional[Callable] = None
    final_kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_layers):
            is_last = i == self.num_layers - 1
            out_dim = self.output_dim if is_last else self.hidden_dim
            kwargs = {}
            if is_last and self.final_kernel_init is not None:
                kwargs["kernel_init"] = self.final_kernel_init
            if is_last and self.final_bias_init is not None:
                kwargs["bias_init"] = self.final_bias_init
            x = nn.Dense(out_dim, dtype=self.dtype, name=f"layers_{i}", **kwargs)(x)
            if not is_last:
                x = nn.relu(x)
        return x


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine parameters.

    All four tensors live in the ``params`` collection (so torch checkpoints map
    directly) but are excluded from optimization by the solver's parameter mask
    (see solver/build.py). eps matches the reference's 1e-5.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        # fold into a single scale/shift, computed in f32 for stability
        mult = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        shift = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * mult + shift


class ConvGN(nn.Module):
    """1x1 or 3x3 conv followed by GroupNorm(32) — the DETR input projection
    (reference: deformable_detr.py input_proj)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="conv",
        )(x)
        x = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype, name="norm")(x)
        return x


class MultiHeadAttention(nn.Module):
    """Standard softmax MHA used for decoder self-attention.

    Matches torch.nn.MultiheadAttention math (scaled dot-product, joint qkv
    projections, output projection); softmax runs in f32.
    """

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array, mask: Optional[Array] = None) -> Array:
        d_model = q.shape[-1]
        head_dim = d_model // self.num_heads

        def split(x):
            return x.reshape(*x.shape[:-1], self.num_heads, head_dim)

        qp = split(nn.Dense(d_model, dtype=self.dtype, name="q_proj")(q))
        kp = split(nn.Dense(d_model, dtype=self.dtype, name="k_proj")(k))
        vp = split(nn.Dense(d_model, dtype=self.dtype, name="v_proj")(v))

        logits = jnp.einsum("...qhd,...khd->...hqk", qp, kp).astype(jnp.float32)
        logits = logits / jnp.sqrt(head_dim).astype(jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, vp)
        out = out.reshape(*out.shape[:-2], d_model)
        return nn.Dense(d_model, dtype=self.dtype, name="out_proj")(out)


class SyncBatchNorm(nn.Module):
    """Cross-replica batch normalization.

    Capability parity with detectron2/layers/batch_norm.py NaiveSyncBatchNorm,
    which all-reduces per-GPU mean/mean-square before normalizing. TPU-native
    form: batch statistics are synchronized over the named mesh axis with
    ``lax.pmean`` (via flax's ``axis_name`` hook), so under ``pmap``/``shard_map``
    every replica normalizes with the GLOBAL batch statistics — the XLA
    collective replaces the reference's dist.all_reduce.

    Outside any mapped axis (``axis_name=None`` or plain jit) it degrades to
    ordinary BatchNorm, matching the reference's world_size==1 early-exit.
    """

    features: int
    axis_name: str | None = None
    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = False) -> Array:
        return nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.eps,
            axis_name=None if use_running_average else self.axis_name,
            dtype=self.dtype,
            name="bn",
        )(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (capability parity with
    detectron2/layers/aspp.py:14 ASPP): 1x1 + three dilated 3x3 branches + a
    global-pool branch, concatenated and projected."""

    out_channels: int
    dilations: tuple = (6, 12, 18)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.out_channels
        branches = [nn.relu(nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                                    name="conv1x1")(x))]
        for i, d in enumerate(self.dilations):
            branches.append(nn.relu(nn.Conv(
                c, (3, 3), padding=[(d, d), (d, d)], kernel_dilation=(d, d),
                use_bias=False, dtype=self.dtype, name=f"conv3x3_d{i}")(x)))
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = nn.relu(nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                                 name="pool_conv")(pooled))
        branches.append(jnp.broadcast_to(pooled, (*x.shape[:3], c)))
        out = jnp.concatenate(branches, axis=-1)
        return nn.relu(nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                               name="project")(out))
