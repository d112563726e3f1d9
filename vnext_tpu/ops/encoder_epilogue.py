"""Pallas TPU fused encoder-layer epilogue: LN1(src+attn) -> FFN -> LN2.

Capability anchor: the post-attention tail of the deformable encoder layer
(reference idol/models/deformable_transformer.py:156-176 — norm1, linear1,
relu, linear2, norm2 with residuals). XLA executes this as 4+ HBM passes per
layer at eval shapes ([10, 256, 8617] channel-major): the residual+LN1 pass,
two matmuls with a [B, 1024, S] bf16 intermediate materialized between them
(176 MB written + re-read), and the residual+LN2 pass — ~700 MB of traffic
for ~90 GFLOP of matmul.

This kernel runs the whole tail per S-tile with all weights VMEM-resident:
reads the attention output and src tiles once, writes the final tile once
(132 MB/layer), and keeps the [1024, TS] FFN intermediate in VMEM. LayerNorm
statistics are computed in f32 exactly like flax's LayerNorm
(use_fast_variance: var = E[x^2] - E[x]^2, eps 1e-6); matmuls accumulate f32
on the MXU from bf16 operands, matching the XLA path's dot dtype.

Inference-only (no VJP); the training path keeps the unfused module chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jnp.ndarray

_EPS = 1e-6  # nn.LayerNorm default


def _ln(h, scale, bias):
    """f32 LayerNorm over the channel (sublane) axis of [C, TS]."""
    mu = jnp.mean(h, axis=0, keepdims=True)
    var = jnp.mean(h * h, axis=0, keepdims=True) - mu * mu
    hn = (h - mu) * jax.lax.rsqrt(var + _EPS)
    return hn * scale + bias


def _epilogue_kernel(a_ref, s_ref, w1_ref, w2_ref, pc_ref, b1_ref, out_ref, *,
                     compute_dtype):
    # channel-major tiles [C, TS]; pc columns: 0=ln1_scale 1=ln1_bias
    # 2=ffn_bias2 3=ln2_scale 4=ln2_bias
    a = a_ref[0].astype(jnp.float32)
    s0 = s_ref[0].astype(jnp.float32)
    pc = pc_ref[:]                                          # [C, 8] f32
    h1 = _ln(a + s0, pc[:, 0:1], pc[:, 1:2])                # post-LN1 src
    ff = jax.lax.dot_general(
        w1_ref[:], h1.astype(compute_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:, 0:1]                                      # [F, TS]
    ff = jnp.maximum(ff, 0.0)
    y = jax.lax.dot_general(
        w2_ref[:], ff.astype(compute_dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + pc[:, 2:3]                                          # [C, TS]
    out = _ln(h1 + y, pc[:, 3:4], pc[:, 4:5])
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "ts"))
def encoder_epilogue_cm(
    attn_out: Array,      # [B, C, S] output_proj(msda) (pre-residual)
    src: Array,           # [B, C, S] layer input
    ln1_scale: Array, ln1_bias: Array,          # [C]
    w1: Array, b1: Array,                       # [C, F], [F]
    w2: Array, b2: Array,                       # [F, C], [C]
    ln2_scale: Array, ln2_bias: Array,          # [C]
    interpret: bool = False,
    ts: int = 512,
) -> Array:
    """Fused LN1(src+attn_out) -> FFN -> LN2 over channel-major tokens."""
    b, c, s = attn_out.shape
    f = w1.shape[1]
    s_pad = -(-s // ts) * ts
    if s_pad != s:
        attn_out = jnp.pad(attn_out, ((0, 0), (0, 0), (0, s_pad - s)))
        src = jnp.pad(src, ((0, 0), (0, 0), (0, s_pad - s)))

    cdt = attn_out.dtype
    pc = jnp.stack(
        [ln1_scale, ln1_bias, b2, ln2_scale, ln2_bias]
        + [jnp.zeros_like(b2)] * 3, axis=1,
    ).astype(jnp.float32)                                   # [C, 8]
    b1c = b1.astype(jnp.float32)[:, None]                   # [F, 1]

    out = pl.pallas_call(
        functools.partial(_epilogue_kernel, compute_dtype=cdt),
        grid=(b, s_pad // ts),
        in_specs=[
            pl.BlockSpec((1, c, ts), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((1, c, ts), lambda bi, ti: (bi, 0, ti)),
            pl.BlockSpec((c, f), lambda bi, ti: (0, 0)),
            pl.BlockSpec((f, c), lambda bi, ti: (0, 0)),
            pl.BlockSpec((c, 8), lambda bi, ti: (0, 0)),
            pl.BlockSpec((f, 1), lambda bi, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, ts), lambda bi, ti: (bi, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((b, c, s_pad), cdt),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * s_pad * 2 * c * f,
            bytes_accessed=3 * b * c * s_pad * jnp.dtype(cdt).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(attn_out, src, w1.astype(cdt), w2.astype(cdt), pc, b1c)
    return out[:, :, :s]
