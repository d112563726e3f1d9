"""Pallas TPU fused ResNet stem: 7x7/s2 conv (C_in=3) + frozen-BN + ReLU.

Capability parity with the reference stem (detectron2/modeling/backbone/
resnet.py:356 BasicStem: Conv2d(3, 64, 7, stride=2, padding=3) + FrozenBN +
relu), rebuilt for the TPU's layout physics instead of translated.

Why a kernel at all: XLA lowers the C_in=3 conv by padding channels to 128
lanes, so the im2col reduction executes 49*128 = 6272 terms per output pixel
where only 147 are real — measured 3.7 ms isolated / ~8 ms in-model at IDOL
eval shapes ([10,480,864,3]), ~3% MXU. The space-to-depth rewrite fixes the
FLOPs but pays ~5 ms for the minor-dim-3 relayout (round-3/4 on-device data,
docs/ROUND4.md), so it loses too.

The TPU-first formulation used here:

1. *W-phase split, done where it's free.* ``pad(x)[B,Hp,Wp,3] ->
   reshape[B,Hp,U,6]`` is flat-order-preserving (no transpose), and the
   following ``transpose(0,3,1,2)`` moves only the tiny 6-dim to a major
   position, leaving U in lanes — XLA does this at ~0.3 ms, unlike the
   s2d shuffle. Result: ``xps[b, 3p+c, i, u] = xpad[b, i, 2u+p, c]``.
2. *Banded patch matrix from one aligned window read.* Each grid step owns
   TH=8 output rows; it reads the [6, 2*TH+16, UL] input window starting at
   sublane ``16*t`` (provably 8-aligned — Mosaic rejects the naive per-row
   ``pl.ds(2*ho, 16)`` ref slice because ``2*ho`` is odd-aligned). Per
   output row ``ho = 8t+i`` and tap column ``kx`` (phase p = kx&1, shift
   dx = (kx-p)//2) the needed ``[3, 16, WO]`` slab ``window[3p:3p+3,
   2i:2i+16, dx:dx+WO]`` is a *value* slice: Mosaic lowers it to in-register
   sublane/lane shifts, not unaligned loads. ky is padded 7->16 = the bf16
   sublane tile, so the [3,16]->[48] merge is layout-free. Seven slabs
   concatenate into the patch matrix P [336, WO]; rows with ky>=7 carry
   image data but multiply zero weight rows, so no masking is needed.
3. *One MXU dot per conv row*: ``P^T @ W2`` with W2 [336, 64] the 7x7x3x64
   kernel re-indexed as ``W2[kx*48 + c*16 + ky] = K[ky, kx, c]`` — 147 real
   reduction terms executed as 336 (2.3x padding vs XLA's 42.7x).
4. Frozen-BN scale/bias and ReLU run on the f32 accumulator in VMEM; the
   only HBM write is the final [B, HO, WO, 64] activation.

Validated against the jnp/XLA oracle (``stem_conv_reference``) to bf16
rounding; see tests/test_stem_conv.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_KY_PAD = 16  # bf16 sublane tile: makes the [3, ky] -> [3*ky] merge free


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def stem_conv_reference(x: Array, k_hwio: Array, scale: Array, bias: Array) -> Array:
    """XLA oracle: conv7x7/s2(pad 3) + y*scale+bias + relu, bf16 output."""
    y = jax.lax.conv_general_dilated(
        x.astype(k_hwio.dtype), k_hwio, window_strides=(2, 2),
        padding=[(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y * scale[None, None, None, :] + bias[None, None, None, :]
    return jnp.maximum(y, 0.0).astype(jnp.bfloat16)


def _prep_xps(x: Array, hpp: int, ul: int) -> Array:
    """NHWC [B,H,W,3] -> phase-split [B, 6, hpp, ul] bf16 (ch = 3p + c)."""
    b, h, w, _ = x.shape
    u = (w + 6) // 2
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (3, 3), (3, 3), (0, 0)))
    xp = xp.reshape(b, h + 6, u, 6)            # flat-order preserving
    xp = jnp.transpose(xp, (0, 3, 1, 2))       # [B, 6, h+6, u]
    return jnp.pad(xp, ((0, 0), (0, 0), (0, hpp - (h + 6)), (0, ul - u)))


def _prep_w2(k_hwio: Array) -> Array:
    """[7,7,3,64] -> [336, Cout]: W2[kx*48 + c*16 + ky] = K[ky, kx, c]."""
    co = k_hwio.shape[-1]
    kt = jnp.transpose(k_hwio.astype(jnp.bfloat16), (1, 2, 0, 3))  # [kx,c,ky,co]
    kt = jnp.pad(kt, ((0, 0), (0, 0), (0, _KY_PAD - 7), (0, 0)))
    return kt.reshape(7 * 3 * _KY_PAD, co)


def _stem_kernel(xps_ref, w_ref, sb_ref, out_ref, *, TH, WO, CO):
    t = pl.program_id(1)
    r0 = pl.multiple_of(2 * TH * t, 2 * TH)
    window = xps_ref[0, :, pl.ds(r0, 2 * TH + _KY_PAD), :]  # [6, 2TH+16, UL]
    for i in range(TH):
        # group taps by dx so concatenated slabs share one lane offset
        # (Mosaic can't concat values with mismatched lane offsets)
        acc = None
        for dx in range(4):
            parts = []
            for kx in (2 * dx, 2 * dx + 1):
                if kx > 6:
                    continue
                p = kx & 1
                slab = window[
                    3 * p : 3 * p + 3, 2 * i : 2 * i + _KY_PAD, dx : dx + WO
                ]
                parts.append(slab.reshape(3 * _KY_PAD, WO))
            pm = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
            r0w = 2 * dx * 3 * _KY_PAD
            d = jax.lax.dot_general(
                pm, w_ref[r0w : r0w + pm.shape[0], :], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                               # [WO, CO]
            acc = d if acc is None else acc + d
        acc = acc * sb_ref[0:1, :] + sb_ref[1:2, :]
        out_ref[0, i] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def stem_conv7x7s2_bn_relu(
    x: Array, k_hwio: Array, scale: Array, bias: Array, interpret: bool = False
) -> Array:
    """Fused stem on TPU via Pallas. x [B,H,W,3] (any float dtype), H,W even.

    Returns relu(conv7x7/s2(x, k) * scale + bias) as bf16 [B, H/2, W/2, 64].
    Differentiable: the VJP linearizes the XLA oracle (stem_conv_reference)
    at the same primal point — the kernel is forward-only, and XLA's conv
    transpose is already the right tool for the backward (the C_in=3 lane
    padding that motivates the forward kernel does not afflict dK/dX, whose
    contractions run over the 64-channel output). Training with FREEZE_AT>=1
    (the reference default) DCEs the backward entirely.
    """
    return _stem_impl(x, k_hwio, scale, bias, interpret)


def _stem_fwd(x, k_hwio, scale, bias, interpret):
    return _stem_impl(x, k_hwio, scale, bias, interpret), (x, k_hwio, scale, bias)


def _stem_ref_f32(x: Array, k_hwio: Array, scale: Array, bias: Array) -> Array:
    """Oracle with an f32 conv: same math as stem_conv_reference up to bf16
    rounding of the multiplies; used as the VJP linearization point (XLA's
    conv transpose rejects the mixed bf16-in/f32-out conv)."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k_hwio.astype(jnp.float32), window_strides=(2, 2),
        padding=[(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale[None, None, None, :].astype(jnp.float32) + bias[
        None, None, None, :
    ].astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(jnp.bfloat16)


def _stem_bwd(interpret, residuals, g):
    x, k_hwio, scale, bias = residuals
    _, vjp = jax.vjp(_stem_ref_f32, x, k_hwio, scale, bias)
    return vjp(g)


stem_conv7x7s2_bn_relu.defvjp(_stem_fwd, _stem_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_impl(
    x: Array, k_hwio: Array, scale: Array, bias: Array, interpret: bool = False
) -> Array:
    b, h, w, cin = x.shape
    assert cin == 3 and h % 2 == 0 and w % 2 == 0, (b, h, w, cin)
    co = k_hwio.shape[-1]
    ho, wo = h // 2, w // 2

    th = 8  # output rows per grid step; 2*th is sublane-tile aligned
    hop = _round_up(ho, th)
    n_tiles = hop // th
    # last tile's window reads rows [2*th*(n_tiles-1), ... + 2*th+_KY_PAD)
    hpp = _round_up(2 * th * n_tiles + _KY_PAD, 8)
    ul = _round_up(w // 2 + 3, 128)
    xps = _prep_xps(x, hpp, ul)
    w2 = _prep_w2(k_hwio)
    sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])  # [2, CO]

    kernel = functools.partial(_stem_kernel, TH=th, WO=wo, CO=co)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 6, hpp, ul), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((7 * 3 * _KY_PAD, co), lambda b_, t: (0, 0)),
            pl.BlockSpec((2, co), lambda b_, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wo, co), lambda b_, t: (b_, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hop, wo, co), jnp.bfloat16),
        interpret=interpret,
    )(xps, w2, sb)
    return out if hop == ho else out[:, :ho]
