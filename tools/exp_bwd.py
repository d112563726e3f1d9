#!/usr/bin/env python
"""On-device A/B: v9-machinery MSDA backward vs the v6 blocked pair.

Train shapes (IDOL ytvis19 quick step): 8 images 512x640 -> levels
(64,80),(32,40),(16,20),(8,10), S=6800, M=8, D=32, P=4, encoder self-attn
Q=S. Times jax.grad of the full custom-vjp op (fwd+bwd) under each backward,
checks v9-vs-v6 gradient agreement at bf16 train dtype, and oracle-exactness
at a small f32 shape.
"""
import os
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

# exact f32 matmuls for the oracle-exactness check (TPU DEFAULT precision
# truncates f32 dots to bf16 passes, inflating the diff to ~3e-4 relative)
jax.config.update("jax_default_matmul_precision", "float32")

SHAPES = ((64, 80), (32, 40), (16, 20), (8, 10))
S = sum(h * w for h, w in SHAPES)
B, M, D, P = 8, 8, 32, 4
L = len(SHAPES)

rng = np.random.RandomState(0)
val = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
if os.environ.get("EXP_BWD_LOC", "local") == "local":
    # realistic (trained-model) locality: offsets within a few pixels of the
    # per-query reference point, like the reference's init and training stats
    base = np.concatenate(
        [
            np.stack(
                np.meshgrid(
                    (np.arange(w) + 0.5) / w, (np.arange(h) + 0.5) / h
                ),
                -1,
            ).reshape(h * w, 2)
            for h, w in SHAPES
        ],
        0,
    )  # [S, 2]
    off = rng.randn(B, S, M, L, P, 2) * 0.02
    loc = jnp.asarray(
        np.clip(base[None, :, None, None, None] + off, 0, 1), jnp.float32
    )
else:
    loc = jnp.asarray(rng.rand(B, S, M, L, P, 2), jnp.float32)
att = jnp.asarray(rng.rand(B, S, M, L, P) / (L * P), jnp.bfloat16)
cot = jnp.asarray(rng.randn(B, S, M * D), jnp.float32)


def build(bwd):
    os.environ["VNEXT_MSDA_BWD"] = bwd
    from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9

    def loss(v, lo, a):
        return jnp.sum(ms_deform_attn_pallas_v9(v, SHAPES, lo, a) * cot)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))


def timeit(name, fn, n=10):
    t0 = time.time()
    g = fn(val, loc, att)
    jax.block_until_ready(g)
    ct = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        g = fn(val, loc, att)
    jax.block_until_ready(g)
    rt = (time.time() - t0) / n * 1000
    print(f"{name}: {rt:.2f} ms fwd+bwd (compile {ct:.1f}s)", flush=True)
    return g, rt


for hb, tpp in (("4", "1"), ("8", "1"), ("4", "2"), ("8", "2")):
    if os.environ.get("EXP_BWD_SWEEP", "0") != "1" and (hb, tpp) != ("4", "1"):
        continue
    os.environ["VNEXT_MSDA_BWD_HB"] = hb
    os.environ["VNEXT_MSDA_BWD_TPP"] = tpp
    g9_fn = build("v9")
    g9, t9 = timeit(f"v9 bwd hb={hb} tpp={tpp}", g9_fn)
g6_fn = build("v6")
g6, t6 = timeit("v6 bwd", g6_fn)

for name, a, b in zip(("dval", "dloc", "dattn"), g9, g6):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    d = np.abs(a - b).max()
    print(f"{name}: maxdiff {d:.5f}  mag {np.abs(b).max():.3f}", flush=True)

# small f32 oracle exactness on TPU
from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9

sh = ((18, 30), (9, 15))
s2 = sum(h * w for h, w in sh)
v2 = jnp.asarray(rng.randn(2, s2, 2, 8), jnp.float32)
l2 = jnp.asarray(rng.rand(2, 100, 2, 2, P, 2) * 1.4 - 0.2, jnp.float32)
a2 = jnp.asarray(rng.rand(2, 100, 2, 2, P), jnp.float32)
c2 = jnp.asarray(rng.randn(2, 100, 16), jnp.float32)
os.environ["VNEXT_MSDA_BWD"] = "v9"


def loss_k(v, lo, a):
    return jnp.sum(ms_deform_attn_pallas_v9(v, sh, lo, a) * c2)


def loss_o(v, lo, a):
    return jnp.sum(ms_deform_attn_core_jnp(v, sh, lo, a) * c2)


gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))(v2, l2, a2)
go = jax.jit(jax.grad(loss_o, argnums=(0, 1, 2)))(v2, l2, a2)
for name, a, b in zip(("dval", "dloc", "dattn"), gk, go):
    d = np.abs(np.asarray(a) - np.asarray(b)).max()
    print(f"oracle {name}: maxdiff {d:.6f}", flush=True)
    assert d < 5e-3, name
print("OK", flush=True)
