#!/usr/bin/env python
"""Round-5 component decomposition at IDOL eval shapes (480x864, T=10).

Chained-scan timing. Components, innermost first:
  1. bare v9 cm_fused kernel (raw offsets + logits, in-kernel sched/softmax)
  2. the three input projections alone (value/offsets/attn, channel-major)
  3. output projection alone
  4. MSDAModule channel-major (= 1 + 2 + 3 + glue)
  5. EncoderLayer channel-major (= 4 + fused epilogue)
  6. x6 encoder stack
Run: python tools/profile_r5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from vnext_tpu.models.deformable_transformer import (
    EncoderLayer,
    MSDeformAttnModule,
    encoder_reference_points,
)
from vnext_tpu.models.layers import DualDense
from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9_cm_fused

T = 10
SHAPES = ((60, 108), (30, 54), (15, 27), (8, 14))
C, M, P = 256, 8, 4
L = len(SHAPES)
S = sum(h * w for h, w in SHAPES)
D = C // M
N = int(os.environ.get("REPS", "8"))


def chained(make_fn, x0, name):
    @jax.jit
    def run(x):
        def body(carry, _):
            out = make_fn(carry)
            fb = (jnp.sum(out.astype(jnp.float32)) * 1e-9).astype(carry.dtype)
            return carry + fb, jnp.sum(out).astype(jnp.float32)

        final, ss = jax.lax.scan(body, x, None, length=N)
        return jnp.sum(ss)

    t0 = time.time()
    float(run(x0))
    ct = time.time() - t0
    ts = []
    for _ in range(2):
        t0 = time.time()
        float(run(x0))
        ts.append(time.time() - t0)
    per = min(ts) / N * 1000
    print(f"{name:46s} {per:8.2f} ms/iter (compile {ct:.0f}s)", flush=True)
    return per


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    srcT = jnp.asarray(rng.randn(T, C, S), dt)
    posT = jnp.asarray(rng.randn(T, C, S), dt)
    vr = jnp.ones((T, L, 2), jnp.float32)
    ref = encoder_reference_points(SHAPES, vr)          # [T, S, L, 2]
    refT = jnp.transpose(ref, (0, 2, 3, 1))             # [T, L, 2, S]
    mask = jnp.zeros((T, S), bool)

    # 1. bare kernel: raw bf16 offsets + logits
    valT = jnp.asarray(rng.randn(T, C, S), dt)
    off = jnp.asarray(rng.randn(T, M, L, P, 2, S) * 2.0, dt)
    logits = jnp.asarray(rng.randn(T, M, L, P, S), dt)

    chained(
        lambda x: ms_deform_attn_pallas_v9_cm_fused(
            x, SHAPES, off, refT, logits, attn_is_logits=True
        ),
        valT,
        "v9 cm_fused kernel (logits, ksched)",
    )
    os.environ["VNEXT_MSDA_KSCHED"] = "0"
    chained(
        lambda x: ms_deform_attn_pallas_v9_cm_fused(
            x, SHAPES, off, refT, logits, attn_is_logits=True
        ),
        valT,
        "v9 cm_fused kernel (logits, host sched)",
    )
    os.environ["VNEXT_MSDA_KSCHED"] = "1"

    # 2. the three projections (value + offsets + attn), channel-major
    vp = DualDense(C, dtype=dt)
    op = DualDense(M * L * P * 2, dtype=dt)
    ap = DualDense(M * L * P, dtype=dt)
    pv = vp.init(jax.random.PRNGKey(0), srcT, True)
    po = op.init(jax.random.PRNGKey(1), srcT, True)
    pa = ap.init(jax.random.PRNGKey(2), srcT, True)

    def projs(x):
        a = vp.apply(pv, x, True)
        b = op.apply(po, x, True)
        c = ap.apply(pa, x, True)
        return jnp.stack([jnp.sum(a), jnp.sum(b), jnp.sum(c)])

    chained(projs, srcT, "3 input projections (cm)")

    def outproj(x):
        return vp.apply(pv, x, True)

    chained(outproj, srcT, "1 projection 256x256 (cm)")

    # 4. MSDA module cm
    mod = MSDeformAttnModule(d_model=C, n_levels=L, n_heads=M, n_points=P, dtype=dt)
    mparams = mod.init(jax.random.PRNGKey(0), srcT, refT, srcT, SHAPES, mask,
                       channel_major=True)
    chained(
        lambda x: mod.apply(mparams, x, refT, x, SHAPES, mask, channel_major=True),
        srcT,
        "MSDAModule channel-major",
    )

    # 5. single encoder layer cm
    layer = EncoderLayer(d_model=C, d_ffn=1024, n_levels=L, n_heads=M,
                         n_points=P, dtype=dt)
    params = layer.init({"params": jax.random.PRNGKey(0)}, srcT, posT, refT,
                        SHAPES, mask, False, channel_major=True)
    chained(
        lambda x: layer.apply(params, x, posT, refT, SHAPES, mask, False,
                              channel_major=True),
        srcT,
        "EncoderLayer channel-major",
    )


if __name__ == "__main__":
    main()
