#!/usr/bin/env python
"""Fine-grained timing of the IDOL features stage (proj/pos/flatten).

The round-5 in-model decomposition puts backbone->encoder-input at ~19.6 ms
true (backbone 11.3 + proj/pos 8.3) while the roofline for the projections
(~31 GF) + pos embeddings (~45 MB of sin/cos) + relayouts (~350 MB) is ~1.5 ms
— this isolates where the factor-of-5 goes.

Chained-scan methodology (profile_components.py): each stage is cumulative
from the backbone features; stage DIFFERENCES cancel the fixed scalar-pull RPC.
Run: python tools/profile_feats.py
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

from vnext_tpu.config import add_idol_config, get_cfg
from vnext_tpu.models.idol import build_idol_model
from vnext_tpu.models.position_encoding import sine_position_embedding

T, H, W = 10, 480, 864
REPS = int(os.environ.get("REPS", "8"))


def main():
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg)

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    # backbone outputs at eval shapes
    base = [
        jnp.asarray(rng.randn(T, 60, 108, 512), dt),
        jnp.asarray(rng.randn(T, 30, 54, 1024), dt),
        jnp.asarray(rng.randn(T, 15, 27, 2048), dt),
    ]
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        base[0][:1],
        sizes[:1],
        method=lambda m, x, s: m.project_features(
            [base[0][:1], base[1][:1], base[2][:1]], s
        ),
    )
    params = variables["params"]

    def stage_fn(stage):
        def run(m, x0):
            b = [x0, base[1], base[2]]
            if stage == "proj_convs":
                outs = []
                for lvl in range(4):
                    src = b[lvl] if lvl < 3 else outs[-1]
                    outs.append(m.input_proj[lvl](src))
                return outs[0]
            if stage == "proj+pos":
                srcs, vhw, poses = m.project_features(b, sizes)
                return srcs[0] + poses[0]
            if stage == "encode_prep":
                # everything encode() does before the first layer: flatten,
                # level embed, masks, valid ratios, ref points, CM transpose
                srcs, vhw, poses = m.project_features(b, sizes)
                import vnext_tpu.models.deformable_transformer as dtr

                tr = m.transformer
                spatial_shapes = tuple(
                    (int(s.shape[1]), int(s.shape[2])) for s in srcs
                )
                bsz = srcs[0].shape[0]
                c = tr.d_model
                src_flat, pos_flat = [], []
                for lvl, (src, pos) in enumerate(zip(srcs, poses)):
                    h, w = spatial_shapes[lvl]
                    src_flat.append(src.reshape(bsz, h * w, c))
                    pos_flat.append(
                        pos.reshape(bsz, h * w, c)
                        + tr.level_embed[lvl][None, None].astype(pos.dtype)
                    )
                src_flat = jnp.concatenate(src_flat, 1)
                pos_flat = jnp.concatenate(pos_flat, 1)
                memT = jnp.swapaxes(src_flat, 1, 2)
                posT = jnp.swapaxes(pos_flat, 1, 2)
                return memT + posT
            if stage == "encode_1layer":
                srcs, vhw, poses = m.project_features(b, sizes)
                old = os.environ.get("VNEXT_ENC_LAYERS")
                memory, *_ = m.transformer.encode(srcs, vhw, poses)
                return memory
            raise ValueError(stage)

        return run

    def chained(stage):
        fn = stage_fn(stage)

        @jax.jit
        def run(x):
            def body(carry, _):
                out = model.apply({"params": params}, carry, method=fn)
                fb = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
                return carry + fb, jnp.sum(out).astype(jnp.float32)

            final, s = jax.lax.scan(body, x, None, length=REPS)
            return jnp.sum(s)

        t0 = time.time()
        float(run(base[0]))
        ct = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            float(run(base[0]))
            ts.append(time.time() - t0)
        ms = min(ts) / REPS * 1000
        print(f"{stage:16s} {ms:9.2f} ms (compile {ct:.0f}s)", flush=True)
        return ms

    # standalone micro-stages (not chained off the model)
    def micro(name, f, x0):
        @jax.jit
        def run(x):
            def body(carry, _):
                out = f(carry)
                fb = (jnp.sum(out.astype(jnp.float32)) * 1e-12).astype(carry.dtype)
                return carry + fb, jnp.sum(out).astype(jnp.float32)

            final, s = jax.lax.scan(body, x, None, length=REPS)
            return jnp.sum(s)

        t0 = time.time()
        float(run(x0))
        ct = time.time() - t0
        ts = []
        for _ in range(2):
            t0 = time.time()
            float(run(x0))
            ts.append(time.time() - t0)
        ms = min(ts) / REPS * 1000
        print(f"{name:16s} {ms:9.2f} ms (compile {ct:.0f}s)", flush=True)
        return ms

    def pos_only(x):
        outs = []
        for lvl, (h, w) in enumerate(((60, 108), (30, 54), (15, 27), (8, 14))):
            vhw = jnp.minimum(
                -(-sizes // (8 * 2 ** lvl)), jnp.asarray([h, w], jnp.int32)
            )
            outs.append(
                sine_position_embedding(vhw, h, w, num_pos_feats=128).astype(dt)
            )
        return outs[0] + x[:, :60, :108, :256]

    micro("pos_embed_only", pos_only, base[0])
    for st in ("proj_convs", "proj+pos", "encode_prep"):
        chained(st)


if __name__ == "__main__":
    main()
