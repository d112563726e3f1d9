#!/usr/bin/env python
"""Ground-truth TPU timing via chained dependencies.

Each iteration's input depends on the previous iteration's output, and the final
scalar is fetched to host — so wall time must include all real device compute,
regardless of async dispatch semantics. Varying iteration count separates fixed
overhead from marginal per-iteration cost.
"""

import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.models import IDOL
from vnext_tpu.models.idol import build_idol_model
from vnext_tpu.config import get_cfg, add_idol_config

T, H, W = 10, 480, 864


def main():
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.MODEL.IDOL.NUM_CLASSES = 40
    model = build_idol_model(cfg)

    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(T, H, W, 3), jnp.float32)
    sizes = jnp.asarray([[H, W - 11]] * T, jnp.int32)

    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1], method=IDOL.inference
        )["params"]
    )()
    jax.block_until_ready(params)
    print("init done", flush=True)

    @jax.jit
    def chained(frames, sizes, n):
        def body(carry, _):
            f = carry
            out = model.apply({"params": params}, f, sizes, method=IDOL.inference)
            # tiny scalar feedback forces each step to complete before the next
            feedback = jnp.mean(out["pred_logits"]) * 1e-12
            return f + feedback, jnp.max(out["pred_logits"])

        final, scores = jax.lax.scan(body, frames, None, length=n)
        return jnp.sum(scores)

    for n in (1, 2):
        f = jax.jit(lambda fr, sz: chained(fr, sz, n))
        t0 = time.time()
        r = float(f(frames, sizes))  # float() forces full completion + fetch
        compile_and_run = time.time() - t0
        t0 = time.time()
        r = float(f(frames, sizes))
        run1 = time.time() - t0
        t0 = time.time()
        r = float(f(frames, sizes))
        run2 = time.time() - t0
        print(f"n={n}: compile+run={compile_and_run:.2f}s run={run1*1000:.0f}/{run2*1000:.0f} ms", flush=True)

    # marginal cost per clip = (t(n=2) - t(n=1))
    print("marginal per-clip ms =", flush=True)


if __name__ == "__main__":
    main()
