"""v7 level-fused manual-DMA MSDA kernel vs the jnp oracle (interpret mode).

Reference semantics: projects/IDOL/idol/models/ops — bilinear zero-padding
grid_sample sampling (ms_deform_im2col_cuda.cuh:34), validated here against
ms_deform_attn_core_jnp exactly like the reference validates CUDA vs
grid_sample (idol/models/ops/test.py:32).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
from vnext_tpu.ops.attic.ms_deform_attn_pallas_v7 import ms_deform_attn_pallas_v7

SHAPES = ((12, 16), (6, 8), (3, 4), (2, 2))
S = sum(h * w for h, w in SHAPES)
B, M, D, L, P, Q = 2, 2, 8, 4, 2, 50


def _inputs(seed, loc_mode="uniform"):
    rng = np.random.RandomState(seed)
    val = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    if loc_mode == "oob":
        # out-of-range samples must reproduce grid_sample zero padding
        loc = jnp.asarray(rng.rand(B, Q, M, L, P, 2) * 3.0 - 1.0, jnp.float32)
    else:
        loc = jnp.asarray(rng.rand(B, Q, M, L, P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, Q, M, L, P) / (L * P), jnp.float32)
    return val, loc, w


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("loc_mode", ["uniform", "oob"])
def test_v7_matches_oracle(seed, loc_mode):
    val, loc, w = _inputs(seed, loc_mode)
    ref = ms_deform_attn_core_jnp(val, SHAPES, loc, w)
    out = ms_deform_attn_pallas_v7(val, SHAPES, loc, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_v7_grads_match_oracle():
    val, loc, w = _inputs(1)

    def loss_ref(v, l, a):
        return jnp.sum(ms_deform_attn_core_jnp(v, SHAPES, l, a) ** 2)

    def loss_v7(v, l, a):
        return jnp.sum(ms_deform_attn_pallas_v7(v, SHAPES, l, a) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(val, loc, w)
    g_v7 = jax.grad(loss_v7, argnums=(0, 1, 2))(val, loc, w)
    for a, b in zip(g_ref, g_v7):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
