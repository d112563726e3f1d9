"""v9-machinery MSDA backward kernel vs jax.grad of the jnp oracle.

Reference gradient semantics: ms_deform_im2col_cuda.cuh:238-302 (corner-based
bilinear subgradients, zero-padding drops out-of-bounds corner grads). The
oracle (ms_deform_attn_core_jnp) autodiffs to exactly that convention, so
grad-vs-oracle equality here is the same falsifiable scheme the reference
uses for its CUDA backward (idol/models/ops/test.py:56 gradcheck).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9

SHAPES_MIXED = ((18, 150), (9, 75), (5, 38), (3, 19))
B, M, D, P = 2, 2, 8, 2


def _inputs(seed, shapes, q, loc_mode="uniform"):
    rng = np.random.RandomState(seed)
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    val = jnp.asarray(rng.randn(B, s, M, D), jnp.float32)
    if loc_mode == "oob":
        loc = jnp.asarray(rng.rand(B, q, M, l, P, 2) * 3.0 - 1.0, jnp.float32)
    elif loc_mode == "integer":
        # pixel coords exactly on integers: x_norm = (k + 0.5) / W. The
        # corner-based subgradient convention (reference CUDA + oracle) and
        # the tent-sign convention DIFFER here, and standard init lands
        # exactly on integers (reference points are grid centres) — this
        # case pins the convention.
        loc = np.empty((B, q, M, l, P, 2), np.float32)
        for li, (h, w) in enumerate(shapes):
            kx = rng.randint(0, w, size=(B, q, M, P))
            ky = rng.randint(0, h, size=(B, q, M, P))
            loc[:, :, :, li, :, 0] = (kx + 0.5) / w
            loc[:, :, :, li, :, 1] = (ky + 0.5) / h
        loc = jnp.asarray(loc)
    else:
        loc = jnp.asarray(rng.rand(B, q, M, l, P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, q, M, l, P) / (l * P), jnp.float32)
    cot = jnp.asarray(rng.randn(B, q, M * D), jnp.float32)
    return val, loc, w, cot


def _grads(fn, shapes, val, loc, w, cot):
    def loss(v, lo, a):
        return jnp.sum(fn(v, shapes, lo, a) * cot)

    return jax.grad(loss, argnums=(0, 1, 2))(val, loc, w)


@pytest.mark.parametrize("loc_mode", ["uniform", "oob", "integer", "local"])
def test_v9_bwd_matches_oracle_grads(loc_mode):
    if loc_mode == "local":
        rng = np.random.RandomState(7)
        val, loc, w, cot = _inputs(7, SHAPES_MIXED, 50)
        base = rng.rand(B, 50, 1, 1, 1, 2)
        loc = jnp.asarray(
            np.clip(base + rng.randn(B, 50, M, len(SHAPES_MIXED), P, 2) * 0.02, 0, 1),
            jnp.float32,
        )
    else:
        val, loc, w, cot = _inputs(3, SHAPES_MIXED, 50, loc_mode)

    dv_r, dl_r, dw_r = _grads(ms_deform_attn_core_jnp, SHAPES_MIXED, val, loc, w, cot)
    dv_k, dl_k, dw_k = _grads(ms_deform_attn_pallas_v9, SHAPES_MIXED, val, loc, w, cot)

    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dl_k), np.asarray(dl_r), atol=2e-3)


def test_v9_bwd_matches_v6_bwd(monkeypatch):
    """Cross-implementation: the v9 fused backward == the v6 blocked pair."""
    val, loc, w, cot = _inputs(11, SHAPES_MIXED, 64, "uniform")
    monkeypatch.setenv("VNEXT_MSDA_BWD", "v9")
    g9 = _grads(ms_deform_attn_pallas_v9, SHAPES_MIXED, val, loc, w, cot)
    monkeypatch.setenv("VNEXT_MSDA_BWD", "v6")
    g6 = _grads(ms_deform_attn_pallas_v9, SHAPES_MIXED, val, loc, w, cot)
    for a, b in zip(g9, g6):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_v9_bwd_vmem_guard_falls_back(monkeypatch):
    """Over-budget planes route to the v6 backward (and still match the oracle)."""
    shapes = ((24, 80), (12, 40))
    val, loc, w, cot = _inputs(5, shapes, 32, "uniform")
    monkeypatch.setenv("VNEXT_MSDA_BWD", "v9")
    monkeypatch.setenv("VNEXT_MSDA_BWD_VMEM_MB", "0.05")  # force the fallback
    dv_r, dl_r, dw_r = _grads(ms_deform_attn_core_jnp, shapes, val, loc, w, cot)
    dv_k, dl_k, dw_k = _grads(ms_deform_attn_pallas_v9, shapes, val, loc, w, cot)
    np.testing.assert_allclose(np.asarray(dv_k), np.asarray(dv_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_r), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dl_k), np.asarray(dl_r), atol=2e-3)
