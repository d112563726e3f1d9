"""Pallas MSDeformAttn kernel vs the jnp oracle (interpret mode on CPU).

Mirrors the reference's CUDA-vs-grid_sample validation (idol/models/ops/test.py:32),
including gradient checks through the custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
from vnext_tpu.ops.ms_deform_attn_pallas import ms_deform_attn_pallas


def _inputs(seed=0, B=2, M=2, D=8, Q=18, P=3, shapes=((6, 9), (4, 5), (2, 3))):
    rng = np.random.RandomState(seed)
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    loc = rng.rand(B, Q, M, L, P, 2).astype(np.float32) * 1.3 - 0.15  # incl. OOB
    attn = rng.rand(B, Q, M, L, P).astype(np.float32) + 1e-4
    attn /= attn.reshape(B, Q, M, -1).sum(-1, keepdims=True).reshape(B, Q, M, 1, 1)
    return (jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn))


def test_pallas_matches_jnp_core():
    value, shapes, loc, attn = _inputs()
    ref = ms_deform_attn_core_jnp(value, shapes, loc, attn)
    out = ms_deform_attn_pallas(value, shapes, loc, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_pallas_exact_grid_points():
    """Sampling exactly at pixel centers must return the pixel value."""
    shapes = ((4, 6),)
    B, M, D, Q, P = 1, 1, 4, 3, 1
    value = jnp.asarray(np.random.RandomState(1).randn(1, 24, 1, 4), jnp.float32)
    # pixel (y=1, x=2): normalized loc = ((x+0.5)/W, (y+0.5)/H)
    loc = jnp.asarray([[[ [[(2.5 / 6, 1.5 / 4)]] ], [[[ (0.5 / 6, 0.5 / 4) ]]], [[[ (5.5 / 6, 3.5 / 4) ]]]]], jnp.float32)
    attn = jnp.ones((1, 3, 1, 1, 1), jnp.float32)
    out = np.asarray(ms_deform_attn_pallas(value, shapes, loc, attn))
    grid = np.asarray(value).reshape(4, 6, 4)
    np.testing.assert_allclose(out[0, 0, :4], grid[1, 2], rtol=1e-5)
    np.testing.assert_allclose(out[0, 1, :4], grid[0, 0], rtol=1e-5)
    np.testing.assert_allclose(out[0, 2, :4], grid[3, 5], rtol=1e-5)


def test_pallas_out_of_bounds_zero():
    shapes = ((4, 4),)
    value = jnp.ones((1, 16, 1, 4), jnp.float32)
    loc = jnp.asarray([[[[[(-0.5, -0.5)]]], [[[(1.4, 0.5)]]]]], jnp.float32)  # far outside
    attn = jnp.ones((1, 2, 1, 1, 1), jnp.float32)
    out = np.asarray(ms_deform_attn_pallas(value, shapes, loc, attn))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_pallas_vjp_matches_jnp():
    value, shapes, loc, attn = _inputs(seed=3, B=1, M=2, D=4, Q=7, P=2)

    def f_pallas(v, l, a):
        return jnp.sum(ms_deform_attn_pallas(v, shapes, l, a) ** 2)

    def f_ref(v, l, a):
        return jnp.sum(ms_deform_attn_core_jnp(v, shapes, l, a) ** 2)

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(value, loc, attn)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(value, loc, attn)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_pallas_larger_shapes():
    value, shapes, loc, attn = _inputs(
        seed=4, B=1, M=4, D=16, Q=200, P=4, shapes=((12, 20), (6, 10), (3, 5))
    )
    ref = ms_deform_attn_core_jnp(value, shapes, loc, attn)
    out = ms_deform_attn_pallas(value, shapes, loc, attn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
