"""v8 point-group + lane-packed MSDA kernel vs the jnp oracle (interpret mode).

Reference semantics: projects/IDOL/idol/models/ops — bilinear zero-padding
grid_sample sampling (ms_deform_im2col_cuda.cuh:34), validated against
ms_deform_attn_core_jnp exactly like the reference validates CUDA vs
grid_sample (idol/models/ops/test.py:32).

Covers both kernel paths: lane-packed resident levels (w <= 62) and
point-group chunked levels (wide levels), plus OOB sampling, fringe
coordinates, group-size variants, and gradients (shared v6 backward).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
from vnext_tpu.ops.attic.ms_deform_attn_pallas_v8 import ms_deform_attn_pallas_v8

# all four levels lane-packable (w <= 62)
SHAPES_SMALL = ((12, 16), (6, 8), (3, 4), (2, 2))
# first two levels wide -> point-group chunked; last two packed
SHAPES_MIXED = ((18, 150), (9, 75), (5, 38), (3, 19))

B, M, D, P = 2, 2, 8, 2


def _inputs(seed, shapes, q, loc_mode="uniform"):
    rng = np.random.RandomState(seed)
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    val = jnp.asarray(rng.randn(B, s, M, D), jnp.float32)
    if loc_mode == "oob":
        loc = jnp.asarray(rng.rand(B, q, M, l, P, 2) * 3.0 - 1.0, jnp.float32)
    elif loc_mode == "local":
        # concentrated offsets (the encoder regime the schedule exploits)
        base = rng.rand(B, q, 1, 1, 1, 2)
        loc = jnp.asarray(
            np.clip(base + rng.randn(B, q, M, l, P, 2) * 0.02, 0, 1), jnp.float32
        )
    else:
        loc = jnp.asarray(rng.rand(B, q, M, l, P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, q, M, l, P) / (l * P), jnp.float32)
    return val, loc, w


@pytest.mark.parametrize("shapes", [SHAPES_SMALL, SHAPES_MIXED])
@pytest.mark.parametrize("loc_mode", ["uniform", "oob", "local"])
def test_v8_matches_oracle(shapes, loc_mode):
    val, loc, w = _inputs(0, shapes, 50, loc_mode)
    ref = ms_deform_attn_core_jnp(val, shapes, loc, w)
    out = ms_deform_attn_pallas_v8(val, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("gsz", ["1", "2"])
def test_v8_group_sizes(gsz, monkeypatch):
    monkeypatch.setenv("VNEXT_MSDA_V8_GSZ", gsz)
    val, loc, w = _inputs(2, SHAPES_MIXED, 300)
    ref = ms_deform_attn_core_jnp(val, SHAPES_MIXED, loc, w)
    out = ms_deform_attn_pallas_v8(val, SHAPES_MIXED, loc, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_v8_fringe_and_integer_coords():
    """Exact corner hits, fringe (-1,0) coords, and edge rows/cols."""
    shapes = ((10, 70), (4, 9))
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(7)
    val = jnp.asarray(rng.randn(B, s, M, D), jnp.float32)
    q = 16
    # pixel-space targets incl. exact integers, -0.49 fringe, h-0.5 edge
    picks = np.array([-0.49, 0.0, 0.5, 1.0, 3.49, 8.5, 9.0, 9.49])
    loc = np.zeros((B, q, M, 2, P, 2), np.float32)
    for l, (h, w) in enumerate(shapes):
        px = rng.choice(picks, (B, q, M, P))
        py = rng.choice(picks, (B, q, M, P))
        loc[..., l, :, 0] = (np.clip(px, -0.49, w - 0.51) + 0.5) / w
        loc[..., l, :, 1] = (np.clip(py, -0.49, h - 0.51) + 0.5) / h
    loc = jnp.asarray(loc)
    w_ = jnp.asarray(rng.rand(B, q, M, 2, P) / (2 * P), jnp.float32)
    ref = ms_deform_attn_core_jnp(val, shapes, loc, w_)
    out = ms_deform_attn_pallas_v8(val, shapes, loc, w_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_v8_grads_match_oracle():
    val, loc, w = _inputs(1, SHAPES_MIXED, 50)

    def loss_ref(v, l, a):
        return jnp.sum(ms_deform_attn_core_jnp(v, SHAPES_MIXED, l, a) ** 2)

    def loss_v8(v, l, a):
        return jnp.sum(ms_deform_attn_pallas_v8(v, SHAPES_MIXED, l, a) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(val, loc, w)
    g_v8 = jax.grad(loss_v8, argnums=(0, 1, 2))(val, loc, w)
    for a, b in zip(g_ref, g_v8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_sort_queries_by_row_is_exact():
    """The decoder sort-by-row preprocessing + inverse gather is a no-op on
    the MSDA result (permutation invariance per query)."""
    from vnext_tpu.ops.ms_deform_attn import sort_queries_by_row

    val, loc, w = _inputs(4, SHAPES_MIXED, 37)
    ref = ms_deform_attn_core_jnp(val, SHAPES_MIXED, loc, w)
    loc_s, w_s, inv = sort_queries_by_row(loc, w)
    out_s = ms_deform_attn_core_jnp(val, SHAPES_MIXED, loc_s, w_s)
    out = jnp.take_along_axis(out_s, inv[:, :, None], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
