"""v9 whole-level-VMEM-resident MSDA kernel vs the jnp oracle (interpret mode).

Reference semantics: projects/IDOL/idol/models/ops — bilinear zero-padding
grid_sample sampling (ms_deform_im2col_cuda.cuh:34), validated against
ms_deform_attn_core_jnp exactly like the reference validates CUDA vs
grid_sample (idol/models/ops/test.py:32).

v9 shares v8's math (point-group schedules, tent selectors, lane packing)
but delivers whole value levels as VMEM-resident BlockSpec inputs and
replaces the unrolled @pl.when chunk ladder with a dynamic-trip fori_loop;
this exercises the dynamic VMEM row slicing on both kernel paths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_core_jnp
from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9

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
def test_v9_matches_oracle(shapes, loc_mode):
    val, loc, w = _inputs(0, shapes, 50, loc_mode)
    ref = ms_deform_attn_core_jnp(val, shapes, loc, w)
    out = ms_deform_attn_pallas_v9(val, shapes, loc, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("gsz", ["1", "2"])
def test_v9_group_sizes(gsz, monkeypatch):
    monkeypatch.setenv("VNEXT_MSDA_V9_GSZ", gsz)
    val, loc, w = _inputs(2, SHAPES_MIXED, 300)
    ref = ms_deform_attn_core_jnp(val, SHAPES_MIXED, loc, w)
    out = ms_deform_attn_pallas_v9(val, SHAPES_MIXED, loc, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# winpack policy targets: (30, 54) has degenerate packing factor k=1
# (w in (42, 62]); (40, 40) packs at k=2 but hp=20 exceeds the VMEM-residency
# cap — both fall to the grouped path unless VNEXT_MSDA_V9_K1=winpack
# packs them with a windowed (hpb-row) selector matmul
SHAPES_WINPACK = ((30, 54), (40, 40), (15, 27), (8, 14))


@pytest.mark.parametrize("loc_mode", ["uniform", "oob", "local"])
def test_v9_winpack_matches_oracle(loc_mode, monkeypatch):
    monkeypatch.setenv("VNEXT_MSDA_V9_K1", "winpack")
    from vnext_tpu.ops.ms_deform_attn_pallas_v9 import _v9_config

    meta = _v9_config(SHAPES_WINPACK, P)[3]
    assert [m.packed for m in meta] == [True, True, True, True]
    assert (meta[0].k, meta[0].hp, meta[0].hpb) == (1, 30, 4)
    assert (meta[1].k, meta[1].hp, meta[1].hpb) == (2, 20, 4)
    val, loc, w = _inputs(5, SHAPES_WINPACK, 64, loc_mode)
    ref = ms_deform_attn_core_jnp(val, SHAPES_WINPACK, loc, w)
    out = ms_deform_attn_pallas_v9(val, SHAPES_WINPACK, loc, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("env", [("VNEXT_MSDA_V9_K1", "winpack"),
                                 ("VNEXT_MSDA_V9_K1HPB", "2")])
def test_v9_winpack_policy_knobs(env, monkeypatch):
    """K1=winpack enables the windowed packed path; K1HPB changes the window
    height — both stay exact on the winpack-triggering shapes."""
    if env[0] == "VNEXT_MSDA_V9_K1HPB":
        monkeypatch.setenv("VNEXT_MSDA_V9_K1", "winpack")
    monkeypatch.setenv(*env)
    val, loc, w = _inputs(6, SHAPES_WINPACK, 48, "local")
    ref = ms_deform_attn_core_jnp(val, SHAPES_WINPACK, loc, w)
    out = ms_deform_attn_pallas_v9(val, SHAPES_WINPACK, loc, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_v9_fringe_and_integer_coords():
    """Exact corner hits, fringe (-1,0) coords, and edge rows/cols."""
    shapes = ((10, 70), (4, 9))
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(7)
    val = jnp.asarray(rng.randn(B, s, M, D), jnp.float32)
    q = 16
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
    out = ms_deform_attn_pallas_v9(val, shapes, loc, w_)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_v9_grads_match_oracle():
    val, loc, w = _inputs(1, SHAPES_MIXED, 50)

    def loss_ref(v, l, a):
        return jnp.sum(ms_deform_attn_core_jnp(v, SHAPES_MIXED, l, a) ** 2)

    def loss_v9(v, l, a):
        return jnp.sum(ms_deform_attn_pallas_v9(v, SHAPES_MIXED, l, a) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(val, loc, w)
    g_v9 = jax.grad(loss_v9, argnums=(0, 1, 2))(val, loc, w)
    for a, b in zip(g_ref, g_v9):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


@pytest.mark.parametrize("shapes", [SHAPES_SMALL, SHAPES_MIXED, SHAPES_WINPACK])
def test_v9_cm_matches_standard(shapes):
    """Channel-major entry == standard entry (same kernel, no relayouts)."""
    from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9_cm

    val, loc, w = _inputs(3, shapes, 50, "local")
    ref = ms_deform_attn_pallas_v9(val, shapes, loc, w)          # [B, Q, M*D]

    b, s, m, d = val.shape
    l = len(shapes)
    valT = jnp.swapaxes(val.reshape(b, s, m * d), 1, 2)          # [B, MD, S]
    loc_cm = jnp.moveaxis(loc, 1, 5)                             # [B, M, L, P, 2, S]
    w_cm = jnp.moveaxis(w, 1, 4)                                 # [B, M, L, P, S]
    out = ms_deform_attn_pallas_v9_cm(valT, shapes, loc_cm, w_cm)
    out = jnp.swapaxes(out, 1, 2)                                # [B, Q, MD]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_cm_dispatch_fallback_matches():
    """ms_deform_attn_cm CPU fallback == oracle on transposed layouts."""
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_cm

    val, loc, w = _inputs(4, SHAPES_SMALL, 30)
    q = 30
    s = val.shape[1]
    loc = loc[:, :s]
    w_ = w[:, :s]
    ref = ms_deform_attn_core_jnp(val, SHAPES_SMALL, loc, w_)
    b, _, m, d = val.shape
    valT = jnp.swapaxes(val.reshape(b, s, m * d), 1, 2)
    out = ms_deform_attn_cm(
        valT, SHAPES_SMALL, jnp.moveaxis(loc, 1, 5), jnp.moveaxis(w_, 1, 4)
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(ref), atol=1e-5
    )


@pytest.mark.parametrize("shapes", [SHAPES_SMALL, SHAPES_MIXED, SHAPES_WINPACK])
@pytest.mark.parametrize("off_dtype", [jnp.float32, jnp.bfloat16])
def test_v9_cm_fused_matches_oracle(shapes, off_dtype):
    """Fused-loc CM entry (in-kernel ref*wh-0.5+off) == oracle on the same
    locations. Offsets are fed raw (incl. bf16, the production dtype); the
    oracle gets loc = ref + off/wh built from the SAME (widened) offsets, so
    any mismatch is the kernel's reassociation, bounded by f32 rounding."""
    from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9_cm_fused

    rng = np.random.RandomState(11)
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    q = s
    val = jnp.asarray(rng.randn(B, s, M, D), jnp.float32)
    ref_pts = jnp.asarray(rng.rand(B, q, l, 2), jnp.float32)       # [B,Q,L,2]
    # pixel-unit offsets, the projection-output scale (a few pixels)
    off = jnp.asarray(rng.randn(B, q, M, l, P, 2) * 3.0, off_dtype)
    w_ = jnp.asarray(rng.rand(B, q, M, l, P) / (l * P), jnp.float32)

    wh = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)     # [L, 2]
    loc = ref_pts[:, :, None, :, None] + off.astype(jnp.float32) / wh[None, None, None, :, None]
    expected = ms_deform_attn_core_jnp(val, shapes, loc, w_)

    valT = jnp.swapaxes(val.reshape(B, s, M * D), 1, 2)            # [B, MD, S]
    off_cm = jnp.moveaxis(off, 1, 5)                               # [B,M,L,P,2,S]
    ref_cm = jnp.moveaxis(ref_pts, 1, 3)                           # [B,L,2,S]
    w_cm = jnp.moveaxis(w_, 1, 4)                                  # [B,M,L,P,S]
    out = ms_deform_attn_pallas_v9_cm_fused(valT, shapes, off_cm, ref_cm, w_cm)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(expected), atol=2e-4
    )


def test_cm_fused_dispatch_fallback_matches():
    """ms_deform_attn_cm_fused CPU fallback == oracle (loc materialized)."""
    from vnext_tpu.ops.ms_deform_attn import ms_deform_attn_cm_fused

    rng = np.random.RandomState(12)
    shapes = SHAPES_SMALL
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    val = jnp.asarray(rng.randn(B, s, M, D), jnp.float32)
    ref_pts = jnp.asarray(rng.rand(B, s, l, 2), jnp.float32)
    off = jnp.asarray(rng.randn(B, s, M, l, P, 2) * 2.0, jnp.float32)
    w_ = jnp.asarray(rng.rand(B, s, M, l, P) / (l * P), jnp.float32)
    wh = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    loc = ref_pts[:, :, None, :, None] + off / wh[None, None, None, :, None]
    expected = ms_deform_attn_core_jnp(val, shapes, loc, w_)
    valT = jnp.swapaxes(val.reshape(B, s, M * D), 1, 2)
    out = ms_deform_attn_cm_fused(
        valT, shapes, jnp.moveaxis(off, 1, 5), jnp.moveaxis(ref_pts, 1, 3),
        jnp.moveaxis(w_, 1, 4),
    )
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out, 1, 2)), np.asarray(expected), atol=1e-5
    )


@pytest.mark.parametrize("ksched", ["0", "1"])
def test_v9_cm_fused_logits_in_kernel_softmax(ksched, monkeypatch):
    """attn_is_logits=True (in-kernel softmax over (L,P)) == XLA-softmaxed
    weights through the same kernel, with both in-kernel and scalar-prefetch
    schedules (VNEXT_MSDA_KSCHED)."""
    from vnext_tpu.ops.ms_deform_attn_pallas_v9 import ms_deform_attn_pallas_v9_cm_fused

    monkeypatch.setenv("VNEXT_MSDA_KSCHED", ksched)
    rng = np.random.RandomState(13)
    shapes = SHAPES_MIXED
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    val = jnp.asarray(rng.randn(B, s, M, D), jnp.float32)
    ref_pts = jnp.asarray(rng.rand(B, s, l, 2), jnp.float32)
    off = jnp.asarray(rng.randn(B, s, M, l, P, 2) * 3.0, jnp.bfloat16)
    logits = jnp.asarray(rng.randn(B, s, M, l, P), jnp.float32)
    weights = jax.nn.softmax(logits.reshape(B, s, M, l * P), axis=-1).reshape(
        B, s, M, l, P
    )

    valT = jnp.swapaxes(val.reshape(B, s, M * D), 1, 2)
    off_cm = jnp.moveaxis(off, 1, 5)
    ref_cm = jnp.moveaxis(ref_pts, 1, 3)
    out_w = ms_deform_attn_pallas_v9_cm_fused(
        valT, shapes, off_cm, ref_cm, jnp.moveaxis(weights, 1, 4)
    )
    out_l = ms_deform_attn_pallas_v9_cm_fused(
        valT, shapes, off_cm, ref_cm, jnp.moveaxis(logits, 1, 4),
        attn_is_logits=True,
    )
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_w), atol=2e-4)

    # and against the oracle on the same materialized locations
    wh = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    loc = ref_pts[:, :, None, :, None] + off.astype(jnp.float32) / wh[None, None, None, :, None]
    expected = ms_deform_attn_core_jnp(val, shapes, loc, weights)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(out_l, 1, 2)), np.asarray(expected), atol=2e-4
    )
