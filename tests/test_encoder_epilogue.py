"""Fused encoder epilogue (ops/encoder_epilogue.py): parity + param tree.

The kernel replaces the post-attention tail of the deformable encoder layer
(reference idol/models/deformable_transformer.py:156-176 — norm1, linear1,
relu, linear2, norm2 with residuals) on the channel-major inference path.
These tests pin (a) kernel-vs-jnp math parity in interpret mode, (b) that the
EncoderLayer fused branch produces the same outputs AND the same parameter
tree as the unfused module chain, so checkpoints are branch-agnostic.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.ops.encoder_epilogue import encoder_epilogue_cm


def _jnp_chain(a, src, g1, be1, w1, b1, w2, b2, g2, be2, cdt):
    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(1, keepdims=True)
        var = (xf * xf).mean(1, keepdims=True) - mu * mu
        return (xf - mu) * jax.lax.rsqrt(var + 1e-6) * g[:, None] + b[:, None]

    h = ln(src.astype(jnp.float32) + a.astype(jnp.float32), g1, be1)
    ff = jnp.einsum(
        "io,bis->bos", w1.astype(cdt), h.astype(cdt),
        preferred_element_type=jnp.float32,
    ) + b1[:, None]
    ff = jnp.maximum(ff, 0.0)
    y = jnp.einsum(
        "io,bis->bos", w2.astype(cdt), ff.astype(cdt),
        preferred_element_type=jnp.float32,
    ) + b2[:, None]
    return ln(h + y, g2, be2).astype(cdt)


@pytest.mark.parametrize("dt,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 0.12)])
def test_epilogue_kernel_parity(dt, atol):
    rng = np.random.RandomState(3)
    b, c, s, f = 2, 64, 300, 128
    a = jnp.asarray(rng.randn(b, c, s) * 0.2, dt)
    src = jnp.asarray(rng.randn(b, c, s), dt)
    g1 = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    be1 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(c, f) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, c) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    g2 = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    be2 = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

    got = encoder_epilogue_cm(
        a, src, g1, be1, w1, b1, w2, b2, g2, be2, interpret=True, ts=128
    )
    want = _jnp_chain(a, src, g1, be1, w1, b1, w2, b2, g2, be2, dt)
    assert got.shape == (b, c, s)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )


def _tiny_layer_apply(flag, params=None):
    """Run a tiny channel-major EncoderLayer in eval under the given
    VNEXT_FUSED_EPILOGUE flag; returns (out, params)."""
    from vnext_tpu.models.deformable_transformer import (
        EncoderLayer, encoder_reference_points,
    )

    shapes = ((8, 8), (4, 4))
    s = sum(h * w for h, w in shapes)
    b, d = 2, 32
    rng = np.random.RandomState(11)
    src = jnp.asarray(rng.randn(b, d, s) * 0.5, jnp.float32)
    pos = jnp.asarray(rng.randn(b, d, s) * 0.1, jnp.float32)
    ref = encoder_reference_points(shapes, jnp.ones((b, len(shapes), 2)))
    ref_cm = jnp.moveaxis(ref, 1, 3)  # [B, L, 2, S]
    layer = EncoderLayer(d_model=d, d_ffn=64, n_levels=2, n_heads=4,
                         n_points=4, dropout=0.0, msda_impl="jnp")

    old = os.environ.get("VNEXT_FUSED_EPILOGUE")
    os.environ["VNEXT_FUSED_EPILOGUE"] = flag
    try:
        if params is None:
            params = layer.init(
                jax.random.PRNGKey(0), src, pos, ref_cm, shapes, None,
                train=False, channel_major=True,
            )
        out = layer.apply(
            params, src, pos, ref_cm, shapes, None,
            train=False, channel_major=True,
        )
    finally:
        if old is None:
            os.environ.pop("VNEXT_FUSED_EPILOGUE", None)
        else:
            os.environ["VNEXT_FUSED_EPILOGUE"] = old
    return out, params


def test_encoder_layer_fused_branch_matches_and_shares_params():
    out0, p0 = _tiny_layer_apply("0")
    out1, p1 = _tiny_layer_apply("1", params=p0)  # unfused-init params reused

    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(out0, np.float32), atol=5e-5
    )

    # init under the fused branch must produce the identical tree: same paths,
    # same shapes, same VALUES (ParamHolder matches the RNG fold path)
    _, p1i = _tiny_layer_apply("1")
    f0 = jax.tree_util.tree_leaves_with_path(p0)
    f1 = jax.tree_util.tree_leaves_with_path(p1i)
    paths0 = [jax.tree_util.keystr(k) for k, _ in f0]
    paths1 = [jax.tree_util.keystr(k) for k, _ in f1]
    assert paths0 == paths1
    for (k, a), (_, b) in zip(f0, f1):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(k)
        )
