"""Pallas fused ResNet stem (ops/stem_conv.py) vs the XLA oracle.

Reference semantics: detectron2/modeling/backbone/resnet.py:356 BasicStem
(Conv2d(3, 64, 7, stride=2, padding=3) + FrozenBN + relu). Runs in Pallas
interpret mode so the parity holds on CPU CI; the on-device A/B lives in
tools/exp_stem.py (1.85 ms fused vs 4.84 ms XLA at 480x864 T=10).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnext_tpu.ops.stem_conv import stem_conv7x7s2_bn_relu, stem_conv_reference

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("h,w", [(32, 48), (48, 64), (16, 256)])
def test_stem_parity(h, w):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)

    ref = np.asarray(stem_conv_reference(x, k, scale, bias), np.float32)
    got = np.asarray(
        stem_conv7x7s2_bn_relu(x, k, scale, bias, interpret=INTERPRET), np.float32
    )
    assert got.shape == ref.shape == (2, h // 2, w // 2, 64)
    # both paths accumulate f32 over bf16 inputs but in different term orders:
    # tolerance is a few bf16 ulps of the output magnitude
    tol = 4 * 0.0079 * max(np.abs(ref).max(), 1.0)
    np.testing.assert_allclose(got, ref, atol=tol)


def test_resnet_stem_flag_parity(monkeypatch):
    """ResNet forward with the Pallas stem == ResNet forward with XLA stem,
    with an identical parameter tree (checkpoint-path compatibility)."""
    from vnext_tpu.models.backbones.resnet import ResNet

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)

    monkeypatch.setenv("VNEXT_PALLAS_STEM", "0")
    model = ResNet(depth=18, out_features=("res2",), dtype=jnp.float32)
    params_off = model.init(jax.random.PRNGKey(0), x)["params"]
    out_off = model.apply({"params": params_off}, x)["res2"]

    monkeypatch.setenv("VNEXT_PALLAS_STEM", "1")
    params_on = model.init(jax.random.PRNGKey(0), x)["params"]
    paths = lambda p: {jax.tree_util.keystr(k) for k, _ in
                       jax.tree_util.tree_leaves_with_path(p)}
    assert paths(params_on) == paths(params_off)
    out_on = model.apply({"params": params_off}, x)["res2"]

    # the pallas stem computes in bf16 (like the bf16 production config);
    # downstream f32 stages keep the diff at bf16-rounding scale
    diff = np.abs(np.asarray(out_on - out_off, np.float32))
    assert diff.max() < 0.15 * max(float(jnp.abs(out_off).max()), 1.0)


def test_stem_grad_matches_reference():
    """The stem is differentiable (train path hits it): its VJP linearizes
    the XLA oracle, so grads must equal the oracle's own grads exactly."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
    k = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, jnp.bfloat16)
    scale = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    cot = jnp.asarray(rng.randn(1, 8, 8, 64), jnp.float32)

    def loss_k(x, k, s, b):
        o = stem_conv7x7s2_bn_relu(x, k, s, b, interpret=INTERPRET)
        return jnp.sum(o.astype(jnp.float32) * cot)

    from vnext_tpu.ops.stem_conv import _stem_ref_f32

    def loss_r(x, k, s, b):
        return jnp.sum(_stem_ref_f32(x, k, s, b).astype(jnp.float32) * cot)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, k, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, k, scale, bias)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-5
        )
