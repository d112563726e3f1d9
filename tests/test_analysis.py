"""Model-analysis utilities (reference: detectron2/utils/analysis.py +
tools/analyze_model.py): FLOPs from XLA cost analysis, activation counting
with fvcore semantics, unused-parameter detection."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.utils.analysis import (
    activation_count,
    find_unused_parameters,
    flop_count,
    parameter_count,
)


class _Net(nn.Module):
    @nn.compact
    def __call__(self, x):  # x [B, 8, 8, 3]
        x = nn.Conv(4, (3, 3), name="conv")(x)        # out [B, 8, 8, 4]
        x = x.reshape(x.shape[0], -1)                 # [B, 256]
        x = nn.Dense(16, name="fc1")(x)               # [B, 16]
        self.param("orphan", nn.initializers.ones, (7,))  # never used
        return nn.Dense(2, name="fc2")(x)             # [B, 2]


def _setup():
    net = _Net()
    x = jnp.ones((2, 8, 8, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    return net, params, x


def test_activation_count_matches_hand_count():
    net, params, x = _setup()
    got = activation_count(lambda p, xx: net.apply({"params": p}, xx), params, x)
    # conv out 2*8*8*4 = 512; fc1 out 2*16 = 32; fc2 out 2*2 = 4
    assert got == 512 + 32 + 4, got


def test_activation_count_scales_scan_bodies():
    def fn(x):
        def body(c, _):
            return jnp.dot(c, jnp.ones((4, 4), c.dtype)), ()
        out, _ = jax.lax.scan(body, x, None, length=5)
        return out

    got = activation_count(fn, jnp.ones((3, 4)))
    assert got == 5 * 3 * 4, got  # dot output [3,4], 5 trips


def test_flop_count_positive_and_conv_dominated():
    net, params, x = _setup()
    cost = flop_count(lambda p, xx: net.apply({"params": p}, xx), params, x)
    assert cost["flops"] > 2 * 512 * 27  # at least the conv MACs


def test_find_unused_parameters_flags_orphan_only():
    net, params, x = _setup()
    rng = np.random.RandomState(0)
    xr = jnp.asarray(rng.randn(2, 8, 8, 3), jnp.float32)
    unused = find_unused_parameters(
        lambda p, xx: net.apply({"params": p}, xx), params, xr)
    assert any("orphan" in u for u in unused), unused
    assert all("orphan" in u for u in unused), unused


def test_parameter_count():
    net, params, x = _setup()
    n = parameter_count(params)
    # conv 3*3*3*4+4=112, fc1 256*16+16=4112, fc2 16*2+2=34, orphan 7
    assert n == 112 + 4112 + 34 + 7, n
