#!/usr/bin/env python
"""Probe: Mosaic dynamic-offset VMEM read-modify-write on an output ref.

The v9-machinery MSDA backward wants `dv_ref[0, pl.ds(r0*D, HB*D), :] += blk`
with r0 computed in-kernel (data-dependent row chunk). This probes that the
pattern compiles and is exact on TPU, including revisiting the same output
block across grid steps (accumulator output with constant index map).
"""
import sys

sys.path.insert(0, ".")
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

H, D, W, T, HB = 16, 8, 128, 4, 4


def kernel(x_ref, r_ref, out_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    # data-dependent row start (multiple of D sublanes)
    r0 = jnp.sum(r_ref[0, :, 0:1].astype(jnp.int32)) // T
    blk = x_ref[0, 0:HB * D, :].astype(jnp.float32) + 1.0
    cur = out_ref[0, pl.ds(r0 * D, HB * D), :]
    out_ref[0, pl.ds(r0 * D, HB * D), :] = cur + blk


@jax.jit
def run(x, r):
    return pl.pallas_call(
        kernel,
        grid=(2, T),
        in_specs=[
            pl.BlockSpec((1, H * D, W), lambda b, t: (b, 0, 0)),
            pl.BlockSpec((1, 8, W), lambda b, t: (b, t, 0)),
        ],
        out_specs=pl.BlockSpec((1, H * D, W), lambda b, t: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, H * D, W), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(x, r)


rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(2, H * D, W), jnp.bfloat16)
# r values chosen so each grid step t picks row-chunk start r0 = t % 3
r = jnp.zeros((2, T * 8, W), jnp.float32)
vals = []
for t in range(T):
    r = r.at[:, t * 8, :].set(float((t % 3) * W * T) / W)
out = np.asarray(run(x, r))

want = np.zeros((2, H * D, W), np.float32)
xf = np.asarray(x, np.float32)
for t in range(T):
    r0 = t % 3
    want[:, r0 * D : r0 * D + HB * D, :] += xf[:, : HB * D, :] + 1.0
print("backend:", jax.default_backend())
print("maxdiff:", np.abs(out - want).max())
assert np.abs(out - want).max() < 1e-5, "dynamic RMW store mismatch"
print("OK: dynamic-offset VMEM RMW store works")
