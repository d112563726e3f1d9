#!/usr/bin/env python
"""On-device stem-conv experiments (round 4).

Measures, with the sync-corrected chained-scan harness:
  1. baseline: XLA 7x7/s2 C_in=3 conv (the current ResNet stem form)
  2. relayout: NHWC pad -> phase-split channel-first [B,3,2,Hp,Up] (pallas feed)
  3. (once the kernel exists) the pallas stem on the prepared layout

Run: python tools/exp_stem.py [baseline|relayout|all]
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 10, 480, 864
HO, WO = H // 2, W // 2
DT = jnp.bfloat16

rng = np.random.RandomState(0)
x_nhwc = jnp.asarray(rng.randn(B, H, W, 3), DT)
k_hwio = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.1, DT)


def timeit(name, fn, x, n=32):
    """Chained-scan timing with axon sync-baseline subtraction."""
    @jax.jit
    def run(v):
        def body(carry, _):
            out = fn(carry)
            fb = (jnp.sum(out) * 1e-12).astype(carry.dtype)
            return carry + fb, jnp.sum(out).astype(jnp.float32)
        final, s = jax.lax.scan(body, v, None, length=n)
        return jnp.sum(s)

    @jax.jit
    def nullg(v):
        return jnp.sum(v[0, :8]).astype(jnp.float32)

    float(nullg(x))
    t0 = time.time()
    for _ in range(4):
        float(nullg(x))
    sync_s = (time.time() - t0) / 4
    t0 = time.time(); float(run(x)); ct = time.time() - t0
    t0 = time.time(); float(run(x)); rt = max(time.time() - t0 - sync_s, 0.0)
    print(f"{name}: {rt / n * 1000:.3f} ms/iter (sync {sync_s*1e3:.0f} ms, "
          f"compile {ct:.1f}s)", flush=True)
    return rt / n * 1000


def stem_conv(x):
    return jax.lax.conv_general_dilated(
        x, k_hwio, window_strides=(2, 2), padding=[(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def prep_xps(x, lanes=512):
    """NHWC [B,H,W,3] -> phase-split channel-first [B,3,2,H+6,lanes]."""
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))          # [B,486,870,3]
    u = (W + 6) // 2                                           # 435
    xp = xp.reshape(B, H + 6, u, 2, 3)
    xp = jnp.transpose(xp, (0, 4, 3, 1, 2))                    # [B,3,2,486,435]
    return jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 0), (0, lanes - u)))


which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which in ("baseline", "all"):
    timeit("stem_conv_xla", stem_conv, x_nhwc)
if which in ("relayout", "all"):
    timeit("prep_xps", prep_xps, x_nhwc)
if which in ("relayout_nchw", "all"):
    # how much of prep is the minor-3 transpose vs the phase split?
    timeit("nhwc_to_nchw", lambda v: jnp.transpose(v, (0, 3, 1, 2)), x_nhwc)


def prep_s2d(x):
    """NHWC [B,H,W,3] -> space-to-depth [B,(H+6)/2,(W+6)/2,12] (q,p,c packed)."""
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))            # [B,486,870,3]
    hp2, u = (H + 6) // 2, (W + 6) // 2
    xp = xp.reshape(B, hp2, 2, u, 2, 3)                          # [B,243,2,435,2,3]
    return jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(B, hp2, u, 12)


def k_s2d(k):
    """[7,7,3,64] -> [4,4,12,64] polyphase kernel (zeros at ky=7/kx=7)."""
    kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))            # [8,8,3,64]
    kp = kp.reshape(4, 2, 4, 2, 3, 64)                           # [dy,q,dx,p,3,64]
    return jnp.transpose(kp, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 12, 64)


K2 = k_s2d(k_hwio)


def stem_s2d(x):
    xs = prep_s2d(x)
    return jax.lax.conv_general_dilated(
        xs, K2, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


if which in ("s2d", "all2"):
    timeit("stem_s2d_e2e", stem_s2d, x_nhwc)
    # numerics check vs baseline
    a = stem_conv(x_nhwc)
    b = stem_s2d(x_nhwc)
    print("s2d allclose:", jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))),
          "ref mag:", jnp.max(jnp.abs(a.astype(jnp.float32))))


def k_w6(k):
    """[7,7,3,64] -> [7,4,6,64]: W-pair polyphase (kx = 2*dx+p), zero at kx=7."""
    kp = jnp.pad(k, ((0, 0), (0, 1), (0, 0), (0, 0)))            # [7,8,3,64]
    kp = kp.reshape(7, 4, 2, 3, 64)                              # [ky,dx,p,c,64]
    return kp.reshape(7, 4, 6, 64)


K6 = k_w6(k_hwio)


def stem_w6(x):
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))            # [B,486,870,3]
    x6 = xp.reshape(B, H + 6, (W + 6) // 2, 6)                   # free flat order
    return jax.lax.conv_general_dilated(
        x6, K6, window_strides=(2, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


if which in ("w6", "all3"):
    timeit("stem_w6_e2e", stem_w6, x_nhwc)
    a = stem_conv(x_nhwc)
    b = stem_w6(x_nhwc)
    print("w6 maxdiff:", jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))),
          "shape:", b.shape)


# ---- honest layout-prep costs: force materialization with a matmul consumer
WM64 = jnp.asarray(rng.randn(64, 64) * 0.1, DT)


def _consume(y):
    """Cheap consumer that needs y's real layout: slice + tiny matmul."""
    f = y.reshape(-1, y.shape[-1])
    return f[:: max(1, f.shape[0] // 4096)] @ jnp.eye(y.shape[-1], 64, dtype=y.dtype)


def prep_xflat(x):
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    return xp.reshape(B, H + 6, (W + 6) * 3)


def prep_xps6(x):
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))            # [B,486,870,3]
    u = (W + 6) // 2
    xp = xp.reshape(B, H + 6, u, 6)                              # free flat order
    xp = jnp.transpose(xp, (0, 3, 1, 2))                         # [B,6,486,435]
    return jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 13)))        # lanes 448


if which in ("prep", "all4"):
    timeit("prep_xflat+consume", lambda v: _consume(prep_xflat(v)), x_nhwc)
    timeit("prep_xps6+consume", lambda v: _consume(prep_xps6(v)), x_nhwc)
    timeit("consume_only", lambda v: _consume(v), x_nhwc)


if which in ("pallas", "all5"):
    from vnext_tpu.ops.stem_conv import stem_conv7x7s2_bn_relu, stem_conv_reference
    sc = jnp.asarray(rng.rand(64) + 0.5, jnp.float32)
    bi = jnp.asarray(rng.randn(64) * 0.1, jnp.float32)
    x32 = x_nhwc.astype(jnp.float32)
    timeit("stem_ref_conv_bn_relu", lambda v: stem_conv_reference(v, k_hwio, sc, bi), x32)
    timeit("stem_pallas_fused", lambda v: stem_conv7x7s2_bn_relu(v, k_hwio, sc, bi), x32)
    a = np.asarray(stem_conv_reference(x32, k_hwio, sc, bi), np.float32)
    b = np.asarray(stem_conv7x7s2_bn_relu(x32, k_hwio, sc, bi), np.float32)
    print("pallas maxdiff:", np.abs(a - b).max(), "mag:", np.abs(a).max())
