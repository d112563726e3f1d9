"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This replaces the reference's "launch a real 2-GPU job" integration strategy
(dev/run_instant_tests.sh) with a single-host simulated multi-device environment,
so distributed code paths are exercised in ordinary unit tests.
"""

import os

# Must be set before jax is imported anywhere. Hard override: the surrounding
# environment pins JAX_PLATFORMS to the (remote) TPU platform, which would make
# eager test code pay a remote compile per op. Set VNEXT_TEST_TPU=1 to opt out.
if not os.environ.get("VNEXT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("VNEXT_TEST_TPU"):
    # The environment's sitecustomize registers the remote-TPU ("axon") PJRT
    # plugin and forces jax_platforms="axon,cpu" via jax.config, which the env
    # var cannot override — re-override here before any backend initializes.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "float32")
