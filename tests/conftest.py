"""Test configuration: run all tests on a virtual 8-device CPU mesh.

This replaces the reference's "launch a real 2-GPU job" integration strategy
(dev/run_instant_tests.sh) with a single-host simulated multi-device environment,
so distributed code paths are exercised in ordinary unit tests.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
