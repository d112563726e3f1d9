#!/bin/bash -e
# Quick-schedule smoke tests (reference surface: dev/run_instant_tests.sh).
# Instead of launching a 2-GPU job, runs the full pytest suite on a simulated
# 8-device CPU mesh (includes short-training loss-decrease and SPMD dryrun tests)
# plus the multi-chip dryrun entry the driver uses.

BIN="python"
ROOT="$(dirname "$0")/.."
cd "$ROOT"

echo "=== unit + integration tests (8-device CPU mesh) ==="
$BIN -m pytest tests/ -q

echo "=== multi-chip SPMD dryrun (8 virtual devices) ==="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" $BIN - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import importlib.util, pathlib
spec = importlib.util.spec_from_file_location("graft", pathlib.Path("__graft_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.dryrun_multichip(8)
EOF

echo "All instant tests passed."
