#!/bin/bash -e
set -e
# Full test sweep (the reference's CI-equivalent): entire pytest suite on the
# simulated 8-device CPU mesh + the multi-chip SPMD dryrun. ~40 min on CPU.

BIN="python"
ROOT="$(dirname "$0")/.."
cd "$ROOT"

echo "=== unit + integration tests (8-device CPU mesh) ==="
$BIN -m pytest tests/ -q

echo "=== multi-chip SPMD dryrun (8 virtual devices) ==="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" $BIN - <<'PYEOF'
import jax
jax.config.update("jax_platforms", "cpu")
import importlib.util, pathlib
spec = importlib.util.spec_from_file_location("graft", pathlib.Path("__graft_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
mod.dryrun_multichip(8)
PYEOF

echo "All tests passed."
