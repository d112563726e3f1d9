#!/bin/bash -e
set -e
# Quick-schedule smoke tests (reference surface: dev/run_instant_tests.sh):
# the fast pytest subset (ops oracles, structures, config, data, evaluators)
# PLUS one tiny end-to-end train+eval from a quick-schedule yaml with
# TEST.EXPECTED_RESULTS asserted. Full sweep: dev/run_all_tests.sh;
# mid-tier (model e2e, ~5 min): dev/run_model_tests.sh.

BIN="python"
ROOT="$(dirname "$0")/.."
cd "$ROOT"

$BIN -m pytest -q \
    tests/test_ops.py \
    tests/test_structures.py \
    tests/test_config.py \
    tests/test_data.py \
    tests/test_evaluation.py \
    tests/test_extra_evaluators.py \
    tests/test_native_eval.py \
    tests/test_hungarian.py \
    tests/test_misc_parity.py \
    tests/test_msda_v7.py \
    tests/test_augmentation.py \
    tests/test_results_json_golden.py \
    tests/test_engine.py \
    tests/test_model_zoo.py

# end-to-end: 3 train iters + eval + verify_results from yaml (synthetic data)
JAX_PLATFORMS=cpu $BIN - <<'PYEOF'
import jax; jax.config.update('jax_platforms', 'cpu')
import sys
sys.argv = ['train_net.py', '--config-file',
            'configs/quick_schedules/faster_rcnn_R_18_instant_test.yaml']
import importlib.util
spec = importlib.util.spec_from_file_location('train_net', 'tools/train_net.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
m.main()
PYEOF

echo "All instant tests passed."
