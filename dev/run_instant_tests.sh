#!/bin/bash -e
# Quick-schedule smoke tests (reference surface: dev/run_instant_tests.sh):
# a fast subset — ops oracles, structures, config, data, evaluators — that
# finishes in a few minutes. Full sweep: dev/run_all_tests.sh.

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
    tests/test_misc_parity.py

echo "All instant tests passed."
