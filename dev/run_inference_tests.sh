#!/bin/bash -e
set -e
# Inference smoke test (reference surface: dev/run_inference_tests.sh): runs the
# full IDOL video-inference pipeline (clip batching, tracker, evaluator, RLE)
# on synthetic data and checks the output structure.

BIN="python"
ROOT="$(dirname "$0")/.."
cd "$ROOT"

$BIN -m pytest tests/test_e2e_pipeline.py::test_video_inference_and_evaluator -q

# demo CLI on synthetic frames, all three VIS families (reference
# run_inference_tests.sh also exercises the demo)
$BIN -m pytest tests/test_demo.py -q
echo "Inference tests passed."
