#!/bin/bash -e
set -e
# Mid-tier model e2e signal (~5 min): image meta-arch unit tests + the
# flagship IDOL whole-video eval path from a quick-schedule yaml.

BIN="python"
ROOT="$(dirname "$0")/.."
cd "$ROOT"

$BIN -m pytest -q \
    tests/test_rcnn.py \
    tests/test_keypoint_pipeline.py \
    tests/test_retinanet.py \
    tests/test_fcos.py \
    tests/test_backbone_variants.py \
    tests/test_reference_model_parity.py \
    tests/test_tta_full.py \
    tests/test_device_tracker.py \
    tests/test_fused_tracker_path.py

JAX_PLATFORMS=cpu $BIN - <<'PYEOF'
import jax; jax.config.update('jax_platforms', 'cpu')
import sys
sys.argv = ['train_net.py', '--config-file',
            'configs/quick_schedules/idol_instant_test.yaml', '--eval-only']
import importlib.util
spec = importlib.util.spec_from_file_location('train_net', 'tools/train_net.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
m.main()
PYEOF

# MinVIS windowed whole-video eval from yaml (train_net_video surface)
JAX_PLATFORMS=cpu $BIN - <<'PYEOF'
import jax; jax.config.update('jax_platforms', 'cpu')
import sys
sys.argv = ['train_net_video.py', '--config-file',
            'configs/quick_schedules/minvis_instant_test.yaml', '--eval-only']
import importlib.util
spec = importlib.util.spec_from_file_location('train_net_video', 'tools/train_net_video.py')
m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m)
m.main()
PYEOF

echo "All model tests passed."
