"""Demo CLI smoke test (reference surface: demo/demo.py on a frame directory)."""

import os
import sys

import numpy as np
import pytest
from PIL import Image


CONFIGS = {
    "idol": "configs/quick_schedules/idol_instant_test.yaml",
    "seqformer": "configs/quick_schedules/seqformer_instant_test.yaml",
    "minvis": "configs/quick_schedules/minvis_instant_test.yaml",
}


@pytest.mark.parametrize("model_type", ["idol", "seqformer", "minvis"])
def test_demo_runs_on_synthetic_frames(tmp_path, monkeypatch, model_type):
    frames_dir = tmp_path / "frames"
    out_dir = tmp_path / "out"
    frames_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        Image.fromarray(
            rng.randint(0, 255, (64, 96, 3), np.uint8)
        ).save(frames_dir / f"{i:03d}.png")

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "demo_main", os.path.join(os.path.dirname(__file__), "..", "demo", "demo.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    monkeypatch.setattr(
        sys, "argv",
        ["demo.py", "--config-file", CONFIGS[model_type],
         "--model-type", model_type,
         "--input", str(frames_dir), "--output", str(out_dir)],
    )
    mod.main()
    outs = sorted(os.listdir(out_dir))
    assert len(outs) == 3
    first = np.asarray(Image.open(out_dir / outs[0]))
    assert first.shape[:2] == (64, 96)


def test_demo_video_input_output(tmp_path, monkeypatch):
    """--video-input / --video-output: MJPEG-AVI in, visualized MJPEG-AVI out
    (reference: demo/demo.py --video-input + AsyncPredictor overlap)."""
    from vnext_tpu.utils.video_io import VideoWriter, read_mjpeg_avi

    clip = tmp_path / "clip.avi"
    rng = np.random.RandomState(0)
    with VideoWriter(str(clip), fps=10) as vw:
        for _ in range(4):
            vw.write(rng.randint(0, 255, (64, 96, 3), np.uint8))

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "demo_main2", os.path.join(os.path.dirname(__file__), "..", "demo", "demo.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out_avi = tmp_path / "vis.avi"
    monkeypatch.setattr(
        sys, "argv",
        ["demo.py", "--config-file", CONFIGS["idol"], "--model-type", "idol",
         "--video-input", str(clip), "--video-output", str(out_avi)],
    )
    mod.main()
    frames, fps = read_mjpeg_avi(str(out_avi))
    assert len(frames) == 4
    assert abs(fps - 10) < 0.01
    assert frames[0].shape[:2] == (64, 96)
