"""Webcam demo path (reference demo/demo.py:98 --webcam): a fake camera is
monkeypatched over cv2.VideoCapture and the full demo chain (capture ->
clip-chunked IDOL inference -> visualization -> per-frame PNG output) runs on
the tiny instant-test config."""

import importlib.util
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

ROOT = os.path.join(os.path.dirname(__file__), "..")


class _FakeCapture:
    """Deterministic synthetic camera: a bright blob drifting right."""

    def __init__(self, device):
        self.t = 0

    def isOpened(self):
        return True

    def read(self):
        frame = np.full((96, 128, 3), 30, np.uint8)
        x = 8 + 6 * self.t
        frame[30:70, x : x + 30] = (40, 60, 230)  # BGR blob
        self.t += 1
        return True, frame

    def release(self):
        pass


def test_webcam_demo_end_to_end(monkeypatch, tmp_path):
    monkeypatch.setattr(cv2, "VideoCapture", _FakeCapture)
    monkeypatch.delenv("DISPLAY", raising=False)
    out_dir = tmp_path / "vis"
    monkeypatch.setattr(sys, "argv", [
        "demo.py",
        "--config-file", os.path.join(ROOT, "configs/quick_schedules/idol_instant_test.yaml"),
        "--webcam", "--webcam-max-frames", "6",
        "--output", str(out_dir),
        "--confidence-threshold", "0.0",
    ])
    spec = importlib.util.spec_from_file_location(
        "demo_main", os.path.join(ROOT, "demo", "demo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    pngs = sorted(os.listdir(out_dir))
    assert len(pngs) == 6, pngs
    img = np.asarray(__import__("PIL.Image", fromlist=["Image"]).open(out_dir / pngs[0]))
    assert img.shape == (96, 128, 3)
