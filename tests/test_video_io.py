"""MJPEG-AVI reader/writer round-trip (utils/video_io.py).

Replaces the reference demo's cv2.VideoCapture/VideoWriter dependency
(demo/demo.py:98-140) with a self-contained RIFF codec."""

import numpy as np
import pytest

from vnext_tpu.utils.video_io import VideoWriter, read_mjpeg_avi, read_video


def _frames(n=6, h=48, w=64, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for t in range(n):
        f = np.full((h, w, 3), 32 * t % 255, np.uint8)
        f[10:30, 8 + 4 * t : 24 + 4 * t] = (200, 40, 40)
        f += rng.randint(0, 8, f.shape).astype(np.uint8)
        out.append(f)
    return out


def test_roundtrip(tmp_path):
    path = str(tmp_path / "clip.avi")
    frames = _frames()
    with VideoWriter(path, fps=12.5, quality=95) as vw:
        for f in frames:
            vw.write(f)
    back, fps = read_mjpeg_avi(path)
    assert len(back) == len(frames)
    assert abs(fps - 12.5) < 0.01
    for a, b in zip(frames, back):
        assert a.shape == b.shape
        # JPEG is lossy; q=95 keeps mean error small
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 4.0


def test_read_video_dispatch(tmp_path):
    path = str(tmp_path / "clip.avi")
    with VideoWriter(path, fps=30) as vw:
        for f in _frames(3):
            vw.write(f)
    frames, fps = read_video(path)
    assert len(frames) == 3 and abs(fps - 30) < 0.01


def test_non_avi_rejected(tmp_path):
    path = tmp_path / "not_video.bin"
    path.write_bytes(b"garbage data that is not RIFF")
    with pytest.raises(ValueError):
        read_mjpeg_avi(str(path))
