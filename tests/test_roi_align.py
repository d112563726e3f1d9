"""ROIAlign vs an independent from-spec python oracle (reference test style:
tests/layers/test_roi_align.py compares to cv2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.ops.roi_align import roi_align


def _oracle(feat, roi, out_size, scale, ratio, aligned=True):
    """Slow reference: explicit loops over bins and samples."""
    h, w = feat.shape[:2]
    off = 0.5 if aligned else 0.0
    x1, y1, x2, y2 = roi * scale - off
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = max(roi_w, 1.0)
        roi_h = max(roi_h, 1.0)
    bw = roi_w / out_size[1]
    bh = roi_h / out_size[0]
    out = np.zeros((*out_size, feat.shape[2]), np.float64)

    def bilinear(y, x):
        if y <= -1 or y >= h or x <= -1 or x >= w:
            return 0.0
        y = min(max(y, 0), h - 1)
        x = min(max(x, 0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1_, x1_ = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ty, tx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ty) * (1 - tx)
            + feat[y0, x1_] * (1 - ty) * tx
            + feat[y1_, x0] * ty * (1 - tx)
            + feat[y1_, x1_] * ty * tx
        )

    for py in range(out_size[0]):
        for px in range(out_size[1]):
            acc = 0.0
            for sy in range(ratio):
                for sx in range(ratio):
                    y = y1 + (py + (sy + 0.5) / ratio) * bh
                    x = x1 + (px + (sx + 0.5) / ratio) * bw
                    acc += bilinear(y, x)
            out[py, px] = acc / (ratio * ratio)
    return out


@pytest.mark.parametrize("aligned", [True, False])
def test_roi_align_matches_oracle(aligned):
    rng = np.random.RandomState(0)
    feat = rng.randn(1, 20, 24, 3).astype(np.float32)
    rois = np.asarray(
        [
            [0, 2.0, 3.0, 18.0, 15.0],
            [0, 0.5, 0.5, 7.3, 9.9],
            [0, 10.0, 5.0, 23.5, 19.5],
        ],
        np.float32,
    )
    out = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), (7, 7), 1.0, 2, aligned=aligned)
    )
    for i, roi in enumerate(rois):
        ref = _oracle(feat[0].astype(np.float64), roi[1:], (7, 7), 1.0, 2, aligned)
        np.testing.assert_allclose(out[i], ref, rtol=1e-4, atol=1e-4)


def test_roi_align_spatial_scale_and_batch():
    rng = np.random.RandomState(1)
    feat = rng.randn(2, 16, 16, 2).astype(np.float32)
    rois = np.asarray([[1, 8.0, 8.0, 40.0, 40.0]], np.float32)  # image 1, scale 1/4
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois), (5, 5), 0.25, 2))
    ref = _oracle(feat[1].astype(np.float64), rois[0, 1:], (5, 5), 0.25, 2)
    np.testing.assert_allclose(out[0], ref, rtol=1e-4, atol=1e-4)


def test_roi_align_rotated_zero_angle_matches_axis_aligned():
    from vnext_tpu.ops.roi_align_rotated import roi_align_rotated

    rng = np.random.RandomState(3)
    feat = rng.randn(1, 20, 24, 3).astype(np.float32)
    # axis-aligned roi as rotated (angle 0): cx,cy,w,h
    x1, y1, x2, y2 = 4.0, 3.0, 16.0, 15.0
    rot = np.asarray([[0, (x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1, 0.0]], np.float32)
    out_rot = np.asarray(roi_align_rotated(jnp.asarray(feat), jnp.asarray(rot), (7, 7), 1.0, 2))
    aa = np.asarray([[0, x1, y1, x2, y2]], np.float32)
    out_aa = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(aa), (7, 7), 1.0, 2, aligned=True))
    np.testing.assert_allclose(out_rot[0], out_aa[0], rtol=1e-4, atol=1e-4)


def test_roi_align_rotated_90_matches_transposed():
    from vnext_tpu.ops.roi_align_rotated import roi_align_rotated

    rng = np.random.RandomState(4)
    feat = rng.randn(1, 16, 16, 2).astype(np.float32)
    # a 90°-rotated roi samples the same region with swapped w/h and rotated grid
    roi0 = np.asarray([[0, 8.0, 8.0, 8.0, 4.0, 0.0]], np.float32)
    roi90 = np.asarray([[0, 8.0, 8.0, 4.0, 8.0, 90.0]], np.float32)
    o0 = np.asarray(roi_align_rotated(jnp.asarray(feat), jnp.asarray(roi0), (4, 8), 1.0, 2))
    o90 = np.asarray(roi_align_rotated(jnp.asarray(feat), jnp.asarray(roi90), (8, 4), 1.0, 2))
    # rotating the ROI by 90°: the output grid is the transpose flipped along x
    np.testing.assert_allclose(
        o0[0], np.flip(o90[0].transpose(1, 0, 2), axis=1), rtol=1e-3, atol=1e-3
    )
