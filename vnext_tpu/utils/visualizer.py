"""Drawing utilities for detection/VIS outputs.

Capability parity with detectron2/utils/visualizer.py (Visualizer: boxes, masks,
labels) and video_visualizer.py (VideoVisualizer: cross-frame color-consistent
instance drawing) — implemented on PIL (no cv2/matplotlib dependency).
"""

from __future__ import annotations

import colorsys
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont

Color = Tuple[int, int, int]


def _color_for(idx: int) -> Color:
    """Deterministic, well-spread color palette."""
    h = (idx * 0.6180339887) % 1.0
    r, g, b = colorsys.hsv_to_rgb(h, 0.75, 0.95)
    return int(r * 255), int(g * 255), int(b * 255)


class Visualizer:
    """Draw instances on a single RGB image (HWC uint8)."""

    def __init__(self, img_rgb: np.ndarray, class_names: Optional[Sequence[str]] = None,
                 mask_alpha: float = 0.45):
        self._img = Image.fromarray(np.asarray(img_rgb, np.uint8)).convert("RGB")
        self._names = list(class_names) if class_names else None
        self._alpha = mask_alpha

    def draw_instances(
        self,
        boxes: Optional[np.ndarray] = None,     # [N, 4] xyxy (abs pixels)
        labels: Optional[np.ndarray] = None,    # [N] int
        scores: Optional[np.ndarray] = None,    # [N] float
        masks: Optional[np.ndarray] = None,     # [N, H, W] bool
        colors: Optional[List[Color]] = None,
        track_ids: Optional[Sequence[int]] = None,
    ) -> np.ndarray:
        n = 0
        for x in (boxes, labels, scores, masks):
            if x is not None:
                n = len(x)
                break
        if colors is None:
            ids = track_ids if track_ids is not None else range(n)
            colors = [_color_for(int(i)) for i in ids]

        base = np.asarray(self._img, np.float32)
        if masks is not None:
            for i in range(n):
                m = np.asarray(masks[i], bool)
                if m.shape != base.shape[:2]:
                    continue
                c = np.asarray(colors[i], np.float32)
                base[m] = base[m] * (1 - self._alpha) + c * self._alpha
        out = Image.fromarray(base.astype(np.uint8))
        draw = ImageDraw.Draw(out)
        for i in range(n):
            c = tuple(colors[i])
            if boxes is not None:
                x1, y1, x2, y2 = [float(v) for v in boxes[i]]
                draw.rectangle([x1, y1, x2, y2], outline=c, width=2)
                tx, ty = x1, max(y1 - 12, 0)
            elif masks is not None:
                ys, xs = np.nonzero(masks[i])
                if len(ys) == 0:
                    continue
                tx, ty = float(xs.min()), max(float(ys.min()) - 12, 0)
            else:
                continue
            text = ""
            if labels is not None:
                li = int(labels[i])
                text = self._names[li] if self._names and li < len(self._names) else str(li)
            if scores is not None:
                text += f" {float(scores[i]):.0%}"
            if track_ids is not None:
                text = f"#{int(track_ids[i])} " + text
            if text:
                draw.text((tx, ty), text.strip(), fill=c)
        self._img = out
        return np.asarray(out)

    def draw_keypoints(
        self,
        keypoints: np.ndarray,                  # [N, K, 3] (x, y, vis/score)
        connectivity: Optional[Sequence[Tuple[int, int]]] = None,
        radius: int = 3,
        vis_thresh: float = 0.05,
    ) -> np.ndarray:
        """Dots per visible keypoint + optional skeleton edges (reference
        visualizer.py draw_and_connect_keypoints)."""
        draw = ImageDraw.Draw(self._img)
        kp = np.asarray(keypoints, np.float64)
        for i in range(kp.shape[0]):
            c = _color_for(i)
            for k in range(kp.shape[1]):
                x, y, v = kp[i, k]
                if v <= vis_thresh:
                    continue
                draw.ellipse([x - radius, y - radius, x + radius, y + radius], fill=c)
            if connectivity:
                for a, b in connectivity:
                    if kp[i, a, 2] > vis_thresh and kp[i, b, 2] > vis_thresh:
                        draw.line([tuple(kp[i, a, :2]), tuple(kp[i, b, :2])],
                                  fill=c, width=2)
        return np.asarray(self._img)

    def draw_panoptic_seg(
        self,
        panoptic: np.ndarray,                   # [H, W] segment ids (0 = void)
        segments_info: Sequence[dict],
        stuff_names: Optional[Sequence[str]] = None,
    ) -> np.ndarray:
        """Overlay every panoptic segment with a stable per-id color (reference
        visualizer.py draw_panoptic_seg)."""
        base = np.asarray(self._img, np.float32)
        draw_labels = []
        for seg in segments_info:
            m = panoptic == seg["id"]
            if not m.any():
                continue
            c = np.asarray(_color_for(seg["id"]), np.float32)
            base[m] = base[m] * (1 - self._alpha) + c * self._alpha
            names = self._names if seg.get("isthing", False) else stuff_names
            cat = seg.get("category_id", -1)
            label = names[cat] if names and 0 <= cat < len(names) else str(cat)
            ys, xs = np.nonzero(m)
            draw_labels.append((float(xs.mean()), float(ys.mean()), label,
                                tuple(int(v) for v in c)))
        out = Image.fromarray(base.astype(np.uint8))
        d = ImageDraw.Draw(out)
        for x, y, label, c in draw_labels:
            d.text((x, y), label, fill=c)
        self._img = out
        return np.asarray(out)

    def get_image(self) -> np.ndarray:
        return np.asarray(self._img)


class VideoVisualizer:
    """Color-consistent drawing across frames, keyed by track id
    (reference: detectron2/utils/video_visualizer.py)."""

    def __init__(self, class_names: Optional[Sequence[str]] = None):
        self._names = class_names
        self._colors: Dict[int, Color] = {}

    def draw_frame(
        self,
        frame_rgb: np.ndarray,
        track_ids: Sequence[int],
        boxes: Optional[np.ndarray] = None,
        labels: Optional[np.ndarray] = None,
        scores: Optional[np.ndarray] = None,
        masks: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        colors = []
        for tid in track_ids:
            if tid not in self._colors:
                self._colors[tid] = _color_for(len(self._colors))
            colors.append(self._colors[tid])
        vis = Visualizer(frame_rgb, self._names)
        return vis.draw_instances(
            boxes=boxes, labels=labels, scores=scores, masks=masks,
            colors=colors, track_ids=track_ids,
        )
