"""SeqFormer whole-video / clip-matched inference driver.

Capability parity with projects/SeqFormer/seqformer/seqformer.py:229-330 (whole-
video decode with ``detr.num_frames = video_length``; IFC-style clip matching via
``Videos``/``Clips`` spatio-temporal-IoU stitching, models/clip_output.py:11-60)
and inference_clip (:303 — top-10 query selection).

TPU design: the jitted ``SeqFormer.inference`` handles a fixed clip length; long
videos run the clip-matching path with overlapping windows; the sIoU stitcher
runs on host (numpy + scipy Hungarian), operating on the top-10 selected
stride-4 mask tensors only.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.seqformer import SeqFormer
from .vis_inference import IDOLVideoInference


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class VideoStitcher:
    """Merge overlapping clip predictions by spatio-temporal IoU (Videos :11-126)."""

    def __init__(self, video_length: int, num_classes: int, mask_size: Tuple[int, int],
                 max_inst: int = 120, match_threshold: float = 0.01):
        self.video_length = video_length
        self.match_threshold = match_threshold
        self.max_inst = max_inst
        self.num_inst = 0
        self.num_clip = 0
        self.saved_idx = set()
        h, w = mask_size
        self.logits = np.zeros((0, video_length, h, w), np.float32)   # [N, T, H, W]
        self.valid = np.zeros((0, video_length), bool)
        self.cls = np.zeros((0, num_classes), np.float32)
        self.contrib = np.zeros((0,), np.int32)  # clips contributing per instance

    def update(self, frame_idx: List[int], cls_probs: np.ndarray,
               mask_logits: np.ndarray) -> None:
        """cls_probs: [N, C]; mask_logits: [N, T_clip, H, W] for frames frame_idx."""
        from scipy.optimize import linear_sum_assignment

        probs = _sigmoid(mask_logits)
        overlap = [i for i, f in enumerate(frame_idx) if f in self.saved_idx]
        matched_rows: Dict[int, int] = {}
        if overlap and self.num_inst:
            ov_frames = [frame_idx[i] for i in overlap]
            i_masks = probs[:, overlap].reshape(len(probs), -1)
            s_masks = _sigmoid(self.logits[:, ov_frames]).reshape(self.num_inst, -1)
            s_valid = np.repeat(
                self.valid[:, ov_frames], probs.shape[-1] * probs.shape[-2], axis=1
            ).astype(np.float32)
            inter = (s_masks[:, None] * i_masks[None]) * s_valid[:, None]
            union = ((s_masks[:, None] + i_masks[None] - s_masks[:, None] * i_masks[None])
                     * s_valid[:, None])
            siou = inter.sum(-1) / (union.sum(-1) + 1e-6)  # [N_s, N_i]
            gated = siou * (siou > self.match_threshold)
            rows, cols = linear_sum_assignment(gated, maximize=True)
            for r, c in zip(rows, cols):
                if siou[r, c] > self.match_threshold:
                    matched_rows[c] = r

        for c in range(len(probs)):
            if c in matched_rows:
                r = matched_rows[c]
            else:
                if self.num_inst >= self.max_inst:
                    continue
                r = self.num_inst
                self.num_inst += 1
                self.logits = np.concatenate(
                    [self.logits, np.zeros((1, *self.logits.shape[1:]), np.float32)]
                )
                self.valid = np.concatenate([self.valid, np.zeros((1, self.video_length), bool)])
                self.cls = np.concatenate([self.cls, np.zeros((1, self.cls.shape[1]), np.float32)])
                self.contrib = np.concatenate([self.contrib, np.zeros((1,), np.int32)])
            # average logits where clips overlap (Videos.get_result sums/normalizes)
            for ti, f in enumerate(frame_idx):
                if self.valid[r, f]:
                    self.logits[r, f] = (self.logits[r, f] + mask_logits[c, ti]) / 2
                else:
                    self.logits[r, f] = mask_logits[c, ti]
                    self.valid[r, f] = True
            self.cls[r] = (self.cls[r] * self.contrib[r] + cls_probs[c]) / (self.contrib[r] + 1)
            self.contrib[r] += 1

        self.saved_idx.update(frame_idx)
        self.num_clip += 1

    def get_result(self):
        return self.cls, self.logits, self.valid


class SeqFormerVideoInference(IDOLVideoInference):
    """Whole-video (or clip-matched) SeqFormer inference; reuses the frame
    preparation/mask finalization machinery of the IDOL driver."""

    def __init__(self, model: SeqFormer, params, *, clip_matching: bool = False,
                 clip_length: int = 5, clip_stride: int = 1, topk: int = 10, **kwargs):
        kwargs.setdefault("batch_infer_len", clip_length)
        super().__init__(model, params, **kwargs)
        self.clip_matching = clip_matching
        self.clip_length = clip_length
        self.clip_stride = clip_stride
        self.topk = topk

        def infer(p, imgs, sizes):
            x = (imgs.astype(jnp.float32) - jnp.asarray(self.pixel_mean)) / jnp.asarray(
                self.pixel_std
            )
            return model.apply({"params": p}, x[None], sizes[:1], method=SeqFormer.inference)

        self._infer = jax.jit(infer)

    def _select_topk(self, logits: np.ndarray, masks: np.ndarray):
        """Top-10 queries by max class prob (reference inference_clip :303)."""
        cls = _sigmoid(logits)  # [Q, C]
        order = np.argsort(-cls.max(1))[: self.topk]
        return cls[order], masks[order]

    def __call__(self, record: dict) -> Dict:
        frames, size = self._prepare_frames(record)
        t = frames.shape[0]
        ori_size = (record["height"], record["width"])
        sizes = np.asarray([size] * t, np.int32)

        if not self.clip_matching or t <= self.clip_length:
            out = self._infer(self.params, jnp.asarray(frames), jnp.asarray(sizes))
            cls, masks = self._select_topk(
                np.asarray(out["pred_logits"]), np.asarray(out["pred_masks"])
            )
            valid = np.ones((len(cls), t), bool)
        else:
            stitcher = None
            start = 0
            while True:
                is_last = start + self.clip_length >= t
                s = max(0, t - self.clip_length) if is_last else start
                frame_idx = list(range(s, s + self.clip_length))
                out = self._infer(
                    self.params,
                    jnp.asarray(frames[frame_idx]),
                    jnp.asarray(sizes[: self.clip_length]),
                )
                cls_k, masks_k = self._select_topk(
                    np.asarray(out["pred_logits"]), np.asarray(out["pred_masks"])
                )
                if stitcher is None:
                    stitcher = VideoStitcher(t, cls_k.shape[1], masks_k.shape[-2:])
                stitcher.update(frame_idx, cls_k, masks_k)
                if is_last:
                    break
                start += self.clip_stride * self.clip_length
            cls, logits, valid = stitcher.get_result()
            masks = logits

        # multi-class thresholding + full-res masks (same postprocess as IDOL)
        out_scores, out_labels, out_masks = [], [], []
        above = np.nonzero(cls > self.apply_cls_thres)
        for inst, label in zip(*above):
            out_scores.append(float(cls[inst, label]))
            out_labels.append(int(label))
            inst_masks = []
            for f in range(t):
                if not valid[inst].all() and not valid[inst, f]:
                    inst_masks.append(None)
                else:
                    inst_masks.append(self._finalize_mask(masks[inst, f], size, ori_size))
            out_masks.append(inst_masks)
        return {
            "image_size": ori_size,
            "pred_scores": out_scores,
            "pred_labels": out_labels,
            "pred_masks": out_masks,
        }
