"""MinVIS (+InstMove motion) whole-video inference driver.

Capability parity with projects/InstMove/MinVIS_motion/minvis/
video_maskformer_model.py: per-frame Mask2Former inference, query alignment
across frames by embedding matching (:326 match_from_embds, optionally fused
with the InstMove motion-IoU cost from the 4 previous aligned masks, :369-404),
windowed inference (:445 run_window_inference), and video-level top-k output
selection (:407-443 inference_video).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mask2former import MaskFormer, minvis_match_from_embds
from .vis_inference import IDOLVideoInference, _sigmoid


class MinVISVideoInference(IDOLVideoInference):
    def __init__(self, model: MaskFormer, params, *, window_size: int = 3,
                 topk: int = 10, motion_predictor=None, motion_params=None,
                 motion_history: int = 4, **kwargs):
        kwargs.setdefault("batch_infer_len", window_size)
        super().__init__(model, params, **kwargs)
        self.window_size = window_size
        self.topk = topk
        self.motion_predictor = motion_predictor
        self.motion_params = motion_params
        self.motion_history = motion_history

        def infer(p, imgs, sizes):
            x = (imgs.astype(jnp.float32) - jnp.asarray(self.pixel_mean)) / jnp.asarray(
                self.pixel_std
            )
            return model.apply({"params": p}, x, sizes, method=MaskFormer.inference)

        self._infer = jax.jit(infer)
        if motion_predictor is not None:
            self._motion = jax.jit(
                lambda p, m, im: motion_predictor.apply({"params": p}, m, im)
            )

    def _run_clips(self, frames: np.ndarray, size):
        t = frames.shape[0]
        w = self.window_size
        outs = {"pred_logits": [], "pred_masks": [], "pred_embds": []}
        sizes = np.asarray([size] * w, np.int32)
        for c in range(max(1, math.ceil(t / w))):
            chunk = frames[c * w : (c + 1) * w]
            n = chunk.shape[0]
            if n < w:
                chunk = np.concatenate([chunk, np.zeros((w - n, *chunk.shape[1:]), chunk.dtype)])
            out = self._infer(self.params, jnp.asarray(chunk), jnp.asarray(sizes))
            for k in outs:
                outs[k].append(np.asarray(out[k])[:n])
        return {k: np.concatenate(v) for k, v in outs.items()}

    def __call__(self, record: dict) -> Dict:
        frames, size = self._prepare_frames(record)
        out = self._run_clips(frames, size)
        logits, masks, embds = out["pred_logits"], out["pred_masks"], out["pred_embds"]
        t = len(logits)

        # align queries across frames (embedding cost; +motion cost when available)
        aligned_l, aligned_m = [logits[0]], [masks[0]]
        prev_embd = embds[0]
        for f in range(1, t):
            motion_mask = None
            if self.motion_predictor is not None and f >= self.motion_history:
                hist = np.stack(aligned_m[f - self.motion_history : f], axis=1)  # [Q,Th,H,W]
                hist = _sigmoid(hist)[..., None]
                img = (frames[f].astype(np.float32) - self.pixel_mean) / self.pixel_std
                img_b = np.broadcast_to(img[None], (hist.shape[0], *img.shape))
                motion_mask = np.asarray(
                    self._motion(self.motion_params, jnp.asarray(hist), jnp.asarray(img_b))
                )[:, 0, ..., 0]
            perm = minvis_match_from_embds(
                prev_embd, embds[f],
                motion_mask=motion_mask,
                current_mask=masks[f] if motion_mask is not None else None,
            )
            aligned_l.append(logits[f][perm])
            aligned_m.append(masks[f][perm])
            prev_embd = embds[f][perm]

        logits = np.stack(aligned_l)   # [T, Q, C+1]
        masks = np.stack(aligned_m)    # [T, Q, H4, W4]

        # video-level selection (reference inference_video: mean softmax scores, topk)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        cls_mean = probs.mean(0)[:, :-1]          # [Q, C]
        flat = cls_mean.reshape(-1)
        k = min(self.topk, flat.size)
        top_idx = np.argsort(-flat)[:k]
        q_idx = top_idx // cls_mean.shape[1]
        labels = top_idx % cls_mean.shape[1]
        scores = flat[top_idx]

        ori_size = (record["height"], record["width"])
        pred_masks = [
            [self._finalize_mask(masks[f, q], size, ori_size) for f in range(t)]
            for q in q_idx
        ]
        return {
            "image_size": ori_size,
            "pred_scores": scores.tolist(),
            "pred_labels": labels.tolist(),
            "pred_masks": pred_masks,
        }
