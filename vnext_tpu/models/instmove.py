"""InstMove: instance-motion prediction (ConvLSTM + learned motion memory).

Capability parity with projects/InstMove/MinVIS_motion/motion_models/
model_withImgR6.py:70 (Predictor: conv mask encoder, 4-layer ConvLSTM (NPUnit,
convlstm.py:48), Memory — dual 3D-conv motion encoders + learned [M, 512] memory
with cosine addressing (:185-241), attention-gated fusion, image-conditioned
decoder with ResNet-50 skip features) — rebuilt NHWC/flax with the recurrent
rollout expressed as an unrolled scan over static sequence length.

Also provides ``motion_match_cost`` — the IoU-distance motion term MinVIS+motion
fuses into its tracking cost (video_maskformer_model.py:326: C = 1.0*cost_embd +
0.5*cost_motion).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones.resnet import ResNet

Array = jnp.ndarray


class ConvLSTMCell(nn.Module):
    """NPUnit: gates from two 3x3 convs over input and hidden (convlstm.py:48)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, h: Array, c: Array) -> Tuple[Array, Array]:
        conv = lambda name: nn.Conv(
            4 * self.out_channels, (3, 3), padding="SAME", dtype=self.dtype, name=name
        )
        xg = conv("conv_x")(x)
        hg = conv("conv_h")(h)
        xi, xc, xf, xo = jnp.split(xg, 4, axis=-1)
        hi, hc, hf, ho = jnp.split(hg, 4, axis=-1)
        it = jax.nn.sigmoid(xi + hi)
        ft = jax.nn.sigmoid(xf + hf)
        new_c = ft * c + it * jnp.tanh(xc + hc)
        ot = jax.nn.sigmoid(xo + ho)
        return ot * jnp.tanh(new_c), new_c


class ResBlock(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        conv = lambda ch, name: nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name=name)
        r = conv(self.out_channels, "conv1")(nn.relu(x))
        r = conv(self.out_channels, "conv2")(nn.relu(r))
        if x.shape[-1] != self.out_channels:
            x = conv(self.out_channels, "downsample")(x)
        return x + r


class MotionEncoder3D(nn.Module):
    """3D-conv tower over difference frames -> [B, H/16, W/16, 512] (Memory.{motion_*}_encoder)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: [B, T, H, W, 1] difference frames."""
        conv3 = lambda ch, name: nn.Conv(ch, (3, 3, 3), padding="SAME", dtype=self.dtype, name=name)
        pool = lambda x: nn.max_pool(x, (1, 2, 2), strides=(1, 2, 2))
        x = pool(nn.relu(conv3(64, "conv1")(x)))
        x = pool(nn.relu(conv3(128, "conv2")(x)))
        x = nn.relu(conv3(256, "conv3")(x))
        x = pool(nn.relu(conv3(256, "conv4")(x)))
        x = nn.relu(conv3(512, "conv5")(x))
        x = pool(nn.relu(conv3(512, "conv6")(x)))
        return jnp.mean(x, axis=1)  # AdaptiveAvgPool over T


class MotionMemory(nn.Module):
    """Learned motion memory with cosine addressing (reference Memory :185-241)."""

    memory_size: int = 100
    embed_channels: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, memory_x: Array, phase: int = 2) -> Array:
        """memory_x: [B, T, H, W, 1] mask sequence; returns [B, H/4, W/4, 128]."""
        diff = memory_x[:, 1:] - memory_x[:, :-1]
        encoder = MotionEncoder3D(
            dtype=self.dtype,
            name="motion_context_encoder" if phase == 1 else "motion_matching_encoder",
        )
        query = encoder(diff)  # [B, h, w, 512]
        b, h, w, c = query.shape
        q = query.reshape(-1, c)

        memory_w = self.param(
            "memory_w", nn.initializers.normal(1.0), (self.memory_size, 512)
        )
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        mn = memory_w / jnp.maximum(jnp.linalg.norm(memory_w, axis=1, keepdims=True), 1e-12)
        addressing = jax.nn.softmax(
            (qn @ mn.T).astype(jnp.float32), axis=1
        ).astype(self.dtype)
        feature = (addressing @ memory_w.astype(self.dtype)).reshape(b, h, w, c)

        # embedder: 2x transposed-conv upsampling to 1/4 resolution, 128 ch
        feature = nn.relu(
            nn.ConvTranspose(self.embed_channels * 2, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name="embed1")(feature)
        )
        feature = nn.relu(
            nn.ConvTranspose(self.embed_channels, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name="embed2")(feature)
        )
        return feature


class Decoder(nn.Module):
    """Image-conditioned mask decoder (reference Decoder_block :46-68)."""

    channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, img_feats: Dict[str, Array]) -> Array:
        """x: [B, H/4, W/4, C]; img_feats: res2 [B,H/4,W/4,256], res3 [B,H/8,W/8,512]."""
        from ..ops.interpolate import resize_bilinear

        ch = self.channels
        # layer_1: fuse the 1/8 skip (upsampled 2x)
        skip = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name="skip1")(
            img_feats["res3"]
        )
        skip = resize_bilinear(
            skip.transpose(0, 3, 1, 2), x.shape[1], x.shape[2]
        ).transpose(0, 2, 3, 1)
        if x.shape[-1] != ch:
            x = nn.Conv(ch, (1, 1), dtype=self.dtype, name="in_proj")(x)
        x = ResBlock(ch, dtype=self.dtype, name="res1")(x + skip)
        x = nn.elu(
            nn.ConvTranspose(ch // 2, (3, 3), strides=(2, 2), padding="SAME",
                             dtype=self.dtype, name="up_m")(x)
        )
        skip2 = nn.Conv(ch // 2, (3, 3), padding="SAME", dtype=self.dtype, name="skip2")(
            img_feats["res2"]
        )
        skip2 = resize_bilinear(
            skip2.transpose(0, 3, 1, 2), x.shape[1], x.shape[2]
        ).transpose(0, 2, 3, 1)
        x = ResBlock(ch // 2, dtype=self.dtype, name="res2")(x + skip2)
        x = nn.elu(nn.ConvTranspose(ch // 4, (3, 3), strides=(1, 1), padding="SAME",
                                    dtype=self.dtype, name="up_f1")(x))
        x = nn.elu(nn.ConvTranspose(ch // 4, (3, 3), strides=(2, 2), padding="SAME",
                                    dtype=self.dtype, name="up_f2")(x))
        return nn.ConvTranspose(1, (3, 3), strides=(1, 1), padding="SAME",
                                dtype=self.dtype, name="out")(x)


class InstMovePredictor(nn.Module):
    """Predict future instance masks from past masks + the current image."""

    memory_size: int = 100
    num_lstm_layers: int = 4
    lstm_channels: int = 128
    dtype: Any = jnp.float32

    def setup(self):
        ch = self.lstm_channels
        self.mask_encoder_convs = [
            nn.Conv(ch // 2, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype, name="enc1"),
            nn.Conv(ch // 2, (3, 3), padding="SAME", dtype=self.dtype, name="enc2"),
            nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", dtype=self.dtype, name="enc3"),
            nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype, name="enc4"),
        ]
        self.lstm_cells = [
            ConvLSTMCell(self.lstm_channels, dtype=self.dtype, name=f"convlstm_{i}")
            for i in range(self.num_lstm_layers)
        ]
        self.memory = MotionMemory(
            self.memory_size, embed_channels=self.lstm_channels, dtype=self.dtype, name="memory"
        )
        self.image_encoder = ResNet(
            depth=50, out_features=("res2", "res3"), dtype=self.dtype, name="encoder_img"
        )
        self.attn_fc1 = nn.Dense(16, dtype=self.dtype, name="attn_fc1")
        self.attn_fc2 = nn.Dense(self.lstm_channels, dtype=self.dtype, name="attn_fc2")
        self.decoder = Decoder(
            channels=2 * self.lstm_channels, dtype=self.dtype, name="decoder"
        )

    def _encode_mask(self, m: Array) -> Array:
        x = m
        for i, conv in enumerate(self.mask_encoder_convs):
            x = nn.elu(conv(x))
        return x

    def __call__(
        self,
        short_x: Array,        # [B, T, H, W, 1] past masks
        image: Array,          # [B, H, W, 3] current frame (normalized)
        out_len: int = 1,
        long_x: Optional[Array] = None,
        phase: int = 2,
    ) -> Array:
        """Returns predicted mask logits [B, out_len, H, W, 1]."""
        b, t = short_x.shape[:2]
        memory_feature = self.memory(long_x if phase == 1 else short_x, phase)
        img_feats = self.image_encoder(image)

        h_lstm = [None] * self.num_lstm_layers
        c_lstm = [None] * self.num_lstm_layers
        feat0 = self._encode_mask(short_x[:, 0])
        for i in range(self.num_lstm_layers):
            zeros = jnp.zeros_like(feat0)
            h_lstm[i], c_lstm[i] = zeros, zeros

        preds: List[Array] = []
        for step in range(t + out_len - 1):
            if step < t:
                x = self._encode_mask(short_x[:, step])
            else:
                x = self._encode_mask(jax.nn.sigmoid(preds[-1]))
            for i, cell in enumerate(self.lstm_cells):
                inp = x if i == 0 else h_lstm[i - 1]
                h_lstm[i], c_lstm[i] = cell(inp, h_lstm[i], c_lstm[i])
            if step >= t - 1:
                pooled = jnp.mean(
                    jnp.concatenate([c_lstm[-1], memory_feature], axis=-1), axis=(1, 2)
                )
                attn = jax.nn.sigmoid(self.attn_fc2(nn.relu(self.attn_fc1(pooled))))
                gated = memory_feature * attn[:, None, None, :]
                dec_in = jnp.concatenate([h_lstm[-1], gated], axis=-1)
                preds.append(self.decoder(dec_in, img_feats))

        out = jnp.stack(preds[-out_len:], axis=1)
        return out


def motion_match_cost(pred_masks: Array, cand_masks: Array, eps: float = 1e-6) -> Array:
    """[N, M] IoU-distance between motion-predicted and candidate masks.

    The MinVIS+motion fusion uses C = 1.0*cost_embd + 0.5*cost_motion
    (video_maskformer_model.py:326-338); this computes cost_motion = 1 - IoU.
    """
    p = (jax.nn.sigmoid(pred_masks) > 0.5).reshape(pred_masks.shape[0], -1).astype(jnp.float32)
    c = (jax.nn.sigmoid(cand_masks) > 0.5).reshape(cand_masks.shape[0], -1).astype(jnp.float32)
    inter = p @ c.T
    union = p.sum(1)[:, None] + c.sum(1)[None] - inter
    return 1.0 - (inter + eps) / (union + eps)


def instmove_loss(pred_logits: Array, gt_masks: Array, eps: float = 1.0) -> Dict[str, Array]:
    """InstMove training loss: BCE + dice on the predicted next-frame masks.

    Reference: projects/InstMove train recipe (model_withImgR6 trained with
    mask BCE + soft-dice against the ground-truth next mask).

    pred_logits: [B, T_out, H, W, 1]; gt_masks: same shape, {0, 1}.
    """
    gt = gt_masks.astype(jnp.float32)
    x = pred_logits.astype(jnp.float32)
    bce = jnp.maximum(x, 0) - x * gt + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p = jax.nn.sigmoid(x)
    flat_p = p.reshape(p.shape[0], -1)
    flat_g = gt.reshape(gt.shape[0], -1)
    inter = jnp.sum(flat_p * flat_g, -1)
    denom = jnp.sum(flat_p, -1) + jnp.sum(flat_g, -1)
    dice = 1.0 - (2 * inter + eps) / (denom + eps)
    return {"loss_mask": jnp.mean(bce), "loss_dice": jnp.mean(dice)}
