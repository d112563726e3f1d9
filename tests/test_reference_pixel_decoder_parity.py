"""MSDeformAttn pixel decoder parity against the ACTUAL reference.

Loads the verbatim reference MSDeformAttnPixelDecoder
(projects/InstMove/MinVIS_motion/mask2former/modeling/pixel_decoder/
msdeformattn.py) on CPU with its own pure-PyTorch MSDA fallback, exports the
state_dict, imports it through the pixel-decoder section of
checkpoint/torch_import.convert_minvis_checkpoint, and asserts mask features
and all three multi-scale outputs match our MSDeformAttnPixelDecoder —
pinning the top-down (res5-first) level ordering, the plain-cumsum sine
convention, the all-valid mask handling, and the bias-free FPN convs.

Together with test_reference_mask2former_parity (decoder) and
test_reference_backbone_parity (d2 ResNet) this closes the full
MinVIS/Mask2Former checkpoint-import chain.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests.test_reference_mask2former_parity import _install_stubs as _install_td_stubs

REF_MODELING = "/root/reference/projects/InstMove/MinVIS_motion/mask2former/modeling"

HIDDEN = 256
NHEADS = 8
FFN = 1024
ENC_LAYERS = 6
MASK_DIM = 256
# image 128x192 -> res2..res5 at strides 4/8/16/32
FEAT_SHAPES = {"res2": (32, 48), "res3": (16, 24), "res4": (8, 12), "res5": (4, 6)}
CHANNELS = {"res2": 256, "res3": 512, "res4": 1024, "res5": 2048}


def _install_stubs():
    _install_td_stubs()
    d2l = sys.modules["detectron2.layers"]

    class Conv2d(torch.nn.Conv2d):
        def __init__(self, *a, norm=None, activation=None, **k):
            super().__init__(*a, **k)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    class ShapeSpec:
        def __init__(self, channels=None, stride=None, height=None, width=None):
            self.channels = channels
            self.stride = stride
            self.height = height
            self.width = width

    def get_norm(norm, out_channels):
        if not norm:
            return None
        assert norm == "GN", norm
        return torch.nn.GroupNorm(32, out_channels)

    d2l.Conv2d = Conv2d
    d2l.ShapeSpec = ShapeSpec
    d2l.get_norm = get_norm

    if "detectron2.modeling" not in sys.modules:
        from detectron2.utils.registry import Registry  # the stub

        d2m = types.ModuleType("detectron2.modeling")
        d2m.SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
        sys.modules["detectron2"].modeling = d2m
        sys.modules["detectron2.modeling"] = d2m
    if "MultiScaleDeformableAttention" not in sys.modules:
        sys.modules["MultiScaleDeformableAttention"] = types.ModuleType(
            "MultiScaleDeformableAttention"
        )


@pytest.fixture(scope="module")
def ref_pixel_decoder_cls():
    _install_stubs()
    if "m2f_mod_ref" not in sys.modules:
        pkg = types.ModuleType("m2f_mod_ref")
        pkg.__path__ = [REF_MODELING]
        pkg.__package__ = "m2f_mod_ref"
        sys.modules["m2f_mod_ref"] = pkg
    from m2f_mod_ref.pixel_decoder import msdeformattn as m
    from m2f_mod_ref.pixel_decoder.ops.functions import ms_deform_attn_func as func

    msda_stub = sys.modules["MultiScaleDeformableAttention"]

    def ms_deform_attn_forward(value, shapes, level_start_index, loc, attn, step):
        shp = [(int(h), int(w)) for h, w in shapes.tolist()]
        return func.ms_deform_attn_core_pytorch(value, shp, loc, attn)

    msda_stub.ms_deform_attn_forward = ms_deform_attn_forward
    return m.MSDeformAttnPixelDecoder


def test_pixel_decoder_parity(ref_pixel_decoder_cls):
    from detectron2.layers import ShapeSpec  # the stub

    torch.manual_seed(2)
    input_shape = {
        name: ShapeSpec(channels=CHANNELS[name], stride=s)
        for name, s in (("res2", 4), ("res3", 8), ("res4", 16), ("res5", 32))
    }
    ref = ref_pixel_decoder_cls(
        input_shape=input_shape,
        transformer_dropout=0.0,
        transformer_nheads=NHEADS,
        transformer_dim_feedforward=FFN,
        transformer_enc_layers=ENC_LAYERS,
        conv_dim=HIDDEN,
        mask_dim=MASK_DIM,
        norm="GN",
        transformer_in_features=["res3", "res4", "res5"],
        common_stride=4,
    )
    ref.eval()

    rng = np.random.RandomState(0)
    feats_np = {
        name: rng.randn(2, CHANNELS[name], *hw).astype(np.float32)
        for name, hw in FEAT_SHAPES.items()
    }
    with torch.no_grad():
        mask_features, _, multi_scale = ref.forward_features(
            {k: torch.from_numpy(v) for k, v in feats_np.items()}
        )
    sd = {f"sem_seg_head.pixel_decoder.{k}": v.detach().numpy()
          for k, v in ref.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.torch_import import (
        apply_to_params,
        convert_minvis_checkpoint,
    )
    from vnext_tpu.models.mask2former import MSDeformAttnPixelDecoder

    ours = MSDeformAttnPixelDecoder(
        hidden_dim=HIDDEN, mask_dim=MASK_DIM, num_encoder_layers=ENC_LAYERS,
        n_heads=NHEADS, dtype=jnp.float32, msda_impl="jnp",
    )
    feats = {k: jnp.moveaxis(jnp.asarray(v), 1, 3) for k, v in feats_np.items()}
    image_sizes = jnp.asarray([[128, 192]] * 2, jnp.int32)
    variables = ours.init({"params": jax.random.PRNGKey(0)}, feats, image_sizes, False)

    flat = convert_minvis_checkpoint(sd, enc_layers=ENC_LAYERS)
    flat = {k[1:]: v for k, v in flat.items() if k[0] == "pixel_decoder"}
    params, report = apply_to_params(flat, variables["params"])
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing"], report["missing"]
    assert not report["unused"], report["unused"]

    our_mf, our_ms = ours.apply({"params": params}, feats, image_sizes, False)

    def diff(a, b):
        return float(np.max(np.abs(np.moveaxis(np.asarray(a), 3, 1) - b.numpy())))

    assert len(our_ms) == len(multi_scale) == 3
    for l in range(3):  # res5, res4, res3 — top-down order on both sides
        assert our_ms[l].shape[1:3] == tuple(multi_scale[l].shape[-2:]), (
            our_ms[l].shape, multi_scale[l].shape,
        )
        d = diff(our_ms[l], multi_scale[l])
        assert d < 5e-4, (l, d)
    d_mf = diff(our_mf, mask_features)
    assert d_mf < 5e-4, d_mf
