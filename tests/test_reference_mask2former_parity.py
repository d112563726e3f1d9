"""Mask2Former masked-attention decoder parity against the ACTUAL reference.

Loads the verbatim reference MultiScaleMaskedTransformerDecoder
(projects/InstMove/MinVIS_motion/mask2former/modeling/transformer_decoder/
mask2former_transformer_decoder.py:208) on CPU, exports its state_dict,
imports it through checkpoint/torch_import.convert_mask2former_decoder, and
asserts the per-layer class logits and mask logits match our
MaskedTransformerDecoder — including the attention-mask thresholding
(sigmoid < 0.5 on the bilinearly-resized mask logits) and the
fully-masked-query unmask rule (reference :398).

Covers VERDICT round-3 item 5 (the masked-attention decoder was previously
tested only against this repo's own expectations). Writing this test exposed
a real divergence: Mask2Former's PositionEmbeddingSine uses the plain-cumsum
convention (no -0.5 shift), unlike IDOL's; sine_position_embedding grew an
``offset`` knob and mask2former.py now passes offset=1.0.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = (
    "/root/reference/projects/InstMove/MinVIS_motion/mask2former/modeling/"
    "transformer_decoder"
)

HIDDEN = 256
NHEADS = 8
FFN = 2048
DEC_LAYERS = 9   # reference cfg DEC_LAYERS=10 minus 1 (from_config :354)
QUERIES = 100
CLASSES = 25
MASK_DIM = 256
SHAPES = [(4, 6), (8, 12), (16, 24)]   # coarsest first (res5, res4, res3), reference top-down order
MASK_HW = (32, 48)                     # stride 4


def _install_stubs():
    if "fvcore" not in sys.modules or not hasattr(
        sys.modules.get("fvcore", None), "nn"
    ):
        fv = sys.modules.setdefault("fvcore", types.ModuleType("fvcore"))
        fvnn = sys.modules.setdefault("fvcore.nn", types.ModuleType("fvcore.nn"))
        fv.nn = fvnn
    fvnn = sys.modules["fvcore.nn"]
    if not hasattr(fvnn, "weight_init"):
        wi = types.ModuleType("fvcore.nn.weight_init")

        def c2_xavier_fill(module):
            torch.nn.init.kaiming_uniform_(module.weight, a=1)
            if module.bias is not None:
                torch.nn.init.constant_(module.bias, 0)

        wi.c2_xavier_fill = c2_xavier_fill
        wi.c2_msra_fill = c2_xavier_fill
        fvnn.weight_init = wi
        sys.modules["fvcore.nn.weight_init"] = wi

    d2 = sys.modules.setdefault("detectron2", types.ModuleType("detectron2"))
    if "detectron2.config" not in sys.modules:
        d2c = types.ModuleType("detectron2.config")

        def configurable(init_func=None, *, from_config=None):
            # direct-kwargs construction only: pass through unchanged
            if init_func is not None:
                return init_func
            return lambda f: f

        d2c.configurable = configurable
        d2.config = d2c
        sys.modules["detectron2.config"] = d2c
    if "detectron2.layers" not in sys.modules:
        d2l = types.ModuleType("detectron2.layers")
        d2l.Conv2d = torch.nn.Conv2d
        d2.layers = d2l
        sys.modules["detectron2.layers"] = d2l
    if "detectron2.utils" not in sys.modules:
        d2u = types.ModuleType("detectron2.utils")
        d2.utils = d2u
        sys.modules["detectron2.utils"] = d2u
    if "detectron2.utils.registry" not in sys.modules:
        d2r = types.ModuleType("detectron2.utils.registry")

        class Registry:
            def __init__(self, name):
                self._name = name
                self._map = {}

            def register(self, obj=None):
                if obj is None:
                    return lambda o: self._map.setdefault(o.__name__, o) or o
                self._map[obj.__name__] = obj
                return obj

            def get(self, name):
                return self._map[name]

            def __call__(self, obj):
                return self.register(obj)

        d2r.Registry = Registry
        sys.modules["detectron2.utils"].registry = d2r
        sys.modules["detectron2.utils.registry"] = d2r


@pytest.fixture(scope="module")
def ref_decoder_cls():
    _install_stubs()
    if "m2f_td_ref" not in sys.modules:
        pkg = types.ModuleType("m2f_td_ref")
        pkg.__path__ = [REF]
        pkg.__package__ = "m2f_td_ref"
        sys.modules["m2f_td_ref"] = pkg
    from m2f_td_ref import mask2former_transformer_decoder as m

    return m.MultiScaleMaskedTransformerDecoder


def test_mask2former_decoder_parity(ref_decoder_cls):
    torch.manual_seed(4)
    ref = ref_decoder_cls(
        in_channels=HIDDEN, mask_classification=True, num_classes=CLASSES,
        hidden_dim=HIDDEN, num_queries=QUERIES, nheads=NHEADS,
        dim_feedforward=FFN, dec_layers=DEC_LAYERS, pre_norm=False,
        mask_dim=MASK_DIM, enforce_input_project=False,
    )
    ref.eval()

    rng = np.random.RandomState(0)
    feats = [rng.randn(2, HIDDEN, h, w).astype(np.float32) for h, w in SHAPES]
    mask_features = rng.randn(2, MASK_DIM, *MASK_HW).astype(np.float32)

    with torch.no_grad():
        out = ref(
            [torch.from_numpy(f) for f in feats],
            torch.from_numpy(mask_features),
        )
    ref_logits = [a["pred_logits"] for a in out["aux_outputs"]] + [out["pred_logits"]]
    ref_masks = [a["pred_masks"] for a in out["aux_outputs"]] + [out["pred_masks"]]
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.torch_import import (
        apply_to_params,
        convert_mask2former_decoder,
    )
    from vnext_tpu.models.mask2former import MaskedTransformerDecoder

    ours = MaskedTransformerDecoder(
        num_classes=CLASSES, hidden_dim=HIDDEN, num_queries=QUERIES,
        n_heads=NHEADS, dim_feedforward=FFN, dec_layers=DEC_LAYERS,
        dtype=jnp.float32,
    )
    multi_scale = [jnp.moveaxis(jnp.asarray(f), 1, 3) for f in feats]
    mf = jnp.moveaxis(jnp.asarray(mask_features), 1, 3)
    image_sizes = jnp.asarray([[MASK_HW[0] * 4, MASK_HW[1] * 4]] * 2, jnp.int32)

    variables = ours.init(
        {"params": jax.random.PRNGKey(0)}, multi_scale, mf, image_sizes, False
    )
    flat = convert_mask2former_decoder(sd, dec_layers=DEC_LAYERS)
    params, report = apply_to_params(flat, variables["params"])
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing"], report["missing"]
    assert not report["unused"], report["unused"]

    pred_logits, pred_masks, _ = ours.apply(
        {"params": params}, multi_scale, mf, image_sizes, False
    )

    assert len(pred_logits) == DEC_LAYERS + 1 == len(ref_logits)
    for l in range(DEC_LAYERS + 1):
        d_cls = float(np.max(np.abs(np.asarray(pred_logits[l]) - ref_logits[l].numpy())))
        d_msk = float(np.max(np.abs(np.asarray(pred_masks[l]) - ref_masks[l].numpy())))
        # f32 accumulation wobble compounds across layers; a genuine semantic
        # divergence (wrong pe convention, wrong attn-mask rule) shows up
        # orders of magnitude above these bounds
        assert d_cls < 2e-4, (l, d_cls)
        assert d_msk < 2e-3, (l, d_msk)
