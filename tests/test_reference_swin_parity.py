"""Swin backbone import parity against the ACTUAL reference Swin code.

Round-3 verdict item: no test imports a reference-format Swin state_dict,
yet Swin-L is the top-AP config (projects/IDOL/IDOL.md:36). This test loads
the REAL reference file (projects/IDOL/idol/backbone/swin.py executes
verbatim; only its unimportable deps — timm, detectron2.modeling — are
stubbed), builds a small SwinTransformer with RANDOM weights, pushes the
torch state_dict through checkpoint/torch_import._convert_swin_backbone,
and diffs every stage output (res2..res5) against our flax SwinTransformer.
Random (not pretrained) weights mean any qkv transpose, relative-position
indexing, window/shift, or LayerNorm-placement mismatch cannot hide.
"""

import importlib.util
import math
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

SWIN_PATH = "/root/reference/projects/IDOL/idol/backbone/swin.py"


def _load_ref_swin():
    # --- stub timm.models.layers (DropPath inert at eval; helpers trivial)
    timm = sys.modules.setdefault("timm", types.ModuleType("timm"))
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, std=1.0, **kw):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.update(
        {"timm.models": timm_models, "timm.models.layers": timm_layers}
    )

    # --- stub detectron2.modeling (registry + Backbone base + ShapeSpec)
    d2 = sys.modules.setdefault("detectron2", types.ModuleType("detectron2"))
    modeling = types.ModuleType("detectron2.modeling")

    class _Registry:
        def register(self, obj=None):
            return obj if obj is not None else (lambda o: o)

    class Backbone(torch.nn.Module):
        pass

    class ShapeSpec:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    modeling.BACKBONE_REGISTRY = _Registry()
    modeling.Backbone = Backbone
    modeling.ShapeSpec = ShapeSpec
    d2.modeling = modeling
    sys.modules["detectron2.modeling"] = modeling

    spec = importlib.util.spec_from_file_location("ref_idol_swin", SWIN_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_idol_swin"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_swin():
    return _load_ref_swin()


def _randomize(model, seed):
    """Random weights at fan-in scale so activations stay O(1)."""
    rng = np.random.RandomState(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim > 1:
                fan_in = int(np.prod(p.shape[1:]))
                std = 1.0 / max(math.sqrt(fan_in), 1.0)
                p.copy_(torch.from_numpy(
                    rng.randn(*p.shape).astype(np.float32) * std))
            elif "bias" in name:
                p.copy_(torch.from_numpy(
                    rng.randn(*p.shape).astype(np.float32) * 0.05))
            else:  # LayerNorm weight
                p.copy_(torch.from_numpy(
                    (1.0 + rng.randn(*p.shape) * 0.1).astype(np.float32)))
        # relative position bias tables: full-scale noise (pure additive bias)
        for name, p in model.named_parameters():
            if "relative_position_bias_table" in name:
                p.copy_(torch.from_numpy(
                    rng.randn(*p.shape).astype(np.float32) * 0.5))
    model.eval()
    return model


@pytest.mark.parametrize(
    "hw", [(64, 96), (60, 92)]  # patch-aligned AND ragged (pad path in both impls)
)
def test_ref_swin_stage_parity(ref_swin, hw):
    import jax
    import jax.numpy as jnp

    from vnext_tpu.checkpoint.torch_import import (
        _convert_swin_backbone,
        apply_to_params,
    )
    from vnext_tpu.models.backbones.swin import SwinTransformer

    depths, heads, embed = (2, 2, 2, 2), (2, 4, 8, 8), 32
    ref = ref_swin.SwinTransformer(
        embed_dim=embed, depths=list(depths), num_heads=list(heads),
        window_size=7, drop_path_rate=0.0, ape=False,
    )
    _randomize(ref, seed=7)

    h, w = hw
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, h, w).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x))

    sd = {"bb." + k: v.detach().numpy() for k, v in ref.state_dict().items()}
    flat = {}
    _convert_swin_backbone("bb", sd, flat)
    flat = {k[1:]: v for k, v in flat.items()}  # strip ("backbone", ...) prefix

    model = SwinTransformer(
        embed_dim=embed, depths=depths, num_heads=heads, window_size=7,
        drop_path_rate=0.0, dtype=jnp.float32,
    )
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), x_nhwc)["params"]
    params, report = apply_to_params(flat, params)
    assert not report["shape_mismatch"], report["shape_mismatch"]
    assert not report["missing"], report["missing"]
    assert not report["unused"], report["unused"]

    ours = model.apply({"params": params}, x_nhwc)
    for stage in ("res2", "res3", "res4", "res5"):
        a = np.asarray(ours[stage]).transpose(0, 3, 1, 2)
        b = ref_out[stage].numpy()
        assert a.shape == b.shape, (stage, a.shape, b.shape)
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, atol=3e-5, err_msg=stage
        )
