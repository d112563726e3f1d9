"""ResNeXt / DCN ResNet stages / RegNet backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.backbones.regnet import RegNet, generate_regnet_params
from vnext_tpu.models.backbones.resnet import ResNet


def test_regnet_param_generation():
    widths, depths, gws = generate_regnet_params(38.65, 96, 2.43, 23, 40)
    assert len(widths) == 4 and sum(depths) == 23
    assert all(w % g == 0 for w, g in zip(widths, gws))
    # widths strictly increase per stage
    assert all(a < b for a, b in zip(widths, widths[1:]))


@pytest.mark.parametrize("variant", ["RegNetX-400MF", "RegNetY-400MF"])
def test_regnet_forward(variant):
    model = RegNet(variant=variant)
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()
    out = jax.jit(lambda v: model.apply(v, x))(params)
    assert set(out) == {"res2", "res3", "res4", "res5"}
    for i, k in enumerate(["res2", "res3", "res4", "res5"]):
        s = 4 * 2**i
        assert out[k].shape[1] == 64 // s and out[k].shape[2] == 64 // s
        assert out[k].shape[3] == model.output_channels[k]
    if variant.startswith("RegNetY"):
        flat = jax.tree_util.tree_leaves_with_path(params)
        assert any("se" in jax.tree_util.keystr(p) for p, _ in flat)


def test_resnext_widths():
    model = ResNet(depth=50, groups=32, width_per_group=4,
                   out_features=("res2", "res5"))
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()["params"]
    # ResNeXt-50 32x4d: stage-1 bottleneck width 128 (vs 64 vanilla)
    assert params["layer1_0"]["conv1"]["kernel"].shape[-1] == 128
    # grouped conv2: kernel in-channels = width / groups
    assert params["layer1_0"]["conv2"]["kernel"].shape[2] == 128 // 32
    out = jax.jit(lambda p: model.apply({"params": p}, x))(params)
    assert out["res5"].shape == (1, 1, 1, 2048)


def test_dcn_resnet_stage():
    model = ResNet(depth=50, out_features=("res2", "res5"),
                   deform_on_per_stage=(False, False, True, True),
                   deform_modulated=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), x))()["params"]
    # deform stages carry offset conv + explicit weight instead of conv2
    assert "conv2_offset" in params["layer3_0"] and "conv2_weight" in params["layer3_0"]
    assert "conv2" in params["layer1_0"] and "conv2_offset" not in params["layer1_0"]
    # modulated: 27 offset channels (18 offsets + 9 mask logits)
    assert params["layer3_0"]["conv2_offset"]["kernel"].shape[-1] == 27
    out = jax.jit(lambda p: model.apply({"params": p}, x))(params)
    assert np.isfinite(np.asarray(out["res5"])).all()
    # zero-init offsets -> DCN == plain conv with the same weight at init,
    # so outputs must be non-degenerate (residual path keeps signal)
    assert float(jnp.abs(out["res5"]).max()) > 0


def test_stride_in_1x1_parity_shape():
    a = ResNet(depth=50, stride_in_1x1=True, out_features=("res5",))
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(lambda: a.init(jax.random.PRNGKey(0), x))()
    out = jax.jit(lambda v: a.apply(v, x))(params)
    assert out["res5"].shape == (1, 1, 1, 2048)
