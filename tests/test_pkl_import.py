"""Caffe2/detectron2 ``.pkl`` weight import (round-5 verdict item 4).

The reference's default ImageNet inits (``detectron2://…/R-50.pkl``,
configs/idol/coco_pretrain/r50_coco_sequence.yaml WEIGHTS) are PLAIN pickles —
either Caffe2 blob dicts (c2 names, folded BN) or d2-format zoo dicts — not
torch.save archives. This exercises checkpoint/torch_import.load_torch_state_dict's
pkl branch + convert_c2_names against the VERBATIM d2 ResNet:

  torch d2 ResNet-50 (real reference code) --export--> synthetic caffe2 pkl
  --our pkl loader--> flax params --forward--> stage outputs == torch's.

Reference behavior anchors: detection_checkpoint.py:59 _load_file,
c2_model_loading.py:10 convert_basic_c2_names, batch_norm.py:67 (missing
running stats default to 0/1).
"""

import pickle
import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
import flax.linen as nn

from test_reference_backbone_parity import _build_d2, d2_resnet  # noqa: F401

from vnext_tpu.checkpoint.torch_import import (
    convert_c2_names,
    detect_checkpoint_family,
    load_reference_weights,
    load_torch_state_dict,
)

_BRANCH = {"conv1": "branch2a", "conv2": "branch2b", "conv3": "branch2c"}


def _d2_to_c2_name(k: str) -> str:
    """Inverse of the c2->d2 renaming, for synthesizing test fixtures."""
    k = (k.replace("stem.conv1.norm.weight", "res_conv1_bn_s")
          .replace("stem.conv1.norm.bias", "res_conv1_bn_b")
          .replace("stem.conv1.", "conv1_"))
    m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)(\.norm)?\.(weight|bias)$", k)
    if m:
        s, b, mod, isnorm, kind = m.groups()
        branch = "branch1" if mod == "shortcut" else _BRANCH[mod]
        suffix = ("bn_" + {"weight": "s", "bias": "b"}[kind]) if isnorm else {
            "weight": "w", "bias": "b"}[kind]
        return f"res{s}_{b}_{branch}_{suffix}"
    return k.replace(".weight", "_w").replace(".bias", "_b").replace(".", "_")


class _BackboneOnly(nn.Module):
    depth: int = 50

    @nn.compact
    def __call__(self, x):
        from vnext_tpu.models.backbones.resnet import ResNet

        return ResNet(
            depth=self.depth, out_features=("res2", "res3", "res4", "res5"),
            stride_in_1x1=True, dtype=jnp.float32, name="backbone",
        )(x)


def _folded_d2_model(d2_resnet, seed=7):
    """Verbatim d2 R-50 with random weights and IDENTITY running stats — the
    state a caffe2-folded pkl reconstructs to on both frameworks."""
    ref = _build_d2(d2_resnet, 50, True, seed=seed)
    with torch.no_grad():
        for name, b in ref.named_buffers():
            if name.endswith("running_mean"):
                b.zero_()
            elif name.endswith("running_var"):
                b.fill_(1.0)
    return ref


def _c2_blobs(ref):
    blobs = {}
    for k, v in ref.state_dict().items():
        if k.endswith(("running_mean", "running_var")):
            continue  # caffe2 pkls are BN-folded: no running stats shipped
        blobs[_d2_to_c2_name(k)] = v.detach().numpy()
    # classification-head leftovers + solver state a real c2 pkl carries
    blobs["fc1000_w"] = np.zeros((1000, 2048), np.float32)
    blobs["fc1000_b"] = np.zeros((1000,), np.float32)
    blobs["conv1_w_momentum"] = np.zeros((64, 3, 7, 7), np.float32)
    return blobs


def test_c2_name_roundtrip():
    sd = convert_c2_names({
        "conv1_w": np.zeros(1), "res_conv1_bn_s": np.zeros(1),
        "res_conv1_bn_b": np.zeros(1), "res2_0_branch2a_w": np.zeros(1),
        "res2_0_branch2a_bn_s": np.zeros(1), "res2_0_branch1_w": np.zeros(1),
        "res5_2_branch2c_bn_b": np.zeros(1),
        "fpn_inner_res2_2_sum_lateral_w": np.zeros(1),
        "fpn_res5_2_sum_b": np.zeros(1),
    })
    for want in (
        "stem.conv1.weight", "stem.conv1.norm.weight", "stem.conv1.norm.bias",
        "res2.0.conv1.weight", "res2.0.conv1.norm.weight",
        "res2.0.shortcut.weight", "res5.2.conv3.norm.bias",
        "fpn_lateral2.weight", "fpn_output5.bias",
        # synthesized identity stats for folded BNs
        "stem.conv1.norm.running_mean", "res2.0.conv1.norm.running_var",
    ):
        assert want in sd, (want, sorted(sd))


@pytest.mark.parametrize("fmt", ["caffe2_raw", "caffe2_blobs", "d2_zoo"])
def test_pkl_import_stage_parity(d2_resnet, fmt, tmp_path):
    ref = _folded_d2_model(d2_resnet)
    if fmt == "d2_zoo":
        # torchvision-converted zoo format: d2 names under "model"
        payload = {
            "model": {k: v.detach().numpy() for k, v in ref.state_dict().items()},
            "__author__": "torchvision", "matching_heuristics": True,
        }
    elif fmt == "caffe2_blobs":
        payload = {"blobs": _c2_blobs(ref)}
    else:
        payload = _c2_blobs(ref)
    path = str(tmp_path / "r50.pkl")
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=2)

    sd = load_torch_state_dict(path)
    assert detect_checkpoint_family(sd) == "d2_backbone"

    model = _BackboneOnly(depth=50)
    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params, report = load_reference_weights(path, params)
    assert report["matched"] > 100, report["matched"]
    assert not report["missing"], report["missing"][:5]
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    # only the classification fc may go unused
    assert all("fc1000" in ".".join(k) for k in report["unused"]), report["unused"]

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = model.apply({"params": params}, jnp.asarray(x))
    for stage in ("res2", "res5"):
        a = np.asarray(ours[stage]).transpose(0, 3, 1, 2)
        b = ref_out[stage].numpy()
        scale = max(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5, err_msg=stage)


def test_zero_match_raises(d2_resnet, tmp_path):
    """A checkpoint that matches nothing must raise, not silently no-op."""
    path = str(tmp_path / "junk.pkl")
    with open(path, "wb") as f:
        pickle.dump({"totally_unrelated_w": np.zeros((3, 3), np.float32)}, f, 2)
    model = _BackboneOnly(depth=18)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(ValueError, match="matched 0"):
        load_reference_weights(path, params)
