"""Real-model StableHLO export round trip (reference surface:
tests/test_export_torchscript.py — export a real meta-arch and compare
numerics after reload)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnext_tpu.export import export_stablehlo, load_exported, save_exported
from vnext_tpu.models.rcnn import GeneralizedRCNN
from vnext_tpu.models.retinanet import DetTargets


def test_rcnn_export_roundtrip(tmp_path):
    model = GeneralizedRCNN(
        num_classes=4, fpn_channels=32, proposals_per_image=32,
        roi_batch_per_image=16, max_detections=8,
    )
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    targets = DetTargets(
        labels=jnp.asarray([[1, 2]], jnp.int32),
        boxes=jnp.asarray([[[8, 8, 40, 40], [50, 20, 90, 60]]], jnp.float32),
        valid=jnp.asarray([[True, True]]),
    )
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), images, sizes, targets, train=False)[
            "params"
        ]
    )()

    def infer(p, im, sz):
        return model.apply({"params": p}, im, sz, targets, train=False)

    direct = infer(params, images, sizes)
    exported = export_stablehlo(infer, (params, images, sizes))
    path = str(tmp_path / "rcnn.stablehlo")
    save_exported(exported, path)
    restored = load_exported(path)
    out = restored.call(params, images, sizes)

    direct_flat, treedef_a = jax.tree.flatten(direct)
    out_flat, treedef_b = jax.tree.flatten(out)
    assert treedef_a == treedef_b
    for a, b in zip(direct_flat, out_flat):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)
