"""SemanticSegmentor / PanopticFPN fusion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.semantic_seg import (
    SemanticSegmentor,
    combine_semantic_and_instance_outputs,
)


@pytest.fixture(scope="module")
def tiny_semseg():
    model = SemanticSegmentor(num_classes=6, fpn_channels=32)
    images = jnp.zeros((1, 64, 96, 3))
    gt = jnp.zeros((1, 16, 24), jnp.int32)
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), images, gt)["params"])()
    return model, params, images


def test_semseg_loss_and_ignore(tiny_semseg):
    model, params, images = tiny_semseg
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 6, (1, 16, 24)).astype(np.int32)
    gt[0, :4] = 255  # ignore region
    loss = jax.jit(lambda p, g: model.apply({"params": p}, images, g))(params, jnp.asarray(gt))
    v = float(loss["loss_sem_seg"])
    assert np.isfinite(v) and v > 0


def test_semseg_inference_shape(tiny_semseg):
    model, params, images = tiny_semseg
    out = jax.jit(
        lambda p: model.apply({"params": p}, images, method=SemanticSegmentor.inference)
    )(params)
    assert out.shape == (1, 16, 24)
    assert int(np.asarray(out).max()) < 6


def test_panoptic_fusion():
    sem = np.zeros((20, 20), np.int32)
    sem[10:] = 3  # large stuff region
    inst_masks = np.zeros((2, 20, 20), bool)
    inst_masks[0, :8, :8] = True
    inst_masks[1, :8, :8] = True  # duplicate, lower score -> suppressed by overlap
    panoptic, segments = combine_semantic_and_instance_outputs(
        sem, inst_masks, np.asarray([0.9, 0.8]), np.asarray([1, 1]),
        stuff_area_limit=50,
    )
    thing_segs = [s for s in segments if s["isthing"]]
    stuff_segs = [s for s in segments if not s["isthing"]]
    assert len(thing_segs) == 1 and thing_segs[0]["category_id"] == 1
    assert any(s["category_id"] == 3 for s in stuff_segs)
    assert panoptic[0, 0] == thing_segs[0]["id"]
    assert panoptic[15, 15] != 0
