"""Full GeneralizedRCNN TTA: merged-box mask re-run + flip-averaged masks
(reference modeling/test_time_augmentation.py:206 _inference_one_image)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.models.rcnn import GeneralizedRCNN
from vnext_tpu.models.tta import GeneralizedRCNNWithTTA


@pytest.fixture(scope="module")
def tiny_mask_rcnn():
    model = GeneralizedRCNN(
        num_classes=4, fpn_channels=32, proposals_per_image=32,
        roi_batch_per_image=16, max_detections=6, mask_on=True,
    )
    images = jnp.asarray(np.random.RandomState(0).rand(1, 64, 96, 3), jnp.float32)
    sizes = jnp.asarray([[64, 96]], jnp.int32)
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), images, sizes, method=GeneralizedRCNN.inference
        )["params"]
    )()
    return model, params, images, sizes


def test_masks_on_boxes_matches_direct(tiny_mask_rcnn):
    """Identity augmentation: TTA masks == a direct mask re-run on merged boxes."""
    model, params, images, sizes = tiny_mask_rcnn
    tta = GeneralizedRCNNWithTTA(
        model, params, sizes, min_sizes=(64,), flip=False, max_detections=6
    )
    out = tta(images)
    assert out["mask_probs"].shape[:2] == out["boxes"].shape[:2]
    direct = model.apply(
        {"params": params}, images, out["boxes"], out["classes"],
        method=GeneralizedRCNN.inference_masks_on_boxes,
    )
    assert np.allclose(np.asarray(out["mask_probs"]), np.asarray(direct), atol=1e-5)


def test_tta_remap_matches_transform_algebra(tiny_mask_rcnn):
    """The forward box remap into each augmented frame equals scale+flip
    transform algebra (reference _rescale_detected_boxes applies
    tfm.apply_box to the merged boxes). Note stride-2 convs are not exactly
    flip-equivariant (true for the reference too), so mask equality across
    flips is NOT asserted — only the geometry."""
    model, params, images, sizes = tiny_mask_rcnn
    tta = GeneralizedRCNNWithTTA(
        model, params, sizes, min_sizes=(48,), flip=True, max_detections=6
    )
    boxes = jnp.asarray([[[12.0, 8.0, 40.0, 30.0]]])
    members = list(tta._augmented_with_remap(images))
    assert len(members) == 2 and members[1][2].flipped
    h, w = images.shape[1:3]
    scale = 48 / min(h, w)
    nw = int(round(w * scale))
    plain = np.asarray(members[0][2](boxes))[0, 0]
    assert np.allclose(plain, [12 * scale, 8 * scale, 40 * scale, 30 * scale])
    flip = np.asarray(members[1][2](boxes))[0, 0]
    assert np.allclose(
        flip, [nw - 40 * scale, 8 * scale, nw - 12 * scale, 30 * scale]
    )
    # and the augmented member really is the horizontally flipped image
    assert np.allclose(
        np.asarray(members[1][0]), np.asarray(members[0][0])[:, :, ::-1], atol=1e-6
    )


def test_tta_multiscale_flip_shapes(tiny_mask_rcnn):
    model, params, images, sizes = tiny_mask_rcnn
    tta = GeneralizedRCNNWithTTA(
        model, params, sizes, min_sizes=(48, 64), flip=True, max_detections=6
    )
    out = tta(images)
    assert out["boxes"].shape == (1, 6, 4)
    assert out["mask_probs"].shape[1] == 6
    assert np.asarray(out["mask_probs"]).min() >= 0
    assert np.asarray(out["mask_probs"]).max() <= 1
