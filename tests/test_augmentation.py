"""Augmentation policy API tests — invertibility + coordinate propagation
(reference test patterns: tests/data/test_transforms.py)."""

import numpy as np
import pytest

from vnext_tpu.data.augmentation import (
    AugInput,
    AugmentationList,
    FixedSizeCrop,
    RandomApply,
    RandomBrightness,
    RandomCrop,
    RandomCrop_CategoryAreaConstraint,
    RandomExtent,
    RandomFlip,
    RandomLighting,
    RandomRotation,
    Resize,
    ResizeScale,
    ResizeShortestEdge,
    build_idol_augmentation,
)
from vnext_tpu.data.transforms import (
    CropTransform,
    HFlipTransform,
    NoOpTransform,
    PadTransform,
    ResizeTransform,
    RotationTransform,
    TransformList,
    VFlipTransform,
)


def _img(h=40, w=60, c=3, seed=0):
    return np.random.RandomState(seed).randint(0, 255, (h, w, c), np.uint8)


def test_flip_involution_and_coords():
    img = _img()
    t = HFlipTransform(60)
    assert np.array_equal(t.apply_image(t.apply_image(img)), img)
    pts = np.array([[10.0, 5.0], [59.0, 39.0]])
    back = t.inverse().apply_coords(t.apply_coords(pts))
    assert np.allclose(back, pts)
    tv = VFlipTransform(40)
    assert np.array_equal(tv.apply_image(tv.apply_image(img)), img)
    assert np.allclose(tv.apply_coords(np.array([[3.0, 0.0]])), [[3.0, 40.0]])


def test_resize_inverse_roundtrip():
    t = ResizeTransform(40, 60, 80, 120)
    pts = np.array([[30.0, 20.0], [0.0, 0.0], [60.0, 40.0]])
    assert np.allclose(t.inverse().apply_coords(t.apply_coords(pts)), pts)
    seg = np.zeros((40, 60), np.uint8)
    seg[10:20, 15:30] = 7
    out = t.apply_segmentation(seg)
    assert out.shape == (80, 120) and set(np.unique(out)) == {0, 7}


def test_transformlist_inverse_order():
    tl = TransformList([ResizeTransform(40, 60, 20, 30), HFlipTransform(30)])
    pts = np.array([[12.0, 34.0]])
    assert np.allclose(tl.inverse().apply_coords(tl.apply_coords(pts)), pts)


def test_crop_and_pad_coords():
    c = CropTransform(5, 7, 20, 10)
    pts = np.array([[6.0, 8.0]])
    assert np.allclose(c.apply_coords(pts), [[1.0, 1.0]])
    p = PadTransform(2, 3, 4, 5, pad_value=9, seg_pad_value=255)
    img = _img(10, 12)
    out = p.apply_image(img)
    assert out.shape == (18, 18, 3) and out[0, 0, 0] == 9
    seg = p.apply_segmentation(np.zeros((10, 12), np.uint8))
    assert seg[0, 0] == 255 and seg.shape == (18, 18)
    assert np.allclose(p.apply_coords(np.array([[0.0, 0.0]])), [[2.0, 3.0]])


def test_apply_box_under_flip():
    t = HFlipTransform(60)
    boxes = np.array([[10.0, 5.0, 20.0, 15.0]])
    out = t.apply_box(boxes)
    assert np.allclose(out, [[40.0, 5.0, 50.0, 15.0]])


def test_resize_shortest_edge_choice_and_range():
    rng = np.random.RandomState(0)
    aug = ResizeShortestEdge([32], max_size=100, sample_style="choice", rng=rng)
    ai = AugInput(_img(40, 60))
    tfm = aug(ai)
    assert ai.image.shape[:2] == (32, 48)
    aug = ResizeShortestEdge((20, 30), sample_style="range", rng=rng)
    tfm = aug.get_transform(AugInput(_img()))
    assert 20 <= min(tfm.new_h, tfm.new_w) <= 30


def test_clip_consistency_shared_draw():
    rng = np.random.RandomState(0)
    aug = ResizeShortestEdge(
        list(range(10, 200)), sample_style="choice_by_clip", clip_frame_cnt=3, rng=rng
    )
    sizes = []
    for _ in range(6):
        t = aug.get_transform(AugInput(_img()))
        sizes.append((t.new_h, t.new_w))
    assert sizes[0] == sizes[1] == sizes[2]
    assert sizes[3] == sizes[4] == sizes[5]
    flip = RandomFlip(prob=0.5, clip_frame_cnt=4, rng=np.random.RandomState(1))
    kinds = [type(flip.get_transform(AugInput(_img()))) for _ in range(8)]
    assert len(set(kinds[:4])) == 1 and len(set(kinds[4:])) == 1


def test_random_crop_types():
    rng = np.random.RandomState(3)
    for crop_type, size in (
        ("relative", (0.5, 0.5)),
        ("relative_range", (0.3, 0.3)),
        ("absolute", (10, 12)),
        ("absolute_range", (8, 16)),
    ):
        aug = RandomCrop(crop_type, size, rng=rng)
        ai = AugInput(_img())
        aug(ai)
        h, w = ai.image.shape[:2]
        assert h <= 40 and w <= 60 and h > 0 and w > 0


def test_random_crop_category_area_constraint():
    rng = np.random.RandomState(0)
    sem = np.zeros((40, 60), np.int32)
    sem[:, 30:] = 1
    aug = RandomCrop_CategoryAreaConstraint(
        "absolute", (20, 40), single_category_max_area=0.9, rng=rng
    )
    tfm = aug.get_transform(AugInput(_img(), sem_seg=sem))
    patch = sem[tfm.y0 : tfm.y0 + tfm.h, tfm.x0 : tfm.x0 + tfm.w]
    _, counts = np.unique(patch, return_counts=True)
    assert counts.max() < counts.sum() * 0.9


def test_fixed_size_crop_pads_and_crops():
    rng = np.random.RandomState(0)
    aug = FixedSizeCrop((50, 50), pad_value=3, seg_pad_value=11, rng=rng)
    ai = AugInput(_img(40, 60), sem_seg=np.zeros((40, 60), np.uint8))
    aug(ai)
    assert ai.image.shape[:2] == (50, 50)
    assert ai.sem_seg.shape == (50, 50)
    assert ai.sem_seg[-1, 0] == 11  # padded rows use seg_pad_value


def test_resize_scale_aspect_preserved():
    rng = np.random.RandomState(0)
    aug = ResizeScale(0.5, 2.0, target_height=80, target_width=120, rng=rng)
    t = aug.get_transform(AugInput(_img(40, 60)))
    assert abs(t.new_w / t.new_h - 60 / 40) < 0.05


def test_random_extent_center_mapping():
    rng = np.random.RandomState(0)
    aug = RandomExtent(scale_range=(1.0, 1.0), shift_range=(0.0, 0.0), rng=rng)
    img = _img(40, 60)
    t = aug.get_transform(AugInput(img))
    out = t.apply_image(img)
    assert out.shape[:2] == (40, 60)
    assert np.array_equal(out, img)  # identity extent
    c = t.apply_coords(np.array([[30.0, 20.0]]))
    assert np.allclose(c, [[30.0, 20.0]])


def test_rotation_no_expand_keeps_size_and_coords():
    img = _img(40, 60)
    t = RotationTransform(40, 60, 30.0, expand=False, center=(24.0, 16.0))
    out = t.apply_image(img)
    assert out.shape == img.shape
    # the rotation center maps to itself
    assert np.allclose(t.apply_coords(np.array([[24.0, 16.0]])), [[24.0, 16.0]])


def test_rotation_90_expand_coords():
    img = _img(40, 60)
    t = RotationTransform(40, 60, 90.0, expand=True)
    out = t.apply_image(img)
    assert out.shape[:2] == (60, 40)
    # top-left corner (0, 0) of a 40x60 image maps to (0, 60) under a 90° ccw
    # display rotation in y-down coords
    assert np.allclose(t.apply_coords(np.array([[0.0, 0.0]])), [[0.0, 60.0]], atol=1e-6)


def test_random_apply_prob_limits():
    aug = RandomApply(Resize((20, 20)), prob=1.0, rng=np.random.RandomState(0))
    ai = AugInput(_img())
    aug(ai)
    assert ai.image.shape[:2] == (20, 20)
    aug = RandomApply(Resize((20, 20)), prob=0.0, rng=np.random.RandomState(0))
    ai = AugInput(_img())
    tfm = aug(ai)
    assert isinstance(tfm, NoOpTransform) and ai.image.shape[:2] == (40, 60)


def test_photometric_identity_geometry():
    rng = np.random.RandomState(0)
    for aug in (RandomBrightness(0.9, 1.1, rng=rng), RandomLighting(1.0, rng=rng)):
        ai = AugInput(_img().astype(np.float32), boxes=np.array([[1.0, 2.0, 3.0, 4.0]]))
        aug(ai)
        assert np.allclose(ai.boxes, [[1.0, 2.0, 3.0, 4.0]])
        assert ai.image.shape == (40, 60, 3)


def test_build_idol_augmentation_crop_branch():
    from vnext_tpu.config import add_idol_config, get_cfg

    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.INPUT.CROP.ENABLED = True
    cfg.INPUT.AUGMENTATIONS = ["brightness", "rotation"]
    pair = build_idol_augmentation(cfg, is_train=True, rng=np.random.RandomState(0))
    assert isinstance(pair, tuple) and len(pair) == 2
    no_crop, with_crop = pair
    assert len(with_crop) == len(no_crop) + 1
    assert isinstance(with_crop[0], RandomCrop)
    test_augs = build_idol_augmentation(cfg, is_train=False)
    assert isinstance(test_augs[0], ResizeShortestEdge)


def test_aug_input_boxes_and_semseg_pipeline():
    rng = np.random.RandomState(0)
    augs = AugmentationList([
        ResizeShortestEdge([20], sample_style="choice", rng=rng),
        RandomFlip(prob=1.0, rng=rng),
    ])
    boxes = np.array([[10.0, 5.0, 20.0, 15.0]])
    sem = np.zeros((40, 60), np.uint8)
    ai = AugInput(_img(), boxes=boxes, sem_seg=sem)
    tl = augs(ai)
    assert isinstance(tl, TransformList)
    assert ai.image.shape[:2] == (20, 30) and ai.sem_seg.shape == (20, 30)
    # boxes followed the same transforms
    expect = tl.apply_box(boxes)
    assert np.allclose(ai.boxes, expect)
