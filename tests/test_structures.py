import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.structures import (
    BitMasks,
    BoxMode,
    Boxes,
    ImageList,
    Instances,
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    generalized_box_iou,
    mask_iou_pairwise,
    pairwise_iou,
    polygons_to_bitmask,
)


def test_box_conversions_roundtrip():
    boxes = jnp.array([[10.0, 20.0, 30.0, 80.0], [0.0, 0.0, 5.0, 5.0]])
    cxcywh = box_xyxy_to_cxcywh(boxes)
    back = box_cxcywh_to_xyxy(cxcywh)
    np.testing.assert_allclose(np.asarray(back), np.asarray(boxes), atol=1e-5)


def test_boxmode_xywh():
    out = BoxMode.convert([[10, 10, 20, 20]], BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    assert out == [[10, 10, 30, 30]]


def test_pairwise_iou_exact():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(pairwise_iou(b1, b2))
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def test_giou_range_and_identity():
    b1 = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b2 = jnp.array([[0.0, 0.0, 10.0, 10.0], [100.0, 100.0, 110.0, 110.0]])
    g = np.asarray(generalized_box_iou(b1, b2))
    assert abs(g[0, 0] - 1.0) < 1e-6
    assert -1.0 <= g[0, 1] < 0.0


def test_boxes_wrapper_pytree():
    b = Boxes(jnp.array([[0.0, 0.0, 4.0, 4.0]]))
    (b2,) = jax.tree_util.tree_leaves(b)
    assert b2.shape == (1, 4)
    assert float(b.area()[0]) == 16.0
    clipped = b.clip((2, 3))
    np.testing.assert_allclose(np.asarray(clipped.tensor), [[0, 0, 3, 2]])


def test_instances_pad_and_valid():
    inst = Instances((32, 32), gt_classes=jnp.array([1, 2]), gt_boxes=jnp.zeros((2, 4)))
    padded = inst.pad_to(8)
    assert padded.gt_classes.shape == (8,)
    assert padded.gt_boxes.shape == (8, 4)
    assert int(padded.num_valid()) == 2
    assert bool(padded.valid[0]) and not bool(padded.valid[2])


def test_instances_pytree_through_jit():
    inst = Instances((8, 8), scores=jnp.arange(4.0), valid=jnp.array([1, 1, 0, 0], bool))

    @jax.jit
    def f(i: Instances):
        return i.scores * i.valid

    out = f(inst)
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0, 0.0])


def test_instances_field_capacity_check():
    inst = Instances((8, 8), a=jnp.zeros((4,)))
    with pytest.raises(ValueError):
        inst.b = jnp.zeros((5,))


def test_bitmasks_bounding_boxes():
    m = np.zeros((2, 16, 16), bool)
    m[0, 2:5, 3:9] = True  # y 2..4, x 3..8
    bm = BitMasks(jnp.asarray(m))
    boxes = np.asarray(bm.get_bounding_boxes())
    np.testing.assert_allclose(boxes[0], [3, 2, 9, 5])
    np.testing.assert_allclose(boxes[1], [0, 0, 0, 0])
    assert bool(bm.nonempty()[0]) and not bool(bm.nonempty()[1])


def test_polygons_to_bitmask_square():
    poly = [np.array([2, 2, 10, 2, 10, 10, 2, 10], dtype=np.float64)]
    mask = polygons_to_bitmask(poly, 16, 16)
    assert mask[5, 5] and not mask[0, 0]
    assert mask.sum() >= 64


def test_mask_iou_pairwise():
    a = np.zeros((1, 8, 8), bool)
    b = np.zeros((2, 8, 8), bool)
    a[0, :4] = True
    b[0, :4] = True
    b[1, 4:] = True
    iou = np.asarray(mask_iou_pairwise(jnp.asarray(a), jnp.asarray(b)))
    assert abs(iou[0, 0] - 1.0) < 1e-4
    assert iou[0, 1] < 1e-4


def test_image_list_padding_and_mask():
    imgs = [np.ones((30, 40, 3), np.float32), np.ones((60, 20, 3), np.float32)]
    il = ImageList.from_arrays(imgs, size_divisibility=32)
    assert il.tensor.shape == (2, 64, 64, 3)
    mask = np.asarray(il.padding_mask())
    assert not mask[0, 29, 39] and mask[0, 30, 39] and mask[0, 29, 40]
    assert not mask[1, 59, 19] and mask[1, 59, 20]


def test_image_list_fixed_target():
    imgs = [np.ones((30, 40, 3), np.float32)]
    il = ImageList.from_arrays(imgs, target_size=(128, 128))
    assert il.tensor.shape == (1, 128, 128, 3)
    with pytest.raises(ValueError):
        ImageList.from_arrays(imgs, target_size=(16, 16))


# ---- PolygonMasks / ROIMasks (reference structures/masks.py:259,464) ----


def _square_poly(x0, y0, side):
    return np.array([x0, y0, x0 + side, y0, x0 + side, y0 + side, x0, y0 + side], dtype=np.float64)


def test_polygon_masks_basic():
    from vnext_tpu.structures import PolygonMasks

    pm = PolygonMasks([[_square_poly(2, 3, 10)], [_square_poly(0, 0, 4), _square_poly(20, 20, 6)], []])
    assert len(pm) == 3
    assert pm.nonempty().tolist() == [True, True, False]
    boxes = pm.get_bounding_boxes()
    np.testing.assert_allclose(boxes[0], [2, 3, 12, 13])
    np.testing.assert_allclose(boxes[1], [0, 0, 26, 26])
    areas = pm.area()
    assert abs(areas[0] - 100.0) < 1e-6
    assert abs(areas[1] - (16.0 + 36.0)) < 1e-6
    # indexing modes: int, slice, list, bool mask, int array
    assert len(pm[0]) == 1 and len(pm[0:2]) == 2 and len(pm[[0, 2]]) == 2
    assert len(pm[np.array([True, False, True])]) == 2
    assert len(pm[np.array([1])]) == 1
    cat = PolygonMasks.cat([pm, pm[0]])
    assert len(cat) == 4
    with pytest.raises(ValueError):
        PolygonMasks([[np.array([0.0, 0.0, 1.0, 1.0])]])  # 4 coords < 6


def test_polygon_masks_crop_and_resize():
    from vnext_tpu.structures import PolygonMasks

    # A 10x10 square fully covering its own tight box rasterizes to (almost) all-ones.
    pm = PolygonMasks([[_square_poly(2, 3, 10)]])
    target = pm.crop_and_resize(np.array([[2.0, 3.0, 12.0, 13.0]]), mask_size=14)
    assert target.shape == (1, 14, 14)
    assert target.mean() > 0.9
    # A square occupying the left half of a double-width box fills ~half the target.
    target2 = pm.crop_and_resize(np.array([[2.0, 3.0, 22.0, 13.0]]), mask_size=16)
    frac = target2.mean()
    assert 0.35 < frac < 0.65
    empty = PolygonMasks([]).crop_and_resize(np.zeros((0, 4)), 14)
    assert empty.shape == (0, 14, 14)


def test_roi_masks_to_bitmasks_matches_paste():
    from vnext_tpu.structures import BitMasks, ROIMasks
    from vnext_tpu.ops.mask_ops import paste_masks_in_image

    rng = np.random.RandomState(0)
    m = jnp.asarray(rng.rand(3, 14, 14).astype(np.float32))
    boxes = jnp.asarray([[4.0, 4.0, 20.0, 18.0], [0.0, 0.0, 30.0, 30.0], [10.0, 5.0, 25.0, 28.0]])
    rm = ROIMasks(m)
    assert len(rm) == 3 and len(rm[0:2]) == 2
    bm = rm.to_bitmasks(boxes, 32, 40, threshold=0.5)
    assert isinstance(bm, BitMasks)
    ref = paste_masks_in_image(m, boxes, (32, 40), threshold=0.5)
    np.testing.assert_array_equal(np.asarray(bm.tensor), np.asarray(ref))
    # pytree round trip
    leaves, treedef = jax.tree_util.tree_flatten(rm)
    rm2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rm2.tensor.shape == (3, 14, 14)


def test_bitmasks_from_polygon_and_roi_masks():
    from vnext_tpu.structures import BitMasks, PolygonMasks, ROIMasks

    pm = PolygonMasks([[_square_poly(1, 1, 5)], [_square_poly(8, 2, 4)]])
    bm = BitMasks.from_polygon_masks(pm, 16, 16)
    assert bm.tensor.shape == (2, 16, 16)
    bb = np.asarray(bm.get_bounding_boxes())
    np.testing.assert_allclose(bb[0], [1, 1, 7, 7])
    # from raw list-of-lists too
    bm2 = BitMasks.from_polygon_masks([[_square_poly(1, 1, 5)]], 16, 16)
    assert bool(jnp.all(bm2.tensor[0] == bm.tensor[0]))
    rm = ROIMasks(jnp.ones((1, 8, 8), dtype=jnp.float32))
    bm3 = BitMasks.from_roi_masks(rm, jnp.asarray([[2.0, 2.0, 10.0, 10.0]]), 16, 16)
    assert bm3.tensor.shape == (1, 16, 16)
    assert 40 < int(bm3.tensor.sum()) < 100  # ~8x8 pasted square
