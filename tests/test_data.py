import numpy as np
import pytest

from vnext_tpu.data import (
    DatasetCatalog,
    MetadataCatalog,
    TrainingSampler,
    build_vis_train_loader,
    register_ytvis_instances,
)
from vnext_tpu.data.dataset_mapper import YTVISDatasetMapper
from vnext_tpu.data.synthetic import make_image_loader, make_synthetic_videos
from vnext_tpu.data.transforms import (
    ClipAugmentation,
    HFlipTransform,
    get_resize_shortest_edge,
)
import random


@pytest.fixture(scope="module")
def synth():
    records, store = make_synthetic_videos(num_videos=3, length=6, height=120, width=160, seed=3)
    return records, make_image_loader(store)


def _mapper(loader, is_train=True):
    return YTVISDatasetMapper(
        is_train=is_train,
        min_sizes=(96,),
        max_size=160,
        crop_type=None,
        max_insts=8,
        target_size=(96, 128),
        image_loader=loader,
    )


def test_mapper_shapes_and_consistency(synth):
    records, loader = synth
    mapper = _mapper(loader)
    out = mapper(records[0], random.Random(0))
    for frame in ("key", "ref"):
        f = out[frame]
        assert f["image"].shape == (96, 128, 3) and f["image"].dtype == np.uint8
        assert f["labels"].shape == (8,)
        assert f["boxes"].shape == (8, 4)
        assert f["masks_s4"].shape == (8, 24, 32)
        assert f["valid"].dtype == bool
    assert out["key"]["valid"].sum() >= 1
    # boxes of valid instances are normalized cxcywh within [0, 1]
    v = out["key"]["valid"]
    assert (out["key"]["boxes"][v] >= 0).all() and (out["key"]["boxes"][v] <= 1).all()
    # a valid instance has a nonempty stride-4 mask
    assert out["key"]["masks_s4"][v].sum(axis=(1, 2)).min() > 0


def test_mapper_mask_box_agreement(synth):
    """The stride-4 mask bounding box should roughly agree with the gt box."""
    records, loader = synth
    mapper = _mapper(loader)
    out = mapper(records[0], random.Random(1))
    f = out["key"]
    h, w = f["size"]
    for slot in np.flatnonzero(f["valid"]):
        mask = f["masks_s4"][slot]
        ys, xs = np.nonzero(mask)
        cx, cy, bw, bh = f["boxes"][slot]
        mcx = (xs.mean() * 4 + 2) / w
        mcy = (ys.mean() * 4 + 2) / h
        assert abs(mcx - cx) < 0.15 and abs(mcy - cy) < 0.15


def test_mapper_ref_valid_subset_of_key(synth):
    records, loader = synth
    mapper = _mapper(loader)
    for seed in range(5):
        out = mapper(records[1], random.Random(seed))
        assert not (out["ref"]["valid"] & ~out["key"]["valid"]).any()


def test_train_loader_batches(synth):
    records, loader = synth
    mapper = _mapper(loader)
    it = build_vis_train_loader(
        dataset_dicts=records, mapper=mapper, batch_size=2, seed=0
    )
    batch = next(iter(it))
    assert batch["key_image"].shape == (2, 96, 128, 3)
    assert batch["ref_image"].shape == (2, 96, 128, 3)
    assert batch["key_boxes"].shape == (2, 8, 4)
    assert batch["key_masks_s4"].shape == (2, 8, 24, 32)


def test_training_sampler_sharding():
    s0 = TrainingSampler(10, seed=1, shard_index=0, num_shards=2)
    s1 = TrainingSampler(10, seed=1, shard_index=1, num_shards=2)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(5)]
    b = [next(it1) for _ in range(5)]
    assert sorted(a + b) == list(range(10))


def test_resize_shortest_edge_geometry():
    t = get_resize_shortest_edge(480, 640, 240, 1000)
    assert (t.new_h, t.new_w) == (240, 320)
    t = get_resize_shortest_edge(480, 640, 480, 500)  # max_size caps
    assert max(t.new_h, t.new_w) <= 500


def test_hflip_boxes():
    t = HFlipTransform(100)
    out = t.apply_box(np.asarray([[10.0, 5.0, 30.0, 25.0]]))
    np.testing.assert_allclose(out, [[70, 5, 90, 25]])


def test_catalog_registration(tmp_path, synth):
    records, _ = synth
    import json

    gt = {
        "videos": [{"id": r["video_id"], "height": r["height"], "width": r["width"],
                    "length": r["length"], "file_names": [f.split("//")[-1] for f in r["file_names"]]}
                   for r in records],
        "annotations": [],
        "categories": [{"id": 1, "name": "thing"}],
    }
    p = tmp_path / "test.json"
    p.write_text(json.dumps(gt))
    name = "test_ytvis_synth"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    register_ytvis_instances(name, {"thing_classes": ["thing"]}, str(p), str(tmp_path))
    loaded = DatasetCatalog.get(name)
    assert len(loaded) == 3
    assert MetadataCatalog.get(name).thing_classes == ["thing"]
    assert loaded[0]["length"] == 6
