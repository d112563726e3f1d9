"""Full-loop integration tests on synthetic data (reference analogue:
configs/quick_schedules + dev/run_instant_tests.sh — a short training run plus an
eval run with expected-result assertions, here as ordinary unit tests on the
virtual device mesh)."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vnext_tpu.config import add_idol_config, get_cfg
from vnext_tpu.data.build import build_vis_train_loader
from vnext_tpu.data.dataset_mapper import YTVISDatasetMapper
from vnext_tpu.data.synthetic import make_image_loader, make_synthetic_videos
from vnext_tpu.engine.train_step import TrainState, make_train_step
from vnext_tpu.engine.trainer import batch_to_model_inputs
from vnext_tpu.models import Targets
from vnext_tpu.models.criterion import default_weight_dict
from vnext_tpu.solver import build_optimizer

from _tiny_idol import make_model


@pytest.fixture(scope="module")
def pipeline():
    records, store = make_synthetic_videos(
        num_videos=2, length=4, height=100, width=140, max_objects=2, num_classes=5, seed=7
    )
    mapper = YTVISDatasetMapper(
        is_train=True, min_sizes=(64,), max_size=96, crop_type=None,
        max_insts=8, target_size=(64, 96),
        image_loader=make_image_loader(store),
    )
    loader = build_vis_train_loader(dataset_dicts=records, mapper=mapper, batch_size=2, seed=0)

    model = make_model()
    batch = next(iter(loader))
    inputs = batch_to_model_inputs(batch, (123.7, 116.3, 103.5), (58.4, 57.1, 57.4))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *inputs, train=False,
    )["params"]
    return model, params, loader, inputs


def test_train_steps_reduce_loss(pipeline):
    model, params, loader, _ = pipeline
    cfg = get_cfg()
    add_idol_config(cfg)
    cfg.SOLVER.BASE_LR = 5e-4
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    tx = build_optimizer(cfg, params)
    step_fn = make_train_step(model, tx, default_weight_dict(dec_layers=2), donate=False)
    state = TrainState.create(params, tx)

    losses = []
    it = iter(loader)
    first_batch = next(it)
    inputs = batch_to_model_inputs(first_batch, (123.7, 116.3, 103.5), (58.4, 57.1, 57.4))
    rng = jax.random.PRNGKey(0)
    for i in range(6):
        # overfit one fixed batch: total loss must go down
        state, metrics = step_fn(state, inputs, rng)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_frozen_params_stay_fixed(pipeline):
    model, params, loader, inputs = pipeline
    cfg = get_cfg()
    add_idol_config(cfg)
    tx = build_optimizer(cfg, params)
    step_fn = make_train_step(model, tx, default_weight_dict(dec_layers=2), donate=False)
    state = TrainState.create(params, tx)
    state2, _ = step_fn(state, inputs, jax.random.PRNGKey(0))

    # FrozenBN stats and stem must be untouched; transformer must change
    before_bn = params["backbone"]["bn1"]["running_mean"]
    after_bn = state2.params["backbone"]["bn1"]["running_mean"]
    np.testing.assert_array_equal(np.asarray(before_bn), np.asarray(after_bn))
    before_stem = params["backbone"]["conv1"]["kernel"]
    after_stem = state2.params["backbone"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before_stem), np.asarray(after_stem))
    before_l1 = params["backbone"]["layer1_0"]["conv1"]["kernel"]
    after_l1 = state2.params["backbone"]["layer1_0"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(before_l1), np.asarray(after_l1))

    t_before = params["transformer"]["encoder_0"]["linear1"]["kernel"]
    t_after = state2.params["transformer"]["encoder_0"]["linear1"]["kernel"]
    assert np.abs(np.asarray(t_before) - np.asarray(t_after)).max() > 0
    # backbone layer2+ trains (with the 0.1 multiplier)
    l2_before = params["backbone"]["layer2_0"]["conv1"]["kernel"]
    l2_after = state2.params["backbone"]["layer2_0"]["conv1"]["kernel"]
    assert np.abs(np.asarray(l2_before) - np.asarray(l2_after)).max() > 0


def test_video_inference_and_evaluator(pipeline):
    """Video inference + tracker + RLE evaluator produce a structurally valid
    results.json; with an untrained model we only assert pipeline integrity."""
    model, params, _, _ = pipeline
    from vnext_tpu.data.synthetic import make_image_loader, make_synthetic_videos
    from vnext_tpu.engine.vis_inference import IDOLVideoInference

    records, store = make_synthetic_videos(
        num_videos=1, length=3, height=100, width=140, max_objects=2, num_classes=5, seed=11
    )
    runner = IDOLVideoInference(
        model, params,
        test_short_edge=64, test_max_size=96, target_size=(64, 96),
        batch_infer_len=2, inference_select_thres=0.0,
        image_loader=make_image_loader(store),
    )
    out = runner(records[0])
    assert out["image_size"] == (100, 140)
    assert len(out["pred_scores"]) == len(out["pred_labels"]) == len(out["pred_masks"])
    if out["pred_masks"]:
        inst = out["pred_masks"][0]
        assert len(inst) == 3  # one entry per frame
        present = [m for m in inst if m is not None]
        assert present and present[0].shape == (100, 140)

    # evaluator conversion
    from vnext_tpu.data import DatasetCatalog, MetadataCatalog, register_ytvis_instances
    from vnext_tpu.evaluation import YTVISEvaluator

    name = "synthetic_eval_test"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
        MetadataCatalog.remove(name)
    register_ytvis_instances(name, {"thing_classes": [str(i) for i in range(5)]},
                             "/nonexistent.json", "/nonexistent")
    ev = YTVISEvaluator(name, output_dir=None, local_eval=False)
    ev.reset()
    ev.process([records[0]], [out])
    res = ev.evaluate()
    assert res == {}
    assert all(
        set(p) == {"video_id", "score", "category_id", "segmentations"}
        for p in ev._predictions
    )
