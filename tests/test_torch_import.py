"""Torch checkpoint import: synthetic round-trip.

Builds a fake reference-format state_dict (torch naming + layouts) from a tiny
IDOL param tree by inverting the documented conversions, then checks the importer
reproduces every leaf exactly (the analogue of c2_model_loading's key-alignment
tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from vnext_tpu.checkpoint.torch_import import apply_to_params, convert_idol_checkpoint

from _tiny_idol import make_model, random_targets, H, W


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _torch_name(path):
    """Invert the importer's mapping for the module families used by tiny-IDOL."""
    p = list(path)
    if p[0] == "backbone":
        if p[1] == "conv1":
            return "detr.detr.backbone.0.backbone.stem.conv1.weight", "conv"
        if p[1] == "bn1":
            return f"detr.detr.backbone.0.backbone.stem.conv1.norm.{p[2]}", "raw"
        if p[1].startswith("layer"):
            stage = int(p[1][5]) + 1
            block = p[1].split("_")[1]
            mod = p[2]
            base = f"detr.detr.backbone.0.backbone.res{stage}.{block}"
            if mod.startswith("conv"):
                return f"{base}.{mod}.weight", "conv"
            if mod.startswith("bn"):
                return f"{base}.conv{mod[2]}.norm.{p[3]}", "raw"
            if mod == "downsample_conv":
                return f"{base}.shortcut.weight", "conv"
            if mod == "downsample_bn":
                return f"{base}.shortcut.norm.{p[3]}", "raw"
    if p[0].startswith("input_proj_"):
        i = p[0].split("_")[-1]
        if p[1] == "conv":
            return f"detr.detr.input_proj.{i}.0.{'weight' if p[2]=='kernel' else 'bias'}", (
                "conv" if p[2] == "kernel" else "raw"
            )
        return f"detr.detr.input_proj.{i}.1.{'weight' if p[2]=='scale' else 'bias'}", "raw"
    if p[0] == "transformer":
        t = "detr.detr.transformer"
        if p[1] == "level_embed":
            return f"{t}.level_embed", "raw"
        if p[1] == "reference_points":
            return f"{t}.reference_points.{'weight' if p[2]=='kernel' else 'bias'}", (
                "linear" if p[2] == "kernel" else "raw"
            )
        if p[1].startswith("encoder_") or p[1].startswith("decoder_"):
            kind, i = p[1].split("_")
            base = f"{t}.{kind}.layers.{i}"
            mod = p[2]
            if mod in ("self_attn", "cross_attn") and kind == "encoder" or mod == "cross_attn":
                leaf = "weight" if p[4] == "kernel" else "bias"
                return f"{base}.{mod}.{p[3]}.{leaf}", ("linear" if leaf == "weight" else "raw")
            if mod == "self_attn" and kind == "decoder":
                return None, None  # packed qkv handled separately
            if mod.startswith("norm"):
                return f"{base}.{mod}.{'weight' if p[3]=='scale' else 'bias'}", "raw"
            if mod.startswith("linear"):
                leaf = "weight" if p[3] == "kernel" else "bias"
                return f"{base}.{mod}.{leaf}", ("linear" if leaf == "weight" else "raw")
        if p[1].startswith("bbox_embed_"):
            i = p[1].split("_")[-1]
            j = p[2].split("_")[-1]
            leaf = "weight" if p[3] == "kernel" else "bias"
            return f"detr.detr.bbox_embed.{i}.layers.{j}.{leaf}", (
                "linear" if leaf == "weight" else "raw"
            )
    if p[0].startswith("class_embed_"):
        i = p[0].split("_")[-1]
        leaf = "weight" if p[1] == "kernel" else "bias"
        return f"detr.detr.class_embed.{i}.{leaf}", ("linear" if leaf == "weight" else "raw")
    if p[0] == "query_embed":
        return "detr.detr.query_embed.weight", "raw"
    if p[0] == "controller":
        j = p[1].split("_")[-1]
        leaf = "weight" if p[2] == "kernel" else "bias"
        return f"detr.controller.layers.{j}.{leaf}", ("linear" if leaf == "weight" else "raw")
    if p[0] == "reid_embed":
        j = p[1].split("_")[-1]
        leaf = "weight" if p[2] == "kernel" else "bias"
        return f"detr.reid_embed_head.layers.{j}.{leaf}", ("linear" if leaf == "weight" else "raw")
    if p[0] == "mask_head":
        leaf = "weight" if p[2] == "kernel" else "bias"
        return f"detr.mask_head.{p[1]}.{leaf}", ("conv" if leaf == "weight" else "raw")
    return None, None


def test_import_roundtrip_exact():
    import jax.numpy as jnp

    model = make_model()
    img = jnp.zeros((1, H, W, 3))
    sz = jnp.asarray([[H, W]], jnp.int32)
    t = random_targets(np.random.RandomState(0))
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            img, sz, img, sz, t, t, train=False,
        )["params"]
    )()

    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))
    rng = np.random.RandomState(42)
    fresh = {k: rng.randn(*v.shape).astype(np.float32) for k, v in flat.items()}

    sd = {}
    unmapped = []
    for path, arr in fresh.items():
        name, kind = _torch_name(path)
        if name is None:
            unmapped.append(path)
            continue
        if kind == "conv":
            sd[name] = np.ascontiguousarray(arr.transpose(3, 2, 0, 1))
        elif kind == "linear":
            sd[name] = np.ascontiguousarray(arr.T)
        else:
            sd[name] = arr
    # decoder self-attn packed qkv
    for i in range(2):
        base = ("transformer", f"decoder_{i}", "self_attn")
        ws, bs = [], []
        for proj in ("q_proj", "k_proj", "v_proj"):
            ws.append(fresh[base + (proj, "kernel")].T)
            bs.append(fresh[base + (proj, "bias")])
        sd[f"detr.detr.transformer.decoder.layers.{i}.self_attn.in_proj_weight"] = np.concatenate(ws)
        sd[f"detr.detr.transformer.decoder.layers.{i}.self_attn.in_proj_bias"] = np.concatenate(bs)
        sd[f"detr.detr.transformer.decoder.layers.{i}.self_attn.out_proj.weight"] = fresh[
            base + ("out_proj", "kernel")
        ].T
        sd[f"detr.detr.transformer.decoder.layers.{i}.self_attn.out_proj.bias"] = fresh[
            base + ("out_proj", "bias")
        ]

    converted = convert_idol_checkpoint(sd, dec_layers=2, enc_layers=1)
    new_params, report = apply_to_params(converted, params)
    assert not report["shape_mismatch"], report["shape_mismatch"][:5]
    # every leaf we generated a torch tensor for must import exactly
    new_flat = _flatten(jax.tree_util.tree_map(np.asarray, new_params))
    # every leaf (incl. the packed decoder self-attn) must import exactly
    for path, arr in fresh.items():
        np.testing.assert_array_equal(new_flat[path], arr, err_msg=str(path))
    assert report["matched"] == len(fresh)
    assert len(report["missing"]) == 0, report["missing"][:10]


def test_checkpoint_family_detection():
    """load_reference_weights routes each release format to its converter."""
    from vnext_tpu.checkpoint.torch_import import detect_checkpoint_family

    minvis = {"backbone.stem.conv1.weight": None,
              "sem_seg_head.pixel_decoder.transformer.level_embed": None,
              "sem_seg_head.predictor.query_feat.weight": None}
    seqformer = {"detr.detr.transformer.decoder.layers.0.cross_attn.output_proj_box.weight": None,
                 "detr.detr.transformer.level_embed": None}
    idol = {"detr.detr.transformer.decoder.layers.0.cross_attn.output_proj.weight": None,
            "detr.reid_embed_head.layers.0.weight": None}
    assert detect_checkpoint_family(minvis) == "minvis"
    assert detect_checkpoint_family(seqformer) == "seqformer"
    assert detect_checkpoint_family(idol) == "idol"
