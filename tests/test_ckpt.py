"""Checkpoint layer tests: torch state-dict import mapping, merge
semantics, pos-embed interpolation, orbax save/auto-resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from devias_tpu.ckpt import (
    import_torch_state_dict,
    interpolate_pos_embed,
    save_checkpoint,
    load_checkpoint,
    auto_resume,
)
from devias_tpu.ckpt.torch_import import merge_params, strip_prefixes
from devias_tpu.nn import create_model

TINY = dict(depth=2, embed_dim=64, num_heads=4)


def _flax_to_torch_sd(params, agg_depth_stored=2):
    """Inverse of the importer mapping: build a torch-layout state dict
    from a flax slot-model tree (same key names the reference emits)."""
    sd = {}
    bb = params["backbone"]
    k = np.asarray(bb["patch_embed"]["kernel"])  # [t*p*p*C, D]
    D = k.shape[1]
    t, p, C = 2, 16, 3
    sd["patch_embed.proj.weight"] = k.reshape(t, p, p, C, D).transpose(4, 3, 0, 1, 2)
    sd["patch_embed.proj.bias"] = np.asarray(bb["patch_embed"]["bias"])
    for i, name in enumerate(n for n in bb if n.startswith("blocks_")):
        blk = bb[f"blocks_{i}"]
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.asarray(blk["norm1"]["scale"])
        sd[f"{b}.norm1.bias"] = np.asarray(blk["norm1"]["bias"])
        sd[f"{b}.norm2.weight"] = np.asarray(blk["norm2"]["scale"])
        sd[f"{b}.norm2.bias"] = np.asarray(blk["norm2"]["bias"])
        sd[f"{b}.attn.qkv.weight"] = np.asarray(blk["attn"]["qkv_kernel"]).T
        sd[f"{b}.attn.q_bias"] = np.asarray(blk["attn"]["q_bias"])
        sd[f"{b}.attn.v_bias"] = np.asarray(blk["attn"]["v_bias"])
        sd[f"{b}.attn.proj.weight"] = np.asarray(blk["attn"]["proj"]["kernel"]).T
        sd[f"{b}.attn.proj.bias"] = np.asarray(blk["attn"]["proj"]["bias"])
        sd[f"{b}.mlp.fc1.weight"] = np.asarray(blk["mlp"]["fc1"]["kernel"]).T
        sd[f"{b}.mlp.fc1.bias"] = np.asarray(blk["mlp"]["fc1"]["bias"])
        sd[f"{b}.mlp.fc2.weight"] = np.asarray(blk["mlp"]["fc2"]["kernel"]).T
        sd[f"{b}.mlp.fc2.bias"] = np.asarray(blk["mlp"]["fc2"]["bias"])
    sd["norm.weight"] = np.asarray(bb["norm"]["scale"])
    sd["norm.bias"] = np.asarray(bb["norm"]["bias"])

    agg = params["agg_block"]
    sd["agg_block.latents"] = np.asarray(agg["latents"])
    for i in range(agg_depth_stored):
        j = min(i, len([n for n in agg if n.startswith("layers_")]) - 1)
        lay = agg[f"layers_{j}"]
        b = f"agg_block.layers.{i}"
        sd[f"{b}.0.norm.weight"] = np.asarray(lay["norm_q"]["scale"])
        sd[f"{b}.0.norm.bias"] = np.asarray(lay["norm_q"]["bias"])
        sd[f"{b}.0.norm_context.weight"] = np.asarray(lay["norm_context"]["scale"])
        sd[f"{b}.0.norm_context.bias"] = np.asarray(lay["norm_context"]["bias"])
        for t_name, f_name in (("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v")):
            sd[f"{b}.0.fn.{t_name}.weight"] = np.asarray(
                lay["cross_attn"][f_name]["kernel"]
            ).T
        sd[f"{b}.0.fn.to_out.0.weight"] = np.asarray(lay["cross_attn"]["to_out"]["kernel"]).T
        sd[f"{b}.0.fn.to_out.0.bias"] = np.asarray(lay["cross_attn"]["to_out"]["bias"])
        sd[f"{b}.2.norm.weight"] = np.asarray(lay["norm_ff"]["scale"])
        sd[f"{b}.2.norm.bias"] = np.asarray(lay["norm_ff"]["bias"])
        sd[f"{b}.2.fn.net.0.weight"] = np.asarray(lay["ff_fc1"]["kernel"]).T
        sd[f"{b}.2.fn.net.0.bias"] = np.asarray(lay["ff_fc1"]["bias"])
        sd[f"{b}.2.fn.net.3.weight"] = np.asarray(lay["ff_fc2"]["kernel"]).T
        sd[f"{b}.2.fn.net.3.bias"] = np.asarray(lay["ff_fc2"]["bias"])
    sd["agg_block.last_layer.0.weight"] = np.asarray(agg["last_norm"]["scale"])
    sd["agg_block.last_layer.0.bias"] = np.asarray(agg["last_norm"]["bias"])

    for f_name, idx in (("fc1", 0), ("fc2", 2), ("fc3", 4)):
        sd[f"mask_predictor.decoder.{idx}.weight"] = np.asarray(
            params["mask_predictor"][f_name]["kernel"]
        ).T
        sd[f"mask_predictor.decoder.{idx}.bias"] = np.asarray(
            params["mask_predictor"][f_name]["bias"]
        )
    sd["head.weight"] = np.asarray(params["head"]["kernel"]).T
    sd["head.bias"] = np.asarray(params["head"]["bias"])
    return sd


def test_slot_import_roundtrip():
    """torch-layout export -> import must reproduce the exact tree."""
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2,
        agg_weights_tie=True, **TINY,
    )
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    sd = _flax_to_torch_sd(params, agg_depth_stored=2)
    imported = import_torch_state_dict(sd, "slot", depth=2, agg_unique_layers=1)
    merged, report = merge_params(params, imported)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    assert len(report["loaded"]) > 20
    # forward works with merged params
    out = model.apply({"params": merged}, x)
    assert np.isfinite(np.asarray(out["slots_head"])).all()


def test_import_drops_mismatched_head():
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2, **TINY,
    )
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    sd = _flax_to_torch_sd(params)
    # pretend the ckpt head had a different class count
    sd["head.weight"] = np.zeros((7, 64), np.float32)
    sd["head.bias"] = np.zeros((7,), np.float32)
    imported = import_torch_state_dict(
        sd, "slot", depth=2, agg_unique_layers=1, expected_head_out=9
    )
    assert "head" not in imported  # dropped (ref run_slot_finetuning.py:455-458)
    merged, _ = merge_params(params, imported)
    np.testing.assert_allclose(
        np.asarray(merged["head"]["kernel"]), np.asarray(params["head"]["kernel"])
    )


def test_strip_prefixes():
    sd = {"backbone.blocks.0.norm1.weight": np.zeros(2), "encoder.x": np.ones(1), "y": np.ones(1)}
    out = strip_prefixes(sd)
    assert set(out) == {"blocks.0.norm1.weight", "x", "y"}


def test_pos_embed_interpolation():
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(8 * 4 * 4, 16)).astype(np.float32)
    same = interpolate_pos_embed(pos, 4, 4, 8)
    np.testing.assert_allclose(same, pos, atol=1e-5)
    up = interpolate_pos_embed(pos, 4, 8, 8)
    assert up.shape == (8 * 8 * 8, 16)


def test_orbax_save_and_auto_resume(tmp_path):
    import optax
    from devias_tpu.train import OptimConfig, TrainState, make_optimizer

    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx, _ = make_optimizer(params, OptimConfig(total_steps=10))
    state = TrainState.create(params, tx)
    state = state.apply_updates(jax.tree.map(lambda p: p * 0 + 0.5, params))

    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 3, state, metadata={"epoch": 3})
    template = TrainState.create(params, tx)
    restored, step = auto_resume(d, template)
    assert step == 3
    np.testing.assert_allclose(np.asarray(restored.params["w"]), np.asarray(state.params["w"]))
    assert int(restored.step) == 1

    # newer checkpoint wins
    state2 = state.apply_updates(jax.tree.map(lambda p: p * 0 + 0.25, params))
    save_checkpoint(d, 5, state2)
    _, step2 = auto_resume(d, template)
    assert step2 == 5


def test_torch_export_roundtrip():
    """export -> import -> identical tree; and the export carries the
    reference's key names."""
    from devias_tpu.ckpt.torch_export import export_torch_state_dict
    from devias_tpu.ckpt import import_torch_state_dict

    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=3,
        agg_weights_tie=True, **TINY,
    )
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    sd = export_torch_state_dict(params, "slot", agg_depth=3)
    # tied layers replicated at every index, reference-style
    assert "agg_block.layers.2.0.fn.to_q.weight" in sd
    np.testing.assert_array_equal(
        sd["agg_block.layers.0.0.fn.to_q.weight"],
        sd["agg_block.layers.2.0.fn.to_q.weight"],
    )
    assert "blocks.1.attn.q_bias" in sd and "patch_embed.proj.weight" in sd
    imported = import_torch_state_dict(sd, "slot", depth=2, agg_unique_layers=1)
    merged, report = merge_params(params, imported)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_torch_export_loads_in_torch(tmp_path):
    """The .pth must load via torch.load with the reference container."""
    import torch
    from devias_tpu.ckpt.torch_export import save_torch_checkpoint

    model = create_model(
        "vit_base_patch16_224", num_classes=5, **TINY,
    )
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    p = str(tmp_path / "export.pth")
    save_torch_checkpoint(p, params, "plain", epoch=7)
    ckpt = torch.load(p, weights_only=False)
    assert ckpt["epoch"] == 7
    assert "head.weight" in ckpt["model"]
    assert tuple(ckpt["model"]["head.weight"].shape) == (5, 64)


def test_pos_embed_interpolation_matches_reference_surgery():
    """Golden vs the reference's bicubic grid interpolation
    (ref run_slot_finetuning.py:471-497): oracle below follows that block
    line by line (B,L,C -> BT,H,W,C -> BT,C,H,W -> bicubic -> back), on a
    real size mismatch (8x8 -> 14x14 spatial, temporal axis kept), both
    with and without a prepended cls (extra) token. The repo path under
    test is the full import entry (import_torch_state_dict with
    dst_spatial/frames_tokens), not just the helper."""
    import torch
    import torch.nn.functional as TF

    from devias_tpu.ckpt import import_torch_state_dict

    rng = np.random.default_rng(11)
    T, S0, S1, D = 8, 8, 14, 32
    num_frames, tubelet = 16, 2

    def reference_oracle(pos_ckpt: np.ndarray, num_extra_tokens: int) -> np.ndarray:
        pos_embed_checkpoint = torch.from_numpy(pos_ckpt)  # [1, L, C]
        embedding_size = pos_embed_checkpoint.shape[-1]
        num_patches = (num_frames // tubelet) * S1 * S1
        orig_size = int(
            ((pos_embed_checkpoint.shape[-2] - num_extra_tokens)
             // (num_frames // tubelet)) ** 0.5
        )
        new_size = int((num_patches // (num_frames // tubelet)) ** 0.5)
        assert orig_size != new_size
        extra_tokens = pos_embed_checkpoint[:, :num_extra_tokens]
        pos_tokens = pos_embed_checkpoint[:, num_extra_tokens:]
        pos_tokens = pos_tokens.reshape(
            -1, num_frames // tubelet, orig_size, orig_size, embedding_size
        )
        pos_tokens = pos_tokens.reshape(-1, orig_size, orig_size, embedding_size).permute(0, 3, 1, 2)
        pos_tokens = TF.interpolate(
            pos_tokens, size=(new_size, new_size), mode="bicubic", align_corners=False
        )
        pos_tokens = pos_tokens.permute(0, 2, 3, 1).reshape(
            -1, num_frames // tubelet, new_size, new_size, embedding_size
        )
        pos_tokens = pos_tokens.flatten(1, 3)
        return torch.cat((extra_tokens, pos_tokens), dim=1).numpy()

    # minimal backbone checkpoint (depth 0) carrying a learnable pos_embed
    base_sd = {
        "patch_embed.proj.weight": rng.normal(size=(D, 3, tubelet, 16, 16)).astype(np.float32),
        "patch_embed.proj.bias": np.zeros(D, np.float32),
    }

    # no extra tokens (slot-model layout)
    pos = rng.normal(size=(1, T * S0 * S0, D)).astype(np.float32)
    imported = import_torch_state_dict(
        {**base_sd, "pos_embed": pos}, "backbone", depth=0,
        dst_spatial=S1, frames_tokens=T,
    )
    np.testing.assert_allclose(
        imported["backbone"]["pos_embed"], reference_oracle(pos, 0), atol=1e-6
    )

    # prepended cls token (plain-model layout): extra row passes through
    pos_cls = rng.normal(size=(1, 1 + T * S0 * S0, D)).astype(np.float32)
    imported = import_torch_state_dict(
        {
            **base_sd,
            "pos_embed": pos_cls,
            "cls_token": rng.normal(size=(1, 1, D)).astype(np.float32),
        },
        "backbone", depth=0, dst_spatial=S1, frames_tokens=T,
    )
    got = imported["backbone"]["pos_embed"]
    want = reference_oracle(pos_cls, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got)[0, 0], pos_cls[0, 0])

    # size match: untouched (the reference only interpolates on mismatch)
    pos_same = rng.normal(size=(1, T * S1 * S1, D)).astype(np.float32)
    imported = import_torch_state_dict(
        {**base_sd, "pos_embed": pos_same}, "backbone", depth=0,
        dst_spatial=S1, frames_tokens=T,
    )
    np.testing.assert_array_equal(imported["backbone"]["pos_embed"], pos_same)


def test_released_checkpoint_layout_dryrun(tmp_path):
    """Released-ckpt readiness (VERDICT r2 item 10): a synthetic state dict
    with the EXACT key layout a released DEVIAS K400 checkpoint has — the
    reference slot model class's own state_dict (full size: ViT-B depth 12,
    2 slots, tied agg depth 8) inside a DeepSpeed {'module': ...} wrapper —
    must flow through the documented convert_checkpoint runbook
    (docs/EVAL.md) with EVERY checkpoint key consumed, and round-trip
    through orbax. Catches any key-layout drift before real weights exist."""
    import torch

    from _ref_oracle import load_reference, torch_state_dict_to_numpy

    load_reference()
    from model import modeling_slot

    torch.manual_seed(0)
    net = modeling_slot.slot_vit_base_patch16_224(
        num_classes=400, num_latents=2, agg_depth=8, agg_weights_tie=True,
        slot_matching_method="matching", init_scale=0.001, all_frames=16,
        num_scene_classes=365, init_values=0.0,
    )
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in torch_state_dict_to_numpy(net).items()}
    pth = tmp_path / "released.pth"
    torch.save({"module": sd}, pth)  # DeepSpeed layout (eval_slot_finetuning_hvu.py:296-299)

    out = tmp_path / "orbax_ck"
    from devias_tpu.cli import convert_checkpoint

    convert_checkpoint.main([
        "to_orbax", "--input", str(pth), "--output", str(out),
        "--model_kind", "slot", "--nb_classes", "400", "--num_latents", "2",
        "--agg_depth", "8", "--agg_weights_tie",
    ])

    # every released key must be consumed by the importer
    from devias_tpu.ckpt import import_torch_state_dict, load_torch_checkpoint_file
    from devias_tpu.ckpt.torch_import import merge_params

    loaded_sd = load_torch_checkpoint_file(str(pth))
    assert set(loaded_sd) == {k for k in sd}
    imported = import_torch_state_dict(loaded_sd, "slot", agg_unique_layers=1)
    from devias_tpu.cli.convert_checkpoint import build_template, get_args

    params = build_template(get_args([
        "to_orbax", "--input", "x", "--output", "y", "--model_kind", "slot",
        "--nb_classes", "400", "--num_latents", "2", "--agg_depth", "8",
        "--agg_weights_tie",
    ]))
    merged, report = merge_params(params, imported)
    assert not report["unused_in_ckpt"], report["unused_in_ckpt"]

    # orbax round trip preserves the imported tensors
    from devias_tpu.ckpt import latest_checkpoint_step, load_checkpoint

    step = latest_checkpoint_step(str(out))
    restored = load_checkpoint(str(out), step, {"params": params})
    a = np.asarray(restored["params"]["head"]["kernel"])
    b = np.asarray(merged["head"]["kernel"])
    np.testing.assert_array_equal(a, b)
    w = np.asarray(restored["params"]["backbone"]["blocks_11"]["attn"]["qkv_kernel"])
    np.testing.assert_array_equal(w, sd["blocks.11.attn.qkv.weight"].numpy().T)
