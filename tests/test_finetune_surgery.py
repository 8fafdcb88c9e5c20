"""End-to-end --finetune path: export a torch .pth, load it through the
CLI surgery (prefix strip, head handling), verify weights landed."""

import numpy as np
import jax
import jax.numpy as jnp

from devias_tpu.ckpt.torch_export import save_torch_checkpoint
from devias_tpu.cli.common import finetune_surgery
from devias_tpu.data.loader import device_prefetch
from devias_tpu.nn import create_model

TINY = dict(depth=2, embed_dim=64, num_heads=4)


class _Args:
    finetune = ""


def test_finetune_surgery_loads_backbone(tmp_path):
    # donor: plain ViT trained on 7 classes
    donor = create_model("vit_base_patch16_224", num_classes=7, **TINY)
    x = jnp.zeros((1, 4, 32, 32, 3))
    donor_params = donor.init({"params": jax.random.PRNGKey(5)}, x)["params"]
    pth = str(tmp_path / "donor.pth")
    save_torch_checkpoint(pth, donor_params, "plain")

    # recipient: slot model with a different head width
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2,
        agg_weights_tie=True, **TINY,
    )
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]

    args = _Args()
    args.finetune = pth
    merged, report = finetune_surgery(args, "slot", params, 5 + 4)
    # backbone transferred from the donor
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["blocks_0"]["attn"]["qkv_kernel"]),
        np.asarray(donor_params["backbone"]["blocks_0"]["attn"]["qkv_kernel"]),
    )
    # donor head (7 classes != 9) dropped; fresh slot head kept
    np.testing.assert_allclose(
        np.asarray(merged["head"]["kernel"]), np.asarray(params["head"]["kernel"])
    )
    # model still runs
    out = model.apply({"params": merged}, x)
    assert np.isfinite(np.asarray(out["slots_head"])).all()


def test_device_prefetch_order_and_content():
    batches = [{"videos": np.full((2, 3), i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b["videos"]).ravel()[0]) == i
        assert isinstance(b["videos"], jax.Array)


def test_convert_checkpoint_roundtrip(tmp_path):
    """torch -> orbax -> torch through the conversion CLI."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from devias_tpu.cli.convert_checkpoint import main as convert

    donor = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2,
        agg_weights_tie=True, **TINY,
    )
    x = jnp.zeros((1, 4, 32, 32, 3))
    params = donor.init({"params": jax.random.PRNGKey(3)}, x)["params"]
    pth_in = str(tmp_path / "in.pth")
    save_torch_checkpoint(pth_in, params, "slot", agg_depth=2)

    common = [
        "--model_kind", "slot", "--nb_classes", "5", "--num_scene_classes", "4",
        "--num_latents", "2", "--agg_depth", "2", "--agg_weights_tie",
        "--depth", "2", "--embed_dim", "64", "--num_heads", "4",
        "--num_frames", "4", "--input_size", "32",
    ]
    orbax_dir = str(tmp_path / "orbax")
    convert(["to_orbax", "--input", pth_in, "--output", orbax_dir] + common)
    pth_out = str(tmp_path / "out.pth")
    convert(["to_torch", "--input", orbax_dir, "--output", pth_out] + common)

    import torch
    a = torch.load(pth_in, weights_only=False)["model"]
    b = torch.load(pth_out, weights_only=False)["model"]
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k].numpy(), b[k].numpy(), rtol=1e-6, err_msg=k)


def test_compare_results_cli(tmp_path, capsys):
    from devias_tpu.cli.compare_results import main as compare
    from devias_tpu.eval.merge import write_result_file

    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(); d2.mkdir()
    logits = np.asarray([[3.0, 0.0], [0.0, 3.0]])
    write_result_file(str(d1 / "0.txt"), ["v1", "v2"], logits, [0, 1], [0, 0], [0, 0])
    write_result_file(str(d2 / "0.txt"), ["v1", "v2"], logits + 1e-5, [0, 1], [0, 0], [0, 0])
    delta = compare([str(d1), str(d2)])
    assert delta < 1e-9
    out = capsys.readouterr().out
    assert "argmax agreement: 100.00%" in out
