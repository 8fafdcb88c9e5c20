"""End-to-end CLI smoke tests: every entry point trains/evals a tiny model
on synthetic data (CPU, 8 virtual devices). These are the e2e regression
harness the reference lacks (SURVEY §4)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def filelists(tmp_path_factory):
    d = tmp_path_factory.mktemp("fl")
    for name, rows in (
        ("train.csv", [f"v{i}.mp4 {i % 5}" for i in range(16)]),
        ("val.csv", [f"w{i}.mp4 {i % 5}" for i in range(8)]),
        ("test.csv", [f"w{i}.mp4 {i % 5}" for i in range(8)]),
    ):
        (d / name).write_text("\n".join(rows))
    hvu = tmp_path_factory.mktemp("hvu")
    for name in ("train.csv", "val.csv"):
        (hvu / name).write_text("\n".join(f"h{i} {i % 6} {i % 3}" for i in range(16)))
    return {"plain": str(d), "hvu": str(hvu)}


BASE = [
    "--synthetic_data", "--smoke_tiny", "--batch_size", "4", "--epochs", "1",
    "--num_frames", "8", "--sampling_rate", "2", "--input_size", "32",
    "--short_side_size", "32", "--test_num_segment", "2", "--test_num_crop", "2",
    "--num_workers", "2", "--no_save_ckpt", "--warmup_epochs", "0",
    "--drop_path", "0.0", "--max_steps_per_epoch", "2",
]


def test_run_slot_finetuning_train(filelists, tmp_path):
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--agg_weights_tie", "--mask_model", "FAME", "--beta", "0.25",
        "--fsdp",  # ZeRO-3 placement through the shared loop (flag plumbing;
        # numerics covered by tests/test_fsdp.py)
        "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")
    assert os.path.exists(tmp_path / "test" / "0.txt")


def test_run_slot_finetuning_train_pp(filelists, tmp_path):
    """--pp_stages: the full slot step (backbone under the GPipe schedule,
    agg/heads/loss on full tokens) trains through the CLI, WITH the
    published stochastic regularization (drop_path) inside the pipe.
    Exactness vs unsharded is covered by tests/test_pp_full_step.py."""
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    base = [a for a in BASE]
    base[base.index("--drop_path") + 1] = "0.2"
    args = get_args(base + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--agg_weights_tie", "--mask_model", "FAME", "--beta", "0.25",
        "--pp_stages", "2", "--pp_microbatches", "2",
        "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")


def test_run_slot_finetuning_train_sp(filelists, tmp_path):
    """--sp_shards: the full slot step (backbone sequence-parallel with
    per-shard rng, agg/heads/loss on full tokens) trains through the CLI
    WITH the published stochastic regularization (drop_path). Exactness vs
    unsharded is covered by tests/test_sp_full_step.py."""
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    base = [a for a in BASE]
    base[base.index("--drop_path") + 1] = "0.2"
    args = get_args(base + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--agg_weights_tie", "--mask_model", "FAME", "--beta", "0.25",
        "--sp_shards", "2",
        "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")


def test_run_slot_finetuning_train_tp(filelists, tmp_path):
    """--tp_size: Megatron-style TP param placement (column-parallel
    QKV/MLP-up, row-parallel proj/MLP-down) trains the full slot step
    through the CLI. Exactness vs unsharded is covered by
    tests/test_tp_full_step.py."""
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--agg_weights_tie", "--mask_model", "FAME", "--beta", "0.25",
        "--tp_size", "2",
        "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")


def test_run_slot_finetuning_eval(filelists, tmp_path):
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--eval", "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "test" / "0.txt")


def test_run_class_finetuning(filelists, tmp_path):
    from devias_tpu.cli.run_class_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")


def test_run_multi_task_finetuning(filelists, tmp_path):
    from devias_tpu.cli.run_multi_task_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")


def test_run_slot_finetuning_hvu(filelists, tmp_path):
    from devias_tpu.cli.run_slot_finetuning_hvu import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["hvu"], "--data_set", "HVU",
        "--num_latents", "2", "--agg_depth", "2", "--agg_weights_tie",
        "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")


def test_eval_slot_finetuning_hvu(filelists):
    from devias_tpu.cli.eval_slot_finetuning_hvu import get_args, main

    seen = os.path.join(filelists["hvu"], "train.csv")
    unseen = os.path.join(filelists["hvu"], "val.csv")
    # two tokens — the reference's exact command shape
    # (--anno_path SEEN UNSEEN, ref docs/EVAL.md:82)
    args = get_args(BASE + [
        "--anno_path", seen, unseen,
        "--num_latents", "2", "--agg_depth", "2",
    ])
    results = main(args)
    assert set(results) == {"action_seen", "action_unseen", "scene_seen", "scene_unseen"}
    # a single quoted "SEEN UNSEEN" token keeps working
    args2 = get_args(BASE + [
        "--anno_path", f"{seen} {unseen}",
        "--num_latents", "2", "--agg_depth", "2",
    ])
    results2 = main(args2)
    assert results2 == results


def test_run_slot_downstream(filelists, tmp_path):
    from devias_tpu.cli.run_slot_downstream import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--downstream_nb_classes", "5",
        "--num_latents", "2", "--agg_depth", "2", "--agg_weights_tie",
        "--output_dir", str(tmp_path),
    ])
    main(args)
    assert os.path.exists(tmp_path / "log.txt")


def test_run_slot_finetuning_knn(filelists, tmp_path):
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    # the kNN probe tries HMDB51/UCF101/Diving-48; give it one (UCF101)
    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--run_knn", "--nb_knn", "3", "--output_dir", str(tmp_path),
    ])
    main(args)  # prints the 4-way cross matrix; must not raise


def test_run_slot_finetuning_segformer(filelists, tmp_path):
    """--mask_model Segformer end to end: random-weight b0 checkpoint saved
    in HF format, imported by the CLI, masks drive the in-step mixing."""
    torch = pytest.importorskip("torch")
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    from transformers import SegformerConfig, SegformerForSemanticSegmentation

    torch.manual_seed(0)
    hf = SegformerForSemanticSegmentation(SegformerConfig(num_labels=19))
    ckpt = tmp_path / "pytorch_model.bin"
    torch.save(hf.state_dict(), str(ckpt))

    from devias_tpu.cli.run_slot_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--agg_weights_tie", "--mask_model", "Segformer",
        "--segformer_ckpt", str(ckpt), "--segformer_variant", "b0",
        "--output_dir", str(tmp_path / "out"),
    ])
    main(args)
    assert os.path.exists(tmp_path / "out" / "log.txt")


def test_segformer_requires_ckpt(filelists, tmp_path):
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_path", filelists["plain"], "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--mask_model", "Segformer", "--output_dir", str(tmp_path),
    ])
    with pytest.raises(SystemExit):
        main(args)
