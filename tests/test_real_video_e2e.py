"""End-to-end on real encoded video: native FFmpeg decode -> samplers ->
RandAugment -> FAME -> train/val/test/merge through the flagship CLI; and a
semantic check that FAME saliency actually finds the moving foreground."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def real_videos(tmp_path_factory):
    root = tmp_path_factory.mktemp("vids")
    fl = tmp_path_factory.mktemp("fl")
    rng = np.random.default_rng(0)
    rows_train, rows_val = [], []
    for i in range(12):
        name = f"clip{i}.mp4"
        w = cv2.VideoWriter(
            str(root / name), cv2.VideoWriter_fourcc(*"mp4v"), 25, (160, 128)
        )
        base = rng.integers(0, 200, (128, 160, 3), np.uint8)
        for t in range(80):
            f = base.copy()
            x = (t * 2 + i * 10) % 140
            f[40:80, x : x + 20] = 255  # moving block = "action"
            w.write(f)
        w.release()
        (rows_train if i < 8 else rows_val).append(f"{name} {i % 4}")
    (fl / "train.csv").write_text("\n".join(rows_train))
    (fl / "val.csv").write_text("\n".join(rows_val))
    (fl / "test.csv").write_text("\n".join(rows_val))
    return {"root": str(root), "fl": str(fl)}


def test_cli_trains_on_real_videos(real_videos, tmp_path):
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    main(get_args([
        "--data_path", real_videos["fl"], "--data_prefix", real_videos["root"],
        "--data_set", "UCF101", "--nb_classes", "4",
        "--smoke_tiny", "--batch_size", "4", "--epochs", "1",
        "--num_frames", "8", "--sampling_rate", "4", "--input_size", "64",
        "--short_side_size", "64", "--num_latents", "2", "--agg_depth", "2",
        "--agg_weights_tie", "--mask_model", "FAME", "--beta", "0.25",
        "--test_num_segment", "2", "--test_num_crop", "2",
        "--output_dir", str(tmp_path), "--num_workers", "2", "--no_save_ckpt",
        "--warmup_epochs", "0", "--drop_path", "0.0", "--max_steps_per_epoch", "2",
    ]))
    assert os.path.exists(tmp_path / "log.txt")
    assert os.path.exists(tmp_path / "test" / "0.txt")


def test_fame_mask_finds_moving_foreground():
    """A bright block moving over a static background must dominate the
    FAME foreground mask (temporal-difference saliency + color refinement,
    ref utils/transform/fame.py:87-95)."""
    from devias_tpu.aug.fame import FAMEConfig, compute_fame_masks

    rng = np.random.default_rng(1)
    T, H, W = 8, 64, 64
    base = rng.uniform(0.1, 0.5, size=(H, W, 3)).astype(np.float32)
    clip = np.repeat(base[None], T, axis=0).copy()
    truth = np.zeros((H, W), bool)
    for t in range(T):
        x = 8 + t * 4
        clip[t, 24:40, x : x + 8] = 1.0
        truth[24:40, 8 : 8 + T * 4 + 8] = True  # swept region
    video = jnp.asarray(clip[None])  # [1,T,H,W,3], already in [0,1]

    mask, _ = compute_fame_masks(video, FAMEConfig(beta=0.25))
    mask = np.asarray(mask[0]) > 0.5
    # most of the selected foreground lies on the swept band
    precision = (mask & truth).sum() / max(mask.sum(), 1)
    assert precision > 0.5, precision
