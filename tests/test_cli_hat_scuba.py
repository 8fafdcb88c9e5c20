"""CLI-level HAT / SCUBA protocol tests.

The reference drives its unseen-combination protocols through CLI flags:
--hat_eval points --hat_anno_path at ONE version dir (e.g.
filelist/hat/kinetics/far) and evaluates its 3 splits, deriving the dataset
flavor from the path (ref utils/eval/hat_eval.py:8-34); --eval_scene flips
HAT to scene logits vs the teacher argmax (ref run_slot_finetuning.py:
605-611); the multi-task CLI additionally runs both FG and BG SCUBA tests
(ref run_multi_task_finetuning.py:594). These run the real CLIs end to end
on tiny synthetic assets.
"""

import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

N_FRAMES = 16


@pytest.fixture(scope="module")
def hat_cli_assets(tmp_path_factory):
    """Reference on-disk layout: <anno>/hat/kinetics/far/actionswap_far_N
    .pickle + labels.csv two dirs up + frame/seg/inpaint dirs."""
    root = tmp_path_factory.mktemp("hatcli")
    data = root / "data"
    H, W = 64, 80

    def write_video(name, color, person_box=None, bg=False):
        fdir = data / ("inpaint/videos" if bg else "original/videos") / name
        mdir = data / "seg/videos" / name
        fdir.mkdir(parents=True, exist_ok=True)
        mdir.mkdir(parents=True, exist_ok=True)
        for i in range(N_FRAMES):
            frame = np.full((H, W, 3), color, np.uint8)
            mask = np.zeros((H, W), np.uint8)
            if person_box:
                y, x = person_box
                frame[y : y + 16, x : x + 12] = 255
                mask[y : y + 16, x : x + 12] = 255
            Image.fromarray(frame).save(fdir / f"{i+1:06d}.jpg", quality=95)
            Image.fromarray(mask).save(mdir / f"{i+1:06d}.png")

    write_video("fgvid.mp4", 30, person_box=(10, 20))
    write_video("bgvid.mp4", 200, person_box=(30, 40), bg=True)

    ver_dir = root / "filelist" / "hat" / "kinetics" / "far"
    ver_dir.mkdir(parents=True)
    (ver_dir.parent / "labels.csv").write_text("0,classA\n1,classB\n")
    anno = {"classB/fgvid.mp4": ("x/bgvid.mp4", N_FRAMES)}
    for split in (1, 2, 3):
        with open(ver_dir / f"actionswap_far_{split}.pickle", "wb") as f:
            pickle.dump(anno, f)
    return {"anno": str(ver_dir), "data": str(data)}


BASE = [
    "--smoke_tiny", "--batch_size", "4", "--epochs", "1",
    "--num_frames", "8", "--sampling_rate", "2", "--input_size", "32",
    "--short_side_size", "32", "--num_workers", "2", "--no_save_ckpt",
    "--nb_classes", "5",
]
SLOT = BASE + ["--num_latents", "2", "--agg_depth", "2"]


def _hat_logs(out_dir):
    logs = {}
    for split in (1, 2, 3):
        p = os.path.join(out_dir, "hat", "far", str(split), "log.txt")
        assert os.path.exists(p), f"missing {p}"
        logs[split] = json.loads(open(p).read().strip())
    return logs


def test_slot_cli_hat_eval_action(hat_cli_assets, tmp_path):
    """--hat_eval on a version dir: only that version's 3 splits run, the
    dataset flavor (Kinetics-HAT) comes from the path."""
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    args = get_args(SLOT + [
        "--data_set", "Kinetics-400",
        "--data_prefix", hat_cli_assets["data"],
        "--hat_eval", "--hat_anno_path", hat_cli_assets["anno"],
        "--output_dir", str(tmp_path),
    ])
    main(args)
    logs = _hat_logs(tmp_path)
    assert all("Final top-1" in v for v in logs.values())
    # no other version was evaluated (reference single-version semantics)
    assert not os.path.exists(tmp_path / "hat" / "rand")


def test_slot_cli_hat_eval_scene(hat_cli_assets, tmp_path):
    """--hat_eval --eval_scene: scene logits scored against the frozen
    teacher's argmax (ref run_slot_finetuning.py:606-609)."""
    from devias_tpu.cli.run_slot_finetuning import get_args, main

    args = get_args(SLOT + [
        "--data_set", "Kinetics-400",
        "--data_prefix", hat_cli_assets["data"],
        "--hat_eval", "--eval_scene", "--hat_anno_path", hat_cli_assets["anno"],
        "--output_dir", str(tmp_path),
    ])
    main(args)
    _hat_logs(tmp_path)
    # result files carry 365-wide scene logits (one row per view)
    from devias_tpu.eval.merge import parse_result_file

    recs = parse_result_file(str(tmp_path / "hat" / "far" / "1" / "0.txt"))
    assert recs and recs[0][1].shape[-1] == 365


def test_multi_task_cli_hat_eval(hat_cli_assets, tmp_path):
    from devias_tpu.cli.run_multi_task_finetuning import get_args, main

    args = get_args(BASE + [
        "--data_set", "Kinetics-400",
        "--data_prefix", hat_cli_assets["data"],
        "--hat_eval", "--hat_anno_path", hat_cli_assets["anno"],
        "--output_dir", str(tmp_path),
    ])
    main(args)
    _hat_logs(tmp_path)


def test_multi_task_cli_run_scuba_fg_and_bg(tmp_path, monkeypatch):
    """The MT CLI's SCUBA always runs BOTH the FG (action) and BG
    (scene-vs-teacher) tests (ref run_multi_task_finetuning.py:594,
    run_scuba.py:62-79)."""
    import devias_tpu.cli.common as common
    from devias_tpu.cli.run_multi_task_finetuning import get_args, main

    rng = np.random.default_rng(0)

    def fake_scuba_loader(args, variant):
        return [{
            "videos": rng.normal(size=(2, 8, 32, 32, 3)).astype(np.float32),
            "labels": np.asarray([1, 2]),
            "video_id": [f"{variant}_a", f"{variant}_b"],
            "chunk": np.asarray([0, 0]),
            "split": np.asarray([0, 0]),
        }]

    monkeypatch.setattr(common, "make_scuba_loader", fake_scuba_loader)
    args = get_args(BASE + [
        "--data_set", "UCF101", "--synthetic_data",
        "--run_scuba", "--output_dir", str(tmp_path),
    ])
    main(args)
    for variant in ("vqgan", "places365", "sinusoidal"):
        assert os.path.exists(tmp_path / "scuba" / variant / "log.txt")
        assert os.path.exists(tmp_path / "scuba" / f"{variant}_bg" / "log.txt")
    # BG rows are 365-wide scene logits
    from devias_tpu.eval.merge import parse_result_file

    recs = parse_result_file(str(tmp_path / "scuba" / "vqgan_bg" / "0.txt"))
    assert recs and recs[0][1].shape[-1] == 365


def test_multi_task_cli_run_knn(tmp_path, filelists=None):
    """MT --run_knn runs the 4-way probe on the CLS/scene tokens (the
    reference's own MT kNN path crashes on an arity mismatch,
    run_multi_task_finetuning.py:619)."""
    from devias_tpu.cli.run_multi_task_finetuning import get_args, main

    d = tmp_path / "fl"
    d.mkdir()
    for name in ("train.csv", "val.csv", "test.csv"):
        (d / name).write_text("\n".join(f"v{i}.mp4 {i % 5}" for i in range(8)))
    args = get_args(BASE + [
        "--data_path", str(d), "--data_set", "UCF101", "--synthetic_data",
        "--run_knn", "--nb_knn", "3",
        "--test_num_segment", "1", "--test_num_crop", "1",
        "--output_dir", str(tmp_path),
    ])
    main(args)  # must not raise; prints the cross matrix
