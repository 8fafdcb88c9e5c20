"""Mid-training kill + --auto_resume trajectory equivalence (VERDICT r4
item 6b): a real `run_slot_finetuning` process is SIGKILLed mid-training,
relaunched with the same flags, and the resumed run's per-epoch training
trajectory and final checkpoint must match an uninterrupted run
bit-for-bit (log records round to 6 decimals; params compared exactly).

This is the crash-consistency tier the in-process smoke tests cannot
cover: orbax checkpoint finalization must survive a hard kill, and the
resume path must reproduce the optimizer/EMA/rng/data-order state an
uninterrupted run would have had (rng is fold_in(seed, step)-derived,
shuffles are seed+epoch-keyed, synthetic clips are crc32-seeded — all
process-independent by construction).

ref semantics: utils/utils.py:467-517 (auto_load_model max-epoch scan).
"""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_kill_resume_worker.py")

EPOCHS = 4


def _flags(filelist_dir, out_dir):
    return [
        "--synthetic_data", "--smoke_tiny", "--batch_size", "4",
        "--epochs", str(EPOCHS), "--max_steps_per_epoch", "3",
        "--num_frames", "8", "--sampling_rate", "2", "--input_size", "32",
        "--short_side_size", "32", "--test_num_segment", "1",
        "--test_num_crop", "1", "--num_workers", "2", "--seed", "42",
        "--warmup_epochs", "0", "--drop_path", "0.0",
        "--save_ckpt_freq", "1", "--disable_eval_during_finetuning",
        "--data_path", filelist_dir, "--data_set", "UCF101",
        "--nb_classes", "5", "--num_latents", "2", "--agg_depth", "2",
        "--mask_model", "FAME", "--beta", "0.25",
        "--output_dir", out_dir,
    ]


def _spawn(filelist_dir, out_dir, tag):
    env = {k: v for k, v in os.environ.items()}
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # stdout to a file, not a PIPE: a full pipe buffer would block the
    # child and the kill would land at a deterministic-looking but wrong
    # place (we never drain it while polling)
    log = open(os.path.join(out_dir, f"stdout_{tag}.log"), "w")
    p = subprocess.Popen(
        [sys.executable, WORKER] + _flags(filelist_dir, out_dir),
        env=env, stdout=log, stderr=subprocess.STDOUT, text=True,
    )
    p._logfile = log
    return p


def _stdout_tail(p, out_dir):
    p._logfile.close()
    name = os.path.basename(p._logfile.name)
    with open(os.path.join(out_dir, name)) as f:
        return f.read()[-2000:]


def _log_records(out_dir):
    recs = []
    with open(os.path.join(out_dir, "log.txt")) as f:
        for line in f:
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                continue  # torn final line of a SIGKILLed writer
    return [r for r in recs if "epoch" in r and "train_loss" in r]


def _final_params(out_dir):
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.join(out_dir, "ckpt")
    steps = sorted(
        int(d) for d in os.listdir(ckpt_dir) if d.isdigit()
        and os.path.isdir(os.path.join(ckpt_dir, d))
    )
    assert steps and steps[-1] == EPOCHS - 1, steps
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.join(os.path.abspath(ckpt_dir), str(steps[-1]), "state")
        )


@pytest.fixture(scope="module")
def filelist_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("fl")
    (d / "train.csv").write_text("\n".join(f"v{i}.mp4 {i % 5}" for i in range(16)))
    (d / "val.csv").write_text("\n".join(f"w{i}.mp4 {i % 5}" for i in range(8)))
    (d / "test.csv").write_text("\n".join(f"w{i}.mp4 {i % 5}" for i in range(4)))
    return str(d)


@pytest.mark.slow
def test_kill_resume_trajectory_equivalence(filelist_dir, tmp_path):
    out_a = str(tmp_path / "uninterrupted")
    out_b = str(tmp_path / "killed")
    os.makedirs(out_a)
    os.makedirs(out_b)

    # uninterrupted reference run
    p = _spawn(filelist_dir, out_a, "full")
    p.wait(timeout=900)
    assert p.returncode == 0, _stdout_tail(p, out_a)
    recs_a = _log_records(out_a)
    assert [r["epoch"] for r in recs_a] == list(range(EPOCHS))

    # run to be killed: wait until at least one finalized epoch checkpoint
    # exists (orbax writes <step>/ atomically: tmp dir + rename), then
    # SIGKILL while later epochs are still training
    p = _spawn(filelist_dir, out_b, "killed")
    ckpt_dir = os.path.join(out_b, "ckpt")
    deadline = time.monotonic() + 900
    killed = False
    while time.monotonic() < deadline:
        if p.poll() is not None:
            break  # finished before we could kill it — flags too fast
        done = [d for d in (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else [])
                if d.isdigit()]
        if done and max(int(d) for d in done) >= 1:
            os.kill(p.pid, signal.SIGKILL)
            killed = True
            break
        time.sleep(0.2)
    p.wait(timeout=60)
    assert killed, "run finished before the kill; slow the flags down"
    assert p.returncode != 0  # died by SIGKILL, not clean exit
    recs_partial = _log_records(out_b)
    assert 0 < len(recs_partial) < EPOCHS  # genuinely mid-training

    # relaunch with identical flags: --auto_resume (default on) must pick
    # up the newest finalized checkpoint and continue
    p = _spawn(filelist_dir, out_b, "resumed")
    p.wait(timeout=900)
    assert p.returncode == 0, _stdout_tail(p, out_b)

    # trajectory equivalence: the resumed run's epochs must match the
    # uninterrupted run's SAME epochs on every logged train metric
    # (loss, per-part losses, grad_norm, class_acc — 6-decimal rounding)
    recs_b = {r["epoch"]: r for r in _log_records(out_b)}
    resumed_epochs = [e for e in range(EPOCHS) if e > recs_partial[-1]["epoch"]]
    assert resumed_epochs, "resume re-trained nothing"
    for r_a in recs_a:
        e = r_a["epoch"]
        assert e in recs_b, f"epoch {e} missing after resume"
        for k, v in r_a.items():
            if k.startswith("train_") and k != "train_time_s":  # wall clock
                assert recs_b[e][k] == pytest.approx(v, rel=1e-5, abs=1e-6), (e, k)

    # final checkpoints identical leaf by leaf (params, opt_state, EMA, step)
    tree_a = _final_params(out_a)
    tree_b = _final_params(out_b)
    leaves_a, treedef_a = _flatten(tree_a)
    leaves_b, treedef_b = _flatten(tree_b)
    assert treedef_a == treedef_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def _flatten(tree):
    import jax

    return jax.tree.flatten(tree)
