"""Evaluation protocols: distributed final_test, per-epoch validation,
SCUBA / HAT harnesses.

ref: engine/engine_for_slot.py:217-367 (validation/final_test/scene eval),
utils/eval/run_scuba.py (SCUBA runner), utils/eval/hat_eval.py +
count_hat_acc.py (HAT splits + averaging).

All functions take a `forward_fn(videos) -> logits` (a jitted closure over
the model+params built by the caller), a DataLoader, and behave like the
reference: per-host result files + host-0 merge.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from devias_tpu.eval.merge import merge_results, write_result_file


def _pad_batch(videos: np.ndarray, batch_size: int):
    """Pad the last partial batch so jit sees one static shape; returns
    (padded, n_real)."""
    n = videos.shape[0]
    if n == batch_size:
        return videos, n
    pad = np.repeat(videos[-1:], batch_size - n, axis=0)
    return np.concatenate([videos, pad], axis=0), n


def _pipelined(loader, dispatch):
    """Double-buffered protocol loop: dispatch batch i's device work, then
    harvest batch i-1's results while i computes. A per-batch
    jax.device_get right after the forward serializes the logits download
    with the next batch's compute — measured ~80 ms/batch (~18% of the
    eval batch wall) on the relay; over PCIe the same overlap hides the
    copy entirely. Yields (device_get(handles), meta) in loader order, so
    callers see identical values to the serial loop."""
    pending = None
    for batch in loader:
        nxt = dispatch(batch)
        if pending is not None:
            yield jax.device_get(pending[0]), pending[1]
        pending = nxt
    if pending is not None:
        yield jax.device_get(pending[0]), pending[1]


def validation_one_epoch(loader, forward_fn, batch_size: int) -> Dict[str, float]:
    """ref engine_for_slot.py:217-253: top-1/top-5 over center views."""
    correct1 = correct5 = total = 0
    loss_sum = 0.0

    def dispatch(batch):
        videos, n = _pad_batch(batch["videos"], batch_size)
        return forward_fn(videos), (batch, n)

    for out, (batch, n) in _pipelined(loader, dispatch):
        logits = np.asarray(out)[:n]
        labels = np.asarray(batch["labels"])[:n]
        order = np.argsort(-logits, axis=-1)
        correct1 += int((order[:, 0] == labels).sum())
        correct5 += int((order[:, :5] == labels[:, None]).any(axis=1).sum())
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        loss_sum += float(-logp[np.arange(n), labels].sum())
        total += n
    return {
        "acc1": correct1 / max(total, 1) * 100,
        "acc5": correct5 / max(total, 1) * 100,
        "loss": loss_sum / max(total, 1),
    }


def final_test(
    loader,
    forward_fn,
    batch_size: int,
    output_dir: str,
    rank: int = 0,
    scene_label_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """ref engine_for_slot.py:256-307 (+310-367 when scene_label_fn given):
    run every (chunk, split) view, dump '<rank>.txt', return running acc.
    scene_label_fn(videos) -> teacher logits; when given, targets are the
    teacher argmax and `forward_fn` should return the scene logit slice."""
    ids: List[str] = []
    all_logits: List[np.ndarray] = []
    labels: List[int] = []
    chunks: List[int] = []
    splits: List[int] = []
    correct1 = correct5 = total = 0

    def dispatch(batch):
        videos, n = _pad_batch(batch["videos"], batch_size)
        handles = (
            forward_fn(videos),
            scene_label_fn(videos) if scene_label_fn is not None else None,
        )
        return handles, (batch, n)

    for (out, teacher_out), (batch, n) in _pipelined(loader, dispatch):
        logits = np.asarray(out)[:n]
        if teacher_out is not None:
            target = np.asarray(teacher_out)[:n].argmax(axis=-1)
        else:
            target = np.asarray(batch["labels"])[:n]
        ids.extend(batch["video_id"][:n])
        all_logits.append(logits)
        labels.extend(target.tolist())
        chunks.extend(np.asarray(batch["chunk"])[:n].tolist())
        splits.extend(np.asarray(batch["split"])[:n].tolist())
        order = np.argsort(-logits, axis=-1)
        correct1 += int((order[:, 0] == target).sum())
        correct5 += int((order[:, :5] == target[:, None]).any(axis=1).sum())
        total += n

    acc1 = correct1 / max(total, 1) * 100
    acc5 = correct5 / max(total, 1) * 100
    os.makedirs(output_dir, exist_ok=True)
    write_result_file(
        os.path.join(output_dir, f"{rank}.txt"),
        ids, np.concatenate(all_logits, axis=0) if all_logits else np.zeros((0, 1)),
        labels, chunks, splits, header=f"{acc1}, {acc5}",
    )
    if jax.process_count() > 1:
        # all hosts must have written their result files before rank 0
        # merges (the reference's dist.barrier, ref run_slot_finetuning.py:621)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("final_test_files")
    return {"acc1": acc1, "acc5": acc5}


# ---------------------------------------------------------------------------
# SCUBA (ref utils/eval/run_scuba.py)
# ---------------------------------------------------------------------------

def run_scuba(
    make_loader: Callable,
    forward_fn,
    batch_size: int,
    output_dir: str,
    scuba_variants: Sequence[str] = ("vqgan", "places365", "sinusoidal"),
    bg_forward_fn=None,
    bg_scene_label_fn=None,
    num_tasks: int = 1,
    rank: int = 0,
) -> Dict[str, Dict[str, float]]:
    """For each SCUBA background variant: build the test loader (caller maps
    variant -> DataConfig, forcing 2x3 views as the reference does,
    ref run_scuba.py:19), final_test + merge into scuba/<variant>/log.txt.

    When bg_forward_fn is given, also run the BG (scene) test on the same
    dataset — scene logits scored against the teacher's argmax pseudo label
    (ref run_scuba.py:62-79, the test_scene_func branch the multi-task CLI
    uses) — into scuba/<variant>_bg."""
    results = {}
    for variant in scuba_variants:
        loader = make_loader(variant)
        vdir = os.path.join(output_dir, "scuba", variant)
        final_test(loader, forward_fn, batch_size, vdir, rank=rank)
        if rank == 0:
            top1, top5 = merge_results(vdir, num_tasks)
            results[variant] = {"acc1": top1, "acc5": top5}
            with open(os.path.join(vdir, "log.txt"), "w") as f:
                f.write(json.dumps({"Final top-1": top1, "Final Top-5": top5}) + "\n")
        if bg_forward_fn is not None:
            bdir = os.path.join(output_dir, "scuba", f"{variant}_bg")
            final_test(make_loader(variant), bg_forward_fn, batch_size, bdir,
                       rank=rank, scene_label_fn=bg_scene_label_fn)
            if rank == 0:
                top1, top5 = merge_results(bdir, num_tasks)
                results[f"{variant}_bg"] = {"acc1": top1, "acc5": top5}
                with open(os.path.join(bdir, "log.txt"), "w") as f:
                    f.write(json.dumps({"Final top-1": top1, "Final Top-5": top5}) + "\n")
    return results


# ---------------------------------------------------------------------------
# HAT (ref utils/eval/hat_eval.py + count_hat_acc.py)
# ---------------------------------------------------------------------------

HAT_VERSIONS = ("far", "rand", "close")
HAT_SPLITS = (1, 2, 3)


def hat_eval(
    make_loader: Callable,
    forward_fn,
    batch_size: int,
    output_dir: str,
    versions: Sequence[str] = HAT_VERSIONS,
    num_tasks: int = 1,
    rank: int = 0,
    scene_label_fn=None,
) -> Dict[str, Dict[str, float]]:
    """For each version in {far, rand, close}: eval the 3 actionswap splits
    (make_loader(version, split) -> test DataLoader), write per-split
    log.txt, then average (ref hat_eval.py:22-79).

    scene_label_fn: when given, this is the reference's --eval_scene HAT
    variant (final_test_with_scene_label + scene_model, ref hat_eval.py:61,
    run_slot_finetuning.py:609) — forward_fn should return scene logits and
    targets come from the teacher argmax."""
    results = {}
    for ver in versions:
        per_split = []
        for split in HAT_SPLITS:
            loader = make_loader(ver, split)
            sdir = os.path.join(output_dir, "hat", ver, str(split))
            final_test(loader, forward_fn, batch_size, sdir, rank=rank,
                       scene_label_fn=scene_label_fn)
            if rank == 0:
                top1, top5 = merge_results(sdir, num_tasks)
                with open(os.path.join(sdir, "log.txt"), "w") as f:
                    f.write(json.dumps({"Final top-1": top1, "Final Top-5": top5}) + "\n")
                per_split.append((top1, top5))
        if rank == 0:
            results[ver] = count_hat_acc(per_split)
    return results


def count_hat_acc(per_split) -> Dict[str, float]:
    """Mean over the 3 splits (ref count_hat_acc.py:5-20)."""
    top1 = float(np.mean([x[0] for x in per_split]))
    top5 = float(np.mean([x[1] for x in per_split]))
    return {"acc1": top1, "acc5": top5}
