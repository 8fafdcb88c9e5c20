"""Shared CLI plumbing: the reference's flag surface (names preserved so
published commands run unchanged — ref run_slot_finetuning.py:37-247), and
the builders the six entry points share (the reference duplicates ~300
lines of this per script; factored once here, SURVEY §2.4).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.data import DataConfig, DataLoader
from devias_tpu.train import OptimConfig


def build_shared_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description, add_help=False)
    # schedule / batch (ref :39-42)
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--epochs", default=30, type=int)
    p.add_argument("--update_freq", default=1, type=int)
    p.add_argument("--save_ckpt_freq", default=100, type=int)
    # model (ref :68-83)
    p.add_argument("--model", default="vit_base_patch16_224", type=str)
    p.add_argument("--tubelet_size", type=int, default=2)
    p.add_argument("--input_size", default=224, type=int)
    p.add_argument("--fc_drop_rate", type=float, default=0.0)
    p.add_argument("--drop", type=float, default=0.0)
    p.add_argument("--attn_drop_rate", type=float, default=0.0)
    p.add_argument("--drop_path", type=float, default=0.1)
    p.add_argument("--disable_eval_during_finetuning", action="store_true", default=False)
    p.add_argument("--model_ema", action="store_true", default=False)
    p.add_argument("--model_ema_decay", type=float, default=0.9999)
    # optimizer (ref :91-119)
    p.add_argument("--opt", default="adamw", type=str)
    p.add_argument("--opt_eps", default=1e-8, type=float)
    p.add_argument("--opt_betas", default=None, type=float, nargs="+")
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--weight_decay_end", type=float, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--layer_decay", type=float, default=0.75)
    p.add_argument("--warmup_lr", type=float, default=1e-6)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--warmup_steps", type=int, default=-1)
    # augmentation (ref :122-161)
    p.add_argument("--color_jitter", type=float, default=0.4)
    p.add_argument("--num_sample", type=int, default=2)
    p.add_argument("--aa", type=str, default="rand-m7-n4-mstd0.5-inc1")
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--train_interpolation", type=str, default="bicubic")
    p.add_argument("--crop_pct", type=float, default=None)
    p.add_argument("--short_side_size", type=int, default=224)
    p.add_argument("--test_num_segment", type=int, default=5)
    p.add_argument("--test_num_crop", type=int, default=3)
    p.add_argument("--reprob", type=float, default=0.25)
    p.add_argument("--remode", type=str, default="pixel")
    p.add_argument("--recount", type=int, default=1)
    p.add_argument("--resplit", action="store_true", default=False)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--cutmix_minmax", type=float, nargs="+", default=None)
    p.add_argument("--mixup_prob", type=float, default=1.0)
    p.add_argument("--mixup_switch_prob", type=float, default=0.5)
    p.add_argument("--mixup_mode", type=str, default="batch")
    # finetune / init (ref :164-168)
    p.add_argument("--finetune", default="")
    p.add_argument("--model_key", default="model|module", type=str)
    p.add_argument("--model_prefix", default="", type=str)
    p.add_argument("--init_scale", default=0.001, type=float)
    p.add_argument("--use_checkpoint", action="store_true")
    # data (ref :172-189)
    p.add_argument("--data_path", default="./filelist/k400", type=str)
    p.add_argument("--data_prefix", default="", type=str)
    p.add_argument("--anno_path", default="", type=str)
    p.add_argument("--nb_classes", default=400, type=int)
    p.add_argument("--imagenet_default_mean_and_std", default=True, action="store_true")
    p.add_argument("--num_segments", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--sampling_rate", type=int, default=4)
    p.add_argument("--data_set", default="Kinetics-400", type=str)
    p.add_argument("--synthetic_data", action="store_true", default=False,
                   help="devias_tpu extension: random frames, no video files needed")
    # run control (ref :191-228)
    p.add_argument("--output_dir", default="")
    p.add_argument("--log_dir", default=None)
    p.add_argument("--device", default="tpu")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--resume", default="")
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--no_auto_resume", action="store_false", dest="auto_resume")
    p.add_argument("--save_ckpt", action="store_true", default=True)
    p.add_argument("--no_save_ckpt", action="store_false", dest="save_ckpt")
    p.add_argument("--start_epoch", default=0, type=int)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--dist_eval", action="store_true", default=False)
    p.add_argument("--num_workers", default=10, type=int)
    p.add_argument("--pin_mem", action="store_true", default=True)
    p.add_argument("--no_pin_mem", action="store_false", dest="pin_mem")
    p.add_argument("--world_size", default=1, type=int)
    p.add_argument("--enable_deepspeed", action="store_true", default=False,
                   help="accepted for command compatibility; bf16 needs no engine")
    # torch-launcher compatibility no-ops: every reference script accepts
    # these (ref run_slot_finetuning.py:87-88,222-228); torchrun's rank env
    # and NCCL URL have no TPU analog (jax.distributed reads its own env)
    # and the EMA always lives on device here.
    p.add_argument("--model_ema_force_cpu", action="store_true", default=False,
                   help="accepted for command compatibility (no-op on TPU)")
    p.add_argument("--local_rank", "--local-rank", default=-1, type=int,
                   help="accepted for command compatibility (torchrun no-op)")
    p.add_argument("--dist_on_itp", action="store_true",
                   help="accepted for command compatibility (no-op)")
    p.add_argument("--dist_url", default="env://",
                   help="accepted for command compatibility (no-op)")
    # devias_tpu extensions
    p.add_argument("--zero1", action="store_true", default=False,
                   help="devias_tpu extension: shard AdamW moments over the "
                        "data axis (ZeRO stage-1 equivalent; cuts optimizer "
                        "memory per chip by the data-parallel degree)")
    p.add_argument("--fsdp", action="store_true", default=False,
                   help="devias_tpu extension: shard params, EMA, AND AdamW "
                        "moments over the data axis (ZeRO-3/FSDP equivalent; "
                        "implies --zero1 — XLA all-gathers each weight at its "
                        "first use and keeps only the shard resident)")
    p.add_argument("--pp_stages", default=1, type=int,
                   help="devias_tpu extension: pipeline-parallel stages — "
                        "the ViT block stack splits over a (data, pipe) "
                        "mesh with a GPipe microbatch schedule "
                        "(core/pipeline.py); agg/heads/loss run on the "
                        "full token tensor. Requires depth %% stages == 0")
    p.add_argument("--pp_microbatches", default=4, type=int,
                   help="devias_tpu extension: GPipe microbatches per "
                        "micro-step under --pp_stages (>= 4x stages keeps "
                        "the pipeline bubble under ~20%%)")
    p.add_argument("--tp_size", default=1, type=int,
                   help="devias_tpu extension: Megatron-style tensor-"
                        "parallel size — column-parallel QKV/MLP-up and "
                        "row-parallel proj/MLP-down shard over a "
                        "(data, model) mesh (params, EMA, and AdamW "
                        "moments placed by core/dist.py::tp_param_spec; "
                        "GSPMD inserts the all-reduces in the unchanged "
                        "train step)")
    p.add_argument("--sp_shards", default=1, type=int,
                   help="devias_tpu extension: sequence-parallel shards — "
                        "the backbone's frame/token axis splits over a "
                        "(data, seq) mesh (attention all_gathers K/V over "
                        "the axis; per-shard rng keeps dropout/drop_path "
                        "correct); agg/heads/loss run on the full token "
                        "tensor. Requires frames %% (shards x tubelet) == 0")
    p.add_argument("--profile_dir", default="", type=str,
                   help="devias_tpu extension: capture a jax.profiler trace "
                        "of a few steps of the first epoch into this dir")
    p.add_argument("--max_steps_per_epoch", default=0, type=int,
                   help="devias_tpu extension: cap steps/epoch (smoke runs)")
    p.add_argument("--smoke_tiny", action="store_true", default=False,
                   help="devias_tpu extension: 2-layer 64-dim model for smoke tests")
    p.add_argument("--device_normalize", action="store_true", default=False,
                   help="devias_tpu extension: ship uint8 clips, normalize on "
                        "device (4x smaller transfers; requires reprob=0)")
    return p


def tiny_overrides(args) -> dict:
    """Model kwargs for --smoke_tiny (CI / CPU smoke runs)."""
    if not getattr(args, "smoke_tiny", False):
        return {}
    return {"depth": 2, "embed_dim": 64, "num_heads": 4}


def run_train_loop(
    args,
    mesh,
    state,
    train_step,
    loader_train,
    steps_per_epoch: int,
    *,
    extra_step_args=(),
    batch_keys=("videos", "labels"),
    validate=None,
    logger: Optional["JsonlLogger"] = None,
    start_epoch: int = 0,
    on_epoch_end=None,
    print_freq: int = 50,
):
    """The ONE shared epoch loop all six CLIs use (ref engine
    train_one_epoch + the per-script loop at run_slot_finetuning.py:648-713):
    prefetched async host->device transfer, jitted step, windowed meters
    with cross-host sync, JSONL + TB logging, validation with best-ckpt
    tracking, periodic checkpointing, optional profiler capture.

    validate(state) -> metric dict (runs before checkpoint decisions).
    on_epoch_end(state, epoch, record) -> optional extra record entries.
    Returns (state, best_acc)."""
    import itertools

    from jax.sharding import NamedSharding, PartitionSpec as P

    from devias_tpu.ckpt import save_checkpoint
    from devias_tpu.data.loader import device_prefetch
    from devias_tpu.utils import MetricLogger, TensorLogger

    logger = logger or JsonlLogger(args.output_dir)
    tb = TensorLogger(args.log_dir or (os.path.join(args.output_dir, "tb") if args.output_dir else None))
    rank = jax.process_index()
    best_acc = -1.0
    rng = jax.random.PRNGKey(args.seed)
    profile_dir = getattr(args, "profile_dir", "") or ""
    profiling = False

    # place the train state across the mesh once: params replicated, and —
    # with --zero1 / --fsdp — the AdamW moments (and, for fsdp, the params
    # and EMA too) sharded over the data axis (ZeRO stage-1 / stage-3
    # equivalents, core/dist.py::shard_train_state). Batches are sharded
    # over the data axis as they are prefetched
    # (computation-follows-sharding; XLA inserts the gradient psum over ICI)
    from devias_tpu.core.dist import shard_train_state

    data_sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    state = shard_train_state(
        state, mesh,
        zero1=bool(getattr(args, "zero1", False)),
        fsdp=bool(getattr(args, "fsdp", False)),
        tp=getattr(args, "tp_size", 1) > 1,
    )

    metrics = {}
    for epoch in range(start_epoch, args.epochs):
        loader_train.set_epoch(epoch)
        meters = MetricLogger()
        t0 = time.time()
        last_print = t0

        batches = (
            {k: batch[k] for k in batch_keys}
            for batch in itertools.islice(iter(loader_train), steps_per_epoch)
        )
        it = -1
        msum, mcount = None, 0
        # async host->device: keep 2 batches in flight ahead of the step
        # (replaces the reference's pinned-memory non_blocking copies,
        # ref engine_for_slot.py:98-99)
        for it, dev_batch in enumerate(
            device_prefetch(batches, size=2, sharding=data_sharding)
        ):
            if profile_dir and epoch == start_epoch and it == 5:
                jax.profiler.start_trace(profile_dir)
                profiling = True
            state, metrics = train_step(state, *extra_step_args, dev_batch, rng)
            # device-side running sum: every step enters the epoch average
            # (ref MetricLogger updates each iteration, utils.py:39-50)
            # without adding a host sync to the loop
            msum = metrics if msum is None else jax.tree.map(jnp.add, msum, metrics)
            mcount += 1
            if profiling and it == 10:
                jax.tree.leaves(metrics)[0].block_until_ready()
                jax.profiler.stop_trace()
                profiling = False
            if it % print_freq == 0:
                # the periodic device_get is the only host sync in the loop
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                meters.update(**m)
                now = time.time()
                iter_t = (now - last_print) / (print_freq if it else 1)
                last_print = now
                print(f"epoch {epoch} it {it}/{steps_per_epoch} "
                      f"iter_time {iter_t:.3f}s  {meters}")
                if not np.isfinite(m["loss"]):
                    raise RuntimeError(f"Loss is {m['loss']}, stopping training")
        if profiling:  # short epoch ended inside the capture window
            jax.profiler.stop_trace()
            profiling = False
        # console meters stay windowed/sampled; the logged record uses the
        # exact every-step epoch average (metrics are computed inside jit
        # over the full sharded batch, so the values are already global)
        meters.synchronize_between_processes()

        record = {"epoch": epoch, "train_time_s": round(time.time() - t0, 1),
                  "n_steps": it + 1}
        if msum is not None:
            epoch_avg = {k: float(v) / mcount for k, v in jax.device_get(msum).items()}
            record.update({f"train_{k}": round(v, 6) for k, v in epoch_avg.items()})
        if validate is not None and not args.disable_eval_during_finetuning:
            val = validate(state)
            record.update({f"val_{k}": round(float(v), 3) for k, v in val.items()})
            if val.get("acc1", -1) > best_acc:
                best_acc = val["acc1"]
                if args.output_dir and args.save_ckpt and rank == 0:
                    save_checkpoint(os.path.join(args.output_dir, "ckpt_best"), epoch, state)
        if on_epoch_end is not None:
            extra = on_epoch_end(state, epoch, record)
            if extra:
                record.update(extra)
        if args.output_dir and args.save_ckpt and rank == 0 and (
            (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs
        ):
            save_checkpoint(os.path.join(args.output_dir, "ckpt"), epoch, state)
        logger.write(record)
        # TB scalars under loss/opt/perf heads (ref utils/utils.py:167-188)
        tb.update(head="train", step=epoch,
                  **{k[6:]: v for k, v in record.items() if k.startswith("train_")})
        tb.update(head="val", step=epoch,
                  **{k[4:]: v for k, v in record.items() if k.startswith("val_")})
        tb.update(head="perf", step=epoch, train_time_s=record["train_time_s"])
        tb.flush()
        print(record)
    return state, best_acc


def scaled_lr(args) -> float:
    """LR linearly scaled by total batch / 256 (ref run_slot_finetuning.py:521-525)."""
    total = args.batch_size * args.update_freq * jax.process_count()
    return args.lr * total / 256.0


def make_data_config(args, **overrides) -> DataConfig:
    kw = dict(
        data_set=args.data_set,
        data_path=args.data_path,
        data_prefix=args.data_prefix,
        anno_path=getattr(args, "anno_path", ""),
        num_frames=args.num_frames,
        sampling_rate=args.sampling_rate,
        input_size=args.input_size,
        short_side_size=args.short_side_size,
        test_num_segment=args.test_num_segment,
        test_num_crop=args.test_num_crop,
        aa=args.aa,
        train_interpolation=args.train_interpolation,
        reprob=args.reprob,
        num_sample=args.num_sample,
        nb_classes=args.nb_classes,
        synthetic=getattr(args, "synthetic_data", False),
        host_normalize=not getattr(args, "device_normalize", False),
    )
    kw.update(overrides)
    return DataConfig(**kw)


def make_optim_config(args, total_steps: int, steps_per_epoch: int,
                      agg_block_scale: float = 1.0, num_layers: int = 12) -> OptimConfig:
    warmup = (
        args.warmup_steps
        if args.warmup_steps > 0
        else args.warmup_epochs * steps_per_epoch
    )
    return OptimConfig(
        lr=scaled_lr(args),
        min_lr=args.min_lr,
        warmup_lr=args.warmup_lr,
        weight_decay=args.weight_decay,
        weight_decay_end=args.weight_decay_end,
        beta1=args.opt_betas[0] if args.opt_betas else 0.9,
        beta2=args.opt_betas[1] if args.opt_betas else 0.999,
        eps=args.opt_eps,
        layer_decay=args.layer_decay,
        agg_block_scale=agg_block_scale,
        num_layers=num_layers,
        total_steps=total_steps,
        warmup_steps=warmup,
        clip_grad=args.clip_grad,
        opt=args.opt,
        momentum=args.momentum,
    )


def make_train_loader(dataset, args) -> DataLoader:
    return DataLoader(
        dataset,
        batch_size=args.batch_size * args.update_freq,
        shuffle=True,
        drop_last=True,
        num_workers=args.num_workers,
        seed=args.seed,
        shard=jax.process_index(),
        num_shards=jax.process_count(),
    )


def make_eval_loader(dataset, args, batch_size: Optional[int] = None,
                     all_hosts: bool = False) -> DataLoader:
    """Evaluation loader. Default: shard across hosts only under
    --dist_eval, unpadded (per-host result files record exactly their
    shard; merge dedups). all_hosts=True shards across processes
    UNCONDITIONALLY with padded (equal-length) shards — required by
    consumers that all_gather fixed-shape per-host tensors, e.g. the kNN
    feature banks (the reference's DistributedSampler pads the same way,
    ref run_knn.py:28-42)."""
    multi = all_hosts and jax.process_count() > 1
    return DataLoader(
        dataset,
        batch_size=batch_size or args.batch_size,
        shuffle=False,
        drop_last=False,
        num_workers=args.num_workers,
        shard=jax.process_index() if (multi or args.dist_eval) else 0,
        num_shards=jax.process_count() if (multi or args.dist_eval) else 1,
        pad_shards=multi,
    )


class JsonlLogger:
    """Epoch log.txt writer (ref run_slot_finetuning.py:709-713)."""

    def __init__(self, output_dir: str, enabled: bool = True):
        self.path = os.path.join(output_dir, "log.txt") if output_dir else None
        self.enabled = enabled and bool(output_dir) and jax.process_index() == 0
        if self.enabled:
            os.makedirs(output_dir, exist_ok=True)

    def write(self, record: dict):
        if self.enabled:
            with open(self.path, "a") as f:
                f.write(json.dumps(record) + "\n")


def finetune_surgery(args, model_kind: str, params, num_classes_total: int,
                     agg_unique_layers: int = 1, depth: int = 12):
    """--finetune checkpoint load with the reference's surgery
    (ref run_slot_finetuning.py:438-499)."""
    from devias_tpu.ckpt import import_torch_state_dict, load_torch_checkpoint_file
    from devias_tpu.ckpt.torch_import import merge_params

    if not args.finetune:
        return params, None
    sd = load_torch_checkpoint_file(args.finetune)
    # target geometry for the pos-embed interpolation surgery
    # (ref run_slot_finetuning.py:471-497)
    dst_spatial = getattr(args, "input_size", 224) // 16
    frames_tokens = getattr(args, "num_frames", 16) // 2
    imported = import_torch_state_dict(
        sd, model_kind, depth=depth, agg_unique_layers=agg_unique_layers,
        expected_head_out=num_classes_total,
        dst_spatial=dst_spatial, frames_tokens=frames_tokens,
    )
    merged, report = merge_params(params, imported)
    print(f"finetune load: {len(report['loaded'])} tensors; "
          f"{len(report['unused_in_ckpt'])} ckpt keys unused")
    return merged, report


def run_knn_protocol(args, feature_fn, teacher_logits_fn, rank: int) -> dict:
    """The k-NN disentanglement probe (ref utils/eval/run_knn.py:166-273):
    for HMDB51 / UCF101 / Diving-48, extract (action, scene) features on
    train+test splits, assemble cross-host banks, dump features, and run
    the 4-way feature/label cross matrix at k in --nb_knn, T=0.07.

    feature_fn(videos) -> (action_feat, scene_feat). Shared by the slot CLI
    (slot features) and the multi-task CLI (CLS/scene tokens — the
    reference's own multi-task --run_knn path crashes on an arity mismatch,
    run_multi_task_finetuning.py:619 vs run_knn.py:166; here it works).
    """
    from devias_tpu.data.datasets import knn_build_dataset
    from devias_tpu.data.loader import shard_indices
    from devias_tpu.eval.knn import (
        extract_slot_features,
        gather_features_across_hosts,
        run_knn_matrix,
        save_knn_features,
    )

    results = {}
    for data_set in ("HMDB51", "UCF101", "Diving-48"):
        try:
            cfg = make_data_config(args, data_set=data_set)
            # BOTH splits use deterministic validation transforms
            # (ref dataset/datasets.py:474,504 mode='validation')
            tr, _ = knn_build_dataset(True, cfg)
            te, _ = knn_build_dataset(False, cfg)
        except (FileNotFoundError, ValueError):
            continue
        # always sharded+padded across hosts: the banks are assembled
        # with fixed-shape process_allgather (unpadded/dist_eval-gated
        # shards would either duplicate every sample into the bank or
        # make the gather shapes ragged)
        tr_l = make_eval_loader(tr, args, all_hosts=True)
        te_l = make_eval_loader(te, args, all_hosts=True)
        tra, trs, tral, trsl = extract_slot_features(
            tr_l, feature_fn, args.batch_size, scene_label_fn=teacher_logits_fn)
        tea, tes, teal, tesl = extract_slot_features(
            te_l, feature_fn, args.batch_size, scene_label_fn=teacher_logits_fn)

        # multi-host: scatter per-host shards into dataset-index order;
        # the padded shards' duplicate rows collapse exactly as the
        # reference's index_copy_ bank does (ref run_knn.py:72-119)
        def host_idx(ds):
            return shard_indices(
                len(ds), jax.process_index(), jax.process_count(),
                False, 0, 0, True,
            )

        tra, trs, tral, trsl = gather_features_across_hosts(
            tra, trs, tral, trsl, n_total=len(tr), local_indices=host_idx(tr))
        tea, tes, teal, tesl = gather_features_across_hosts(
            tea, tes, teal, tesl, n_total=len(te), local_indices=host_idx(te))
        if rank == 0 and args.output_dir:
            # feature dump (ref run_knn.py:230-237 file naming)
            save_knn_features(args.output_dir, data_set, {
                "train_action_features": tra, "train_scene_features": trs,
                "test_action_features": tea, "test_scene_features": tes,
                "train_action_labels": tral, "test_action_labels": teal,
                "train_scene_labels": trsl, "test_scene_labels": tesl,
            })
        results[data_set] = run_knn_matrix(
            tra, trs, tral, trsl, tea, tes, teal, tesl,
            nb_knn=args.nb_knn, temperature=args.temperature,
            num_action_classes=max(int(tral.max()) + 1, 1),
            num_scene_classes=365,
        )
    return results


def make_scuba_loader(args, variant: str):
    """SCUBA test loader for one background variant, forced 2x3 views
    (ref utils/eval/run_scuba.py:10-19: the harness rewrites data_path to
    filelist/scuba/<k400|ucf101> and pins test_num_segment/crop)."""
    from devias_tpu.data import build_dataset

    ds_key = {"Kinetics-400": "k400", "UCF101": "ucf101"}.get(args.data_set, "ucf101")
    cfg = make_data_config(
        args, data_set="SCUBA",
        anno_path=os.path.join("filelist/scuba", ds_key, f"{variant}.csv"),
        test_num_segment=2, test_num_crop=3,
    )
    ds, _ = build_dataset(False, True, cfg)
    return make_eval_loader(ds, args)


def make_hat_loader_factory(args):
    """-> (make_loader(version, split) -> test DataLoader, versions tuple).

    Mirrors the reference harness's path conventions
    (ref utils/eval/hat_eval.py:8-34):
    - the HAT dataset flavor is derived from --hat_anno_path ('kinetics' in
      the path -> Kinetics-HAT, 'ucf101' -> UCF101-HAT);
    - when the path's last component IS a version dir ({far, rand, close} —
      how the reference is always invoked, e.g. filelist/hat/ucf101/rand),
      only that version's 3 splits are evaluated;
    - otherwise all 3 versions are evaluated, looking for
      <anno>/<ver>/actionswap_<ver>_<split>.pickle and falling back to a
      flat <anno>/actionswap_<ver>_<split>.pickle layout.
    """
    from devias_tpu.data import build_dataset

    anno = args.hat_anno_path.rstrip("/")
    low = anno.lower()
    if "kinetics" in low:
        data_set = "Kinetics-HAT"
    elif "ucf101" in low:
        data_set = "UCF101-HAT"
    elif args.data_set.endswith("-HAT"):
        data_set = args.data_set
    else:
        data_set = {"Kinetics-400": "Kinetics-HAT"}.get(args.data_set, "UCF101-HAT")

    base = os.path.basename(anno)
    versions = (base,) if base in ("far", "rand", "close") else ("far", "rand", "close")

    def make_hat_loader(ver, split):
        candidates = [os.path.join(anno, f"actionswap_{ver}_{split}.pickle")]
        if base not in ("far", "rand", "close"):
            candidates.insert(0, os.path.join(anno, ver, f"actionswap_{ver}_{split}.pickle"))
        path = next((c for c in candidates if os.path.exists(c)), candidates[0])
        cfg = make_data_config(
            args, data_set=data_set, anno_path=path,
            test_num_segment=2, test_num_crop=3,
        )
        ds, _ = build_dataset(False, True, cfg)
        return make_eval_loader(ds, args)

    return make_hat_loader, versions
