"""Jitted train/eval steps: grad accumulation via lax.scan, FAME inside the
step, frozen-teacher forward, DP mesh sharding with XLA-inserted gradient
reductions.

Replaces the reference engines' per-iteration python loop bodies
(ref: engine/engine_for_slot.py:64-214): LR/WD scheduling moved into the
optimizer (devias_tpu.train.optim), DeepSpeed fp16 backward/step replaced
by bf16 + optax, NCCL allreduce replaced by XLA collectives implied by
shardings (params replicated, batch sharded over the 'data' mesh axis).

The FAME donor permutation is *shard-local* (each data shard permutes its
own samples), matching the reference's per-rank torch.randperm semantics
(ref engine_for_slot.py:107 runs FAME on the rank-local batch) and keeping
the gather off the ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from devias_tpu.aug.fame import FAMEConfig, fame_augment, fame_augment_hvu
from devias_tpu.core.dist import DATA_AXIS
from devias_tpu.losses import SlotLossConfig, devias_slot_loss, hvu_slot_loss, cross_entropy
from devias_tpu.train.state import TrainState


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    update_freq: int = 1  # gradient accumulation (ref --update_freq)
    use_fame: bool = True
    fame: FAMEConfig = FAMEConfig()
    num_data_shards: int = 1  # shard-local FAME permutation blocks
    # True: batches arrive as uint8, the step converts to [0,1] and FAME
    # consumes unit-range directly (no denorm round trip); the MODEL must
    # be built with input_norm=True. Identical math to host normalization.
    device_normalize: bool = False
    # 'yuv420': train batches arrive as uint8 I420 planes [B,T,H*3//2,W]
    # (half the wire bytes; data/yuv.py) and the step unpacks to RGB [0,1]
    # on-device. Requires device_normalize=True.
    wire_format: str = "rgb"
    # GPipe microbatches per micro-step when make_slot_train_step gets a
    # pp_mesh (core/pipeline.py); >= 4x pipe stages keeps the bubble <20%
    pp_microbatches: int = 4


def _global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree))
    )


def _apply_optimizer(tx, state: TrainState, grads):
    """Apply the optimizer and return (new_state, grad_norm). Uses the
    FusedAdamW single-pass path (params/moments/grad-norm in one kernel per
    leaf) when available; falls back to the generic optax protocol (and the
    separate norm pass) for chains or when EMA tracking needs apply_updates."""
    fused = getattr(tx, "fused_apply", None)
    if fused is not None and state.ema_params is None:
        new_params, new_opt, gsq = fused(state.params, grads, state.opt_state)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt
        )
        return new_state, jnp.sqrt(gsq)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return state.replace(opt_state=new_opt).apply_updates(updates), _global_norm(grads)


def _shard_local_fame(rng, videos, labels, fame_cfg: FAMEConfig, n_shards: int,
                      mean=None, std=None):
    """Run FAME independently per data shard so the donor gather stays
    device-local. videos: [B, ...] with B divisible by n_shards."""
    from devias_tpu.aug.fame import IMAGENET_MEAN, IMAGENET_STD

    mean = IMAGENET_MEAN if mean is None else mean
    std = IMAGENET_STD if std is None else std
    B = videos.shape[0]
    if n_shards <= 1 or B % n_shards != 0:
        return fame_augment(rng, videos, labels, fame_cfg, mean, std)
    local = B // n_shards
    v = videos.reshape(n_shards, local, *videos.shape[1:])
    l = labels.reshape(n_shards, local, *labels.shape[1:])
    keys = jax.random.split(rng, n_shards)
    v2, l2, (fg, fgpf) = jax.vmap(
        lambda k, vv, ll: fame_augment(k, vv, ll, fame_cfg, mean, std)
    )(keys, v, l)
    return (
        v2.reshape(videos.shape),
        l2.reshape(labels.shape),
        (fg.reshape(B, -1), fgpf.reshape(B, -1)),
    )


def _shard_local_segformer_mix(rng, masks, videos, labels, prob_aug, n_shards):
    """Segformer mix with a shard-local donor permutation: like
    _shard_local_fame, each data shard permutes only its own samples so the
    videos[perm] gather never crosses devices (the reference likewise
    permutes the rank-local batch, ref engine_for_slot.py:22)."""
    from devias_tpu.aug.segformer_mix import segformer_mix_sample

    B = videos.shape[0]
    if n_shards <= 1 or B % n_shards != 0:
        return segformer_mix_sample(rng, masks, videos, labels, prob_aug)
    local = B // n_shards
    m = masks.reshape(n_shards, local, *masks.shape[1:])
    v = videos.reshape(n_shards, local, *videos.shape[1:])
    l = labels.reshape(n_shards, local, *labels.shape[1:])
    keys = jax.random.split(rng, n_shards)
    v2, l2, (fg, fgpf) = jax.vmap(
        lambda k, mm, vv, ll: segformer_mix_sample(k, mm, vv, ll, prob_aug)
    )(keys, m, v, l)
    return (
        v2.reshape(videos.shape),
        l2.reshape(labels.shape),
        (fg.reshape(B, -1), fgpf.reshape(B, -1)),
    )


def make_slot_train_step(
    model,
    teacher_model,
    tx: optax.GradientTransformation,
    loss_cfg: SlotLossConfig,
    step_cfg: TrainStepConfig = TrainStepConfig(),
    lr_fn: Optional[Callable] = None,
    segformer_apply: Optional[Callable] = None,
    pp_mesh=None,
    sp_mesh=None,
):
    """DEVIAS slot training step (ref engine/engine_for_slot.py:50-169).

    fn(state, teacher_params, batch, rng) -> (state, metrics)
    batch: {'videos': [B,T,H,W,C] normalized, 'labels': [B]}
    B = update_freq * microbatch; microbatches are scanned for grad accum.

    segformer_apply: optional frozen mask model, [N,H,W,3] -> quarter-res
    logits; selects the reference's '--mask_model Segformer' branch
    (ref engine_for_slot.py:108-118) instead of FAME.

    pp_mesh: a (data, pipe) Mesh (core/pipeline.py::make_pp_mesh) selects
    pipeline-parallel training (beyond reference parity): the ViT backbone
    runs under the GPipe microbatch schedule with its block stack split
    over the pipe axis, and the agg block / heads / loss run on the full
    token tensor (replicated over pipe, sharded over data). Microbatch
    count comes from step_cfg.pp_microbatches. The frozen teacher forward
    stays outside the pipe (GSPMD replicates it over the pipe axis).

    sp_mesh: a (data, seq) Mesh (core/dist.py::make_sp_mesh) selects
    sequence-parallel training instead: the backbone's frame/token axis is
    sharded over seq (attention all_gathers K/V; dropout/drop_path rng is
    derived per shard), and the agg block / heads / loss run on the full
    token tensor. Mutually exclusive with pp_mesh.
    """
    U = step_cfg.update_freq
    if pp_mesh is not None and sp_mesh is not None:
        raise ValueError("pp_mesh and sp_mesh are mutually exclusive")
    pp_backbone = None
    if pp_mesh is not None:
        from devias_tpu.core.pipeline import pipeline_tokens
        from devias_tpu.nn.vit import VideoViT

        pp_backbone = VideoViT(**model.backbone_kwargs())
    sp_backbone = None
    if sp_mesh is not None:
        # sequence-parallel backbone (beyond reference parity): frame axis
        # sharded over the mesh's seq axis, attention K/V all_gathered,
        # per-shard rng streams (core/dist.py::seq_parallel_tokens);
        # agg/heads/loss consume the full token tensor like the PP path
        from devias_tpu.core.dist import SEQ_AXIS, seq_parallel_tokens
        from devias_tpu.nn.vit import VideoViT

        sp_backbone = VideoViT(
            **model.backbone_kwargs(),
            seq_axis=SEQ_AXIS, seq_shards=sp_mesh.shape[SEQ_AXIS],
        )

    def micro_loss(params, teacher_params, videos, labels, rng):
        fame_rng, drop_rng, dp_rng = jax.random.split(rng, 3)
        if step_cfg.wire_format == "yuv420":
            if not step_cfg.device_normalize:
                raise ValueError("wire_format='yuv420' requires device_normalize=True")
            from devias_tpu.data.yuv import i420_to_rgb

            # barrier: materialize the unpacked RGB once — without it XLA
            # re-inlines the unpack (gather-heavy repeat/stack) into each
            # of FAME's consumers, costing ~13.5ms/step vs ~4ms isolated
            videos = jax.lax.optimization_barrier(i420_to_rgb(videos))
        elif step_cfg.device_normalize:
            videos = videos.astype(jnp.float32) / 255.0
        if segformer_apply is not None:
            from devias_tpu.aug.fame import IMAGENET_MEAN, IMAGENET_STD
            from devias_tpu.aug.segformer_mix import (
                segformer_frame_masks,
                segformer_mix_sample,
            )

            if step_cfg.device_normalize:
                # the reference feeds the video-normalized tensor to the
                # mask model (engine_for_slot.py:112); under the unit-range
                # pipeline we normalize just the sampled frames to match.
                mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
                std = jnp.asarray(IMAGENET_STD, jnp.float32)
                seg_in = (videos - mean) / std
            else:
                seg_in = videos
            masks = segformer_frame_masks(segformer_apply, seg_in)
            videos, labels, (fg_mask, fg_pf) = _shard_local_segformer_mix(
                fame_rng, masks, videos, labels, step_cfg.fame.prob_aug,
                step_cfg.num_data_shards,
            )
        elif step_cfg.use_fame:
            fame_stats = (
                ((0.0, 0.0, 0.0), (1.0, 1.0, 1.0))  # inputs already in [0,1]
                if step_cfg.device_normalize
                else None
            )
            if fame_stats is not None:
                videos, labels, (fg_mask, fg_pf) = _shard_local_fame(
                    fame_rng, videos, labels, step_cfg.fame,
                    step_cfg.num_data_shards, mean=fame_stats[0], std=fame_stats[1],
                )
            else:
                videos, labels, (fg_mask, fg_pf) = _shard_local_fame(
                    fame_rng, videos, labels, step_cfg.fame, step_cfg.num_data_shards
                )
        else:
            B = videos.shape[0]
            T = videos.shape[1]
            n_sp = (videos.shape[2] // 16) * (videos.shape[3] // 16)
            fg_mask = jnp.zeros((B, n_sp), jnp.float32)
            fg_pf = jnp.zeros((B, (T // 2) * n_sp), jnp.float32)

        # frozen scene teacher under stop_gradient
        # (ref engine_for_slot.py:52-54 runs it in no_grad)
        teacher_out = teacher_model.apply(
            {"params": teacher_params}, videos, deterministic=True
        )
        teacher_logits = jax.lax.stop_gradient(teacher_out["logits"])

        tokens = None
        if pp_backbone is not None:
            pp_rng = jax.random.fold_in(drop_rng, 1)
            tokens = pipeline_tokens(
                pp_backbone, params["backbone"], videos, pp_mesh,
                n_micro=step_cfg.pp_microbatches,
                deterministic=False, rng=pp_rng,
            )
        elif sp_backbone is not None:
            sp_rng = jax.random.fold_in(drop_rng, 2)
            tokens = seq_parallel_tokens(
                sp_backbone, params["backbone"], videos, sp_mesh,
                deterministic=False, rng=sp_rng,
            )
        student = model.apply(
            {"params": params},
            videos,
            deterministic=False,
            rngs={"dropout": drop_rng, "drop_path": dp_rng},
            tokens=tokens,
        )
        total, action_logits, parts = devias_slot_loss(
            student, teacher_logits, labels, fg_mask, fg_pf, loss_cfg
        )
        acc = (action_logits.argmax(-1) == labels).mean()
        return total, {**parts, "loss": total, "class_acc": acc}

    grad_fn = jax.grad(micro_loss, has_aux=True)

    def step(state: TrainState, teacher_params, batch, rng):
        videos, labels = batch["videos"], batch["labels"]
        B = videos.shape[0]
        mb = B // U
        v = videos.reshape(U, mb, *videos.shape[1:])
        l = labels.reshape(U, mb, *labels.shape[1:])
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), U)

        def body(carry, xs):
            g_acc, m_acc = carry
            vv, ll, kk = xs
            g, m = grad_fn(state.params, teacher_params, vv, ll, kk)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            m_acc = jax.tree.map(jnp.add, m_acc, m)
            return (g_acc, m_acc), None

        zero_g = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        zero_m = {
            k: jnp.zeros([], jnp.float32)
            for k in (
                "loss", "action_loss", "scene_loss", "cosine_loss",
                "mask_prediction_loss", "mask_distill_loss", "class_acc",
            )
        }
        if U == 1:
            grads, metrics = grad_fn(state.params, teacher_params, v[0], l[0], rngs[0])
        else:
            (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m), (v, l, rngs))
            grads = jax.tree.map(lambda g: g / U, grads)
            metrics = jax.tree.map(lambda m: m / U, metrics)

        new_state, grad_norm = _apply_optimizer(tx, state, grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        if lr_fn is not None:
            metrics["lr"] = lr_fn(state.step)
        return new_state, metrics

    return step


def make_hvu_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_cfg: SlotLossConfig,
    step_cfg: TrainStepConfig = TrainStepConfig(),
    lr_fn: Optional[Callable] = None,
):
    """HVU slot training step: real scene labels, FAME-HVU label swap, no
    teacher (ref engine/engine_for_slot_hvu.py:23-150)."""
    U = step_cfg.update_freq

    def micro_loss(params, videos, action_labels, scene_labels, rng):
        fame_rng, drop_rng, dp_rng = jax.random.split(rng, 3)
        if step_cfg.use_fame:
            videos, action_labels, scene_labels, (fg_mask, fg_pf) = fame_augment_hvu(
                fame_rng, videos, action_labels, scene_labels, step_cfg.fame
            )
        else:
            B, T = videos.shape[0], videos.shape[1]
            n_sp = (videos.shape[2] // 16) * (videos.shape[3] // 16)
            fg_mask = jnp.zeros((B, n_sp), jnp.float32)
            fg_pf = jnp.zeros((B, (T // 2) * n_sp), jnp.float32)

        student = model.apply(
            {"params": params}, videos, deterministic=False,
            rngs={"dropout": drop_rng, "drop_path": dp_rng},
        )
        total, action_logits, parts = hvu_slot_loss(
            student, action_labels, scene_labels, fg_mask, fg_pf, loss_cfg
        )
        acc = (action_logits.argmax(-1) == action_labels).mean()
        return total, {**parts, "loss": total, "class_acc": acc}

    grad_fn = jax.grad(micro_loss, has_aux=True)

    def step(state: TrainState, batch, rng):
        videos = batch["videos"]
        al = batch.get("labels", batch.get("action_labels"))
        sl = batch["scene_labels"]
        B = videos.shape[0]
        mb = B // U
        v = videos.reshape(U, mb, *videos.shape[1:])
        a = al.reshape(U, mb)
        s = sl.reshape(U, mb)
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), U)

        def body(carry, xs):
            g_acc, m_acc = carry
            vv, aa, ss, kk = xs
            g, m = grad_fn(state.params, vv, aa, ss, kk)
            return (jax.tree.map(jnp.add, g_acc, g), jax.tree.map(jnp.add, m_acc, m)), None

        if U == 1:
            grads, metrics = grad_fn(state.params, v[0], a[0], s[0], rngs[0])
        else:
            zero_g = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            zero_m = {
                k: jnp.zeros([], jnp.float32)
                for k in (
                    "loss", "action_loss", "scene_loss", "cosine_loss",
                    "mask_prediction_loss", "mask_distill_loss", "class_acc",
                )
            }
            (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m), (v, a, s, rngs))
            grads = jax.tree.map(lambda g: g / U, grads)
            metrics = jax.tree.map(lambda m: m / U, metrics)

        new_state, grad_norm = _apply_optimizer(tx, state, grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        if lr_fn is not None:
            metrics["lr"] = lr_fn(state.step)
        return new_state, metrics

    return step


def make_classification_train_step(
    model,
    tx: optax.GradientTransformation,
    criterion: Callable = cross_entropy,
    update_freq: int = 1,
    lr_fn: Optional[Callable] = None,
    logits_key: str = "logits",
    mixup_cfg=None,
):
    """Plain finetune step (ref engine/engine_for_finetuning.py:18-126):
    [optional mixup/cutmix ->] model forward -> criterion -> AdamW.
    With mixup enabled the criterion receives soft targets
    (SoftTargetCrossEntropy path, ref run_slot_finetuning.py:583-589)."""
    U = update_freq

    def micro_loss(params, videos, labels, rng):
        drop_rng, dp_rng, mix_rng = jax.random.split(rng, 3)
        if mixup_cfg is not None and mixup_cfg.enabled:
            from devias_tpu.aug.mixup import mixup_cutmix

            videos, labels = mixup_cutmix(mix_rng, videos, labels, mixup_cfg)
        out = model.apply(
            {"params": params}, videos, deterministic=False,
            rngs={"dropout": drop_rng, "drop_path": dp_rng},
        )
        logits = out[logits_key]
        loss = criterion(logits, labels).mean()
        if labels.ndim == 1:
            acc = (logits.argmax(-1) == labels).mean()
        else:  # soft targets (mixup)
            acc = (logits.argmax(-1) == labels.argmax(-1)).mean()
        return loss, {"loss": loss, "class_acc": acc}

    grad_fn = jax.grad(micro_loss, has_aux=True)

    def step(state: TrainState, batch, rng):
        videos, labels = batch["videos"], batch["labels"]
        mb = videos.shape[0] // U
        v = videos.reshape(U, mb, *videos.shape[1:])
        l = labels.reshape(U, mb, *labels.shape[1:])
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), U)

        def body(carry, xs):
            g_acc, m_acc = carry
            vv, ll, kk = xs
            g, m = grad_fn(state.params, vv, ll, kk)
            return (jax.tree.map(jnp.add, g_acc, g), jax.tree.map(jnp.add, m_acc, m)), None

        if U == 1:
            grads, metrics = grad_fn(state.params, v[0], l[0], rngs[0])
        else:
            zero_g = jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
            zero_m = {"loss": jnp.zeros([]), "class_acc": jnp.zeros([])}
            (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m), (v, l, rngs))
            grads = jax.tree.map(lambda g: g / U, grads)
            metrics = jax.tree.map(lambda m: m / U, metrics)

        new_state, grad_norm = _apply_optimizer(tx, state, grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        if lr_fn is not None:
            metrics["lr"] = lr_fn(state.step)
        return new_state, metrics

    return step


def make_multi_task_train_step(
    model,
    teacher,
    tx: optax.GradientTransformation,
    num_action_classes: int,
    logit_criterion: str = "KL",
    logit_criterion_weight: float = 1.0,
    unified_head: bool = False,
    action_criterion: Callable = cross_entropy,
    update_freq: int = 1,
    lr_fn: Optional[Callable] = None,
):
    """Multi-task baseline step (ref engine/engine_for_multi_task.py:27-137):
    student forward + frozen scene-teacher forward -> multi_task_loss
    (action CE + scene logit distillation) -> AdamW, with the engine's
    micro-batch gradient accumulation (loss /= update_freq per micro step,
    optimizer applied at the boundary). Trajectory-goldened against the
    actual reference engine in tests/test_trajectory_mt_golden.py."""
    from devias_tpu.losses import multi_task_loss

    U = update_freq

    def micro_loss(params, tparams, videos, labels, rng):
        d1, d2 = jax.random.split(rng)
        out = model.apply(
            {"params": params}, videos, deterministic=False,
            rngs={"dropout": d1, "drop_path": d2},
        )
        t = jax.lax.stop_gradient(
            teacher.apply({"params": tparams}, videos, deterministic=True)["logits"]
        )
        total, action_logit, parts = multi_task_loss(
            out, t, labels, num_action_classes=num_action_classes,
            logit_criterion=logit_criterion,
            logit_criterion_weight=logit_criterion_weight,
            unified_head=unified_head,
            action_criterion=action_criterion,
        )
        acc = (action_logit[:, :num_action_classes].argmax(-1) == labels).mean()
        return total, {**parts, "loss": total, "class_acc": acc}

    grad_fn = jax.grad(micro_loss, has_aux=True)

    def step(state: TrainState, tparams, batch, rng):
        videos, labels = batch["videos"], batch["labels"]
        mb = videos.shape[0] // U
        v = videos.reshape(U, mb, *videos.shape[1:])
        l = labels.reshape(U, mb, *labels.shape[1:])
        rngs = jax.random.split(jax.random.fold_in(rng, state.step), U)

        if U == 1:
            grads, metrics = grad_fn(state.params, tparams, v[0], l[0], rngs[0])
        else:
            def body(carry, xs):
                g_acc, m_acc = carry
                vv, ll, kk = xs
                g, m = grad_fn(state.params, tparams, vv, ll, kk)
                return (
                    jax.tree.map(jnp.add, g_acc, g),
                    jax.tree.map(jnp.add, m_acc, m),
                ), None

            zero_g = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            zero_m = {
                "loss": jnp.zeros([]), "class_acc": jnp.zeros([]),
                "action_loss": jnp.zeros([]), "logit_loss": jnp.zeros([]),
            }
            (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m), (v, l, rngs))
            grads = jax.tree.map(lambda g: g / U, grads)
            metrics = jax.tree.map(lambda m: m / U, metrics)

        new_state, grad_norm = _apply_optimizer(tx, state, grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = grad_norm
        if lr_fn is not None:
            metrics["lr"] = lr_fn(state.step)
        return new_state, metrics

    return step


def make_eval_step(model, output_key: Optional[str] = None):
    """Deterministic forward returning the full output dict (or one key)."""
    def step(params, videos):
        out = model.apply({"params": params}, videos, deterministic=True)
        return out[output_key] if output_key else out

    return step


def place_data_parallel(mesh, state, batch):
    """Place state replicated and batch sharded over the data axis; a
    subsequent jit'd step follows the data (computation-follows-sharding),
    and XLA inserts the gradient psum over ICI."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    batch = jax.tree.map(lambda x: jax.device_put(x, data), batch)
    return state, batch
