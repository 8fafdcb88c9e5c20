"""Optimizer factory: AdamW with per-leaf layer-decay LR scaling, the
agg-block LR scale, no-decay groups, and per-step cosine LR/WD schedules.

Reference semantics (ref: utils/optim_factory.py:24-93,
run_slot_finetuning.py:532-539, engine/engine_for_slot.py:91-96):

* layer id: pos_embed/cls_token/patch_embed -> 0; blocks.j -> j+1;
  everything else -> num_layers+1. LR scale = layer_decay^(num_layers+1-id).
* any param under agg_block gets lr_scale = agg_block_scale instead
  (ref optim_factory.py:77-78; recipe value 0.1, docs/TRAIN.md:48).
* no weight decay for 1-D params, biases, and the skip list
  {pos_embed, cls_token, scene_token} (ref modeling_*.py no_weight_decay()).
* torch AdamW coupling: p -= lr_group * (adam_update + wd * p), where
  lr_group = lr_schedule(step) * lr_scale and wd = wd_schedule(step) for
  decay groups (the reference writes schedule values into param groups
  each micro-step; here schedules are evaluated inside the update).

Implemented as an optax chain with per-leaf scale/mask pytrees — no param
"groups", every leaf carries its own scale, which XLA fuses into one
elementwise update kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from devias_tpu.core.schedules import cosine_schedule

NO_DECAY_NAMES = ("pos_embed", "cls_token", "suffix_tokens")


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 5e-4  # already scaled by total_batch/256 by the caller
    min_lr: float = 1e-6
    warmup_lr: float = 1e-6
    weight_decay: float = 0.05
    weight_decay_end: Optional[float] = None
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    layer_decay: float = 1.0  # <1 enables layer-wise decay
    agg_block_scale: float = 1.0  # recipe: 0.1 for slot training
    num_layers: int = 12
    total_steps: int = 1000
    warmup_steps: int = 0
    clip_grad: Optional[float] = None
    opt: str = "adamw"  # adamw | adam | sgd | nesterov | momentum
    momentum: float = 0.9  # SGD family only


def _path_names(path) -> Tuple[str, ...]:
    return tuple(getattr(p, "key", str(p)) for p in path)


def _layer_id(names: Sequence[str], num_layers: int) -> int:
    """ref optim_factory.py:24-35 adapted to the flax tree layout
    (backbone/blocks_j/... instead of blocks.j...)."""
    for n in names:
        # NOTE: suffix_tokens (the multi-task scene_token) is deliberately
        # NOT here — the reference's name list covers only cls_token/
        # mask_token/pos_embed, so scene_token falls through to the LAST
        # layer id (scale 1.0, ref optim_factory.py:34-35); goldened by
        # tests/test_trajectory_mt_golden.py
        if n in ("cls_token", "pos_embed") or n.startswith("patch_embed"):
            return 0
        if n.startswith("blocks_"):
            return int(n.split("_")[1]) + 1
    return num_layers + 1


def build_lr_scale_tree(params, cfg: OptimConfig):
    """Per-leaf LR multiplier implementing layer decay + agg_block scale."""
    def scale(path, leaf):
        names = _path_names(path)
        if any("agg_block" in n for n in names):
            return cfg.agg_block_scale
        if cfg.layer_decay < 1.0:
            lid = _layer_id(names, cfg.num_layers)
            return cfg.layer_decay ** (cfg.num_layers + 1 - lid)
        return 1.0

    return jax.tree_util.tree_map_with_path(scale, params)


def build_wd_mask_tree(params):
    """True where decoupled weight decay applies (ref optim_factory.py:55-59)."""
    def mask(path, leaf):
        names = _path_names(path)
        if leaf.ndim <= 1:
            return False
        if names and names[-1] == "bias":
            return False
        if any(n in NO_DECAY_NAMES for n in names):
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def _add_scheduled_weight_decay(wd_fn: Callable, mask_tree) -> optax.GradientTransformation:
    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("weight decay needs params")
        wd = wd_fn(state.count)
        updates = jax.tree.map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask_tree
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def _scale_by_scheduled_lr(lr_fn: Callable, lr_scale_tree) -> optax.GradientTransformation:
    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        del params
        lr = lr_fn(state.count)
        updates = jax.tree.map(lambda u, s: u * (-lr * s), updates, lr_scale_tree)
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


class FusedAdamW(NamedTuple):
    """optax-compatible transformation with an extra single-pass path.

    NOTE on checkpoint format: the opt_state is a bare ScaleByAdamState,
    not the clip_grad optax chain's tuple-of-states — toggling clip_grad
    between runs changes the checkpointed opt_state structure, so resumes
    must keep the same clip_grad setting (ckpt/orbax_io restores by tree
    structure).

    `update` matches the optax chain's f32 math (used by generic callers;
    the param-dtype quantization happens only in fused_apply/apply_updates);
    `fused_apply(params, grads, state)` additionally folds the parameter
    update and the global grad-norm reduction into the same per-leaf kernel
    (one read of g and one read-modify-write of p/m/v — the optax chain +
    optax.apply_updates + a separate norm pass costs ~25% more HBM traffic,
    measured 6.4 -> 5.6 ms on the 98M-param flagship at v5e).
    Returns (new_params, new_state, grad_sq_norm).
    """

    init: Callable
    update: Callable
    fused_apply: Callable


def _make_fused_adamw(cfg: OptimConfig, lr_fn, wd_fn, lr_scales, wd_mask) -> FusedAdamW:
    b1, b2, eps = cfg.beta1, cfg.beta2, cfg.eps

    def init(params):
        zeros = lambda: jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros(), nu=zeros()
        )

    def _leaf(p, m, v, g, s, decay, lr, wd, bc1, bc2):
        """Returns (f32 scaled update, new mu, new nu). The param-dtype
        cast happens only in fused_apply — the generic `update` hands the
        unquantized f32 update to the caller (optax convention; the old
        form differenced quantized params, giving non-f32 callers a
        quantized update the optax chain would not produce)."""
        g = g.astype(jnp.float32)
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * (g * g)
        u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
        if decay:
            u = u + wd * p
        return (-(lr * s)) * u, m2, v2

    def _sched(count):
        c = count + 1
        cf = c.astype(jnp.float32)
        return lr_fn(count), wd_fn(count), 1 - b1**cf, 1 - b2**cf, c

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("FusedAdamW needs params")
        lr, wd, bc1, bc2, c = _sched(state.count)
        out = jax.tree.map(
            lambda p, m, v, g, s, dm: _leaf(p, m, v, g, s, dm, lr, wd, bc1, bc2),
            params, state.mu, state.nu, updates, lr_scales, wd_mask,
        )
        is3 = lambda o: isinstance(o, tuple) and len(o) == 3
        new_u = jax.tree.map(lambda o: o[0], out, is_leaf=is3)
        mu = jax.tree.map(lambda o: o[1], out, is_leaf=is3)
        nu = jax.tree.map(lambda o: o[2], out, is_leaf=is3)
        return new_u, optax.ScaleByAdamState(count=c, mu=mu, nu=nu)

    def fused_apply(params, grads, state):
        lr, wd, bc1, bc2, c = _sched(state.count)
        out = jax.tree.map(
            lambda p, m, v, g, s, dm: (
                *_leaf(p, m, v, g, s, dm, lr, wd, bc1, bc2),
                jnp.sum(jnp.square(g.astype(jnp.float32))),
            ),
            params, state.mu, state.nu, grads, lr_scales, wd_mask,
        )
        is4 = lambda o: isinstance(o, tuple) and len(o) == 4
        p2 = jax.tree.map(
            lambda o, p: (p + o[0]).astype(p.dtype), out, params, is_leaf=is4
        )
        mu = jax.tree.map(lambda o: o[1], out, is_leaf=is4)
        nu = jax.tree.map(lambda o: o[2], out, is_leaf=is4)
        gsq = sum(jax.tree.leaves(jax.tree.map(lambda o: o[3], out, is_leaf=is4)))
        return p2, optax.ScaleByAdamState(count=c, mu=mu, nu=nu), gsq

    return FusedAdamW(init=init, update=update, fused_apply=fused_apply)


def make_optimizer(params, cfg: OptimConfig):
    """Returns (tx, lr_fn) for the given param pytree. The lr_fn is exposed
    for logging (ref TB 'opt/lr' scalars).

    Without grad clipping, tx is a FusedAdamW whose `fused_apply` the train
    steps use to update params, Adam moments, and the grad-norm metric in a
    single per-leaf pass; its `update` remains optax-compatible (identical
    math) for generic callers. With clip_grad, the optax chain is used (the
    global norm must be reduced before the moment update)."""
    lr_fn = cosine_schedule(
        cfg.lr, cfg.min_lr, cfg.total_steps, cfg.warmup_steps, cfg.warmup_lr
    )
    wd_end = cfg.weight_decay_end if cfg.weight_decay_end is not None else cfg.weight_decay
    wd_fn = cosine_schedule(cfg.weight_decay, wd_end, cfg.total_steps, 0)

    lr_scales = build_lr_scale_tree(params, cfg)
    wd_mask = build_wd_mask_tree(params)

    opt = cfg.opt.lower()
    if opt not in ("adamw", "adam", "sgd", "nesterov", "momentum"):
        # the reference's optim_factory dispatches on --opt
        # (ref utils/optim_factory.py:96-181); rather than silently running
        # AdamW for an unsupported value, fail loudly
        raise ValueError(
            f"--opt {cfg.opt!r} is not supported (supported: adamw, adam, "
            "sgd, nesterov, momentum; the published DEVIAS recipes all use "
            "adamw)"
        )

    clip = [] if cfg.clip_grad is None else [optax.clip_by_global_norm(cfg.clip_grad)]
    if opt in ("sgd", "nesterov", "momentum"):
        # torch.optim.SGD semantics (ref optim_factory.py:124-130): weight
        # decay is L2 folded into the grad BEFORE the momentum buffer;
        # 'sgd'/'nesterov' -> nesterov=True, 'momentum' -> plain heavy ball
        parts = clip + [
            _add_scheduled_weight_decay(wd_fn, wd_mask),
            optax.trace(decay=cfg.momentum, nesterov=(opt != "momentum")),
            _scale_by_scheduled_lr(lr_fn, lr_scales),
        ]
        return optax.chain(*parts), lr_fn
    if opt == "adam":
        # torch.optim.Adam: L2 weight decay into the grad before moments
        parts = clip + [
            _add_scheduled_weight_decay(wd_fn, wd_mask),
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
            _scale_by_scheduled_lr(lr_fn, lr_scales),
        ]
        return optax.chain(*parts), lr_fn

    if cfg.clip_grad is None:
        return _make_fused_adamw(cfg, lr_fn, wd_fn, lr_scales, wd_mask), lr_fn

    parts = [
        optax.clip_by_global_norm(cfg.clip_grad),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps),
        _add_scheduled_weight_decay(wd_fn, wd_mask),
        _scale_by_scheduled_lr(lr_fn, lr_scales),
    ]
    return optax.chain(*parts), lr_fn
