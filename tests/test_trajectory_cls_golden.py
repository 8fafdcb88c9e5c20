"""Multi-step training-trajectory golden for the CLASSIFICATION engine.

test_trajectory_golden.py pins the slot engine's composed optimizer/schedule
/accumulation semantics against the actual reference; this does the same for
the plain finetune path: the reference `engine_for_finetuning.train_one_epoch`
(ref engine/engine_for_finetuning.py:24-126) — real optim_factory param
groups, real cosine_scheduler arrays, NativeScaler micro-step accumulation,
timm ModelEma — vs `make_classification_train_step` + `make_optimizer` from
identical imported weights. Covers what the slot trajectory cannot: the CE /
label-smoothing criteria (ref run_class_finetuning.py:484-488), the
mean-pool+fc_norm head, and the EMA update trajectory (ref
run_class_finetuning.py:409, engine_for_finetuning.py:87-101 — update once
per OPTIMIZER step, after the param update).

Determinism: drop rates 0, no mixup (its math has a bit-exact oracle in
tests/test_mixup_oracle.py; cross-framework pinned randomness is not
reproducible inside the engine loop). Geometry is free (no agg-block
hard-coding in the plain model), so everything shrinks: img 64, dim 192.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from _ref_oracle import load_reference, torch_state_dict_to_numpy  # noqa: E402
from devias_tpu.ckpt import import_torch_state_dict  # noqa: E402
from devias_tpu.ckpt.torch_import import merge_params  # noqa: E402
from devias_tpu.losses import cross_entropy, label_smoothing_cross_entropy  # noqa: E402
from devias_tpu.nn import create_model  # noqa: E402
from devias_tpu.train import (  # noqa: E402
    OptimConfig,
    TrainState,
    make_classification_train_step,
    make_optimizer,
)

load_reference()

from engine import engine_for_finetuning  # noqa: E402
from model import modeling_finetune  # noqa: E402
from utils import utils as ref_utils  # noqa: E402
from utils.optim_factory import LayerDecayValueAssigner, create_optimizer  # noqa: E402

N_CLS = 7
DEPTH, FRAMES, HEADS, DIM, IMG = 2, 4, 3, 192, 64
B = 2
LR, MIN_LR, WARMUP, WD, WD_END, LAYER_DECAY = 1e-3, 1e-5, 2, 0.05, 0.02, 0.75
EMA_DECAY = 0.95


class _Recording(torch.nn.Module):
    """Wraps the criterion to record each micro-step's (undivided) loss —
    the engine only returns epoch averages."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner
        self.values = []

    def forward(self, *a, **k):
        out = self.inner(*a, **k)
        self.values.append(float(out.detach()))
        return out


def _build_reference():
    torch.manual_seed(11)
    norm = lambda d: torch.nn.LayerNorm(d, eps=1e-6)  # noqa: E731
    net = modeling_finetune.VisionTransformer(
        img_size=IMG, patch_size=16, num_classes=N_CLS, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=norm, init_scale=0.001, all_frames=FRAMES,
        tubelet_size=2, use_mean_pooling=True,
    )
    return net


def _run_reference(net, batches, n_opt_steps, update_freq, smoothing, use_ema):
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None
    args = types.SimpleNamespace(
        opt="adamw", lr=LR, weight_decay=WD, opt_eps=1e-8, opt_betas=None,
        momentum=0.9,
    )
    assigner = LayerDecayValueAssigner(
        list(LAYER_DECAY ** (DEPTH + 1 - i) for i in range(DEPTH + 2))
    )
    optimizer = create_optimizer(
        args, net, get_num_layer=assigner.get_layer_id,
        get_layer_scale=assigner.get_scale,
    )
    lr_sched = ref_utils.cosine_scheduler(
        LR, MIN_LR, 1, n_opt_steps, warmup_epochs=1, warmup_steps=WARMUP,
        start_warmup_value=0.0,
    )
    wd_sched = ref_utils.cosine_scheduler(WD, WD_END, 1, n_opt_steps)
    if smoothing > 0:
        from timm.loss import LabelSmoothingCrossEntropy

        criterion = _Recording(LabelSmoothingCrossEntropy(smoothing=smoothing))
    else:
        criterion = _Recording(torch.nn.CrossEntropyLoss())
    model_ema = None
    if use_ema:
        from timm.utils import ModelEma

        model_ema = ModelEma(net, decay=EMA_DECAY, device="", resume="")
    loader = [
        (torch.from_numpy(v.transpose(0, 4, 1, 2, 3)).contiguous(),
         torch.from_numpy(l), 0, 0)
        for v, l in batches
    ]
    scaler = ref_utils.NativeScalerWithGradNormCount()
    _orig_sd = scaler._scaler.state_dict
    scaler._scaler.state_dict = lambda: {"scale": 1.0, **_orig_sd()}
    stats = engine_for_finetuning.train_one_epoch(
        net, criterion, loader, optimizer, torch.device("cpu"), epoch=0,
        loss_scaler=scaler, max_norm=None, model_ema=model_ema, mixup_fn=None,
        start_steps=0, lr_schedule_values=lr_sched, wd_schedule_values=wd_sched,
        num_training_steps_per_epoch=n_opt_steps, update_freq=update_freq,
    )
    return stats, criterion.values, model_ema


def _run_repo(net, batches, n_opt_steps, update_freq, smoothing, use_ema):
    model = create_model(
        "vit_base_patch16_224", num_classes=N_CLS, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, use_mean_pooling=True,
    )
    x0 = jnp.zeros((B, FRAMES, IMG, IMG, 3), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    imported = import_torch_state_dict(torch_state_dict_to_numpy(net), "plain")
    params, info = merge_params(init, imported)
    assert not info["unused_in_ckpt"], info["unused_in_ckpt"]

    cfg = OptimConfig(
        lr=LR, min_lr=MIN_LR, warmup_lr=0.0, weight_decay=WD,
        weight_decay_end=WD_END, layer_decay=LAYER_DECAY, num_layers=DEPTH,
        total_steps=n_opt_steps, warmup_steps=WARMUP,
    )
    tx, lr_fn = make_optimizer(params, cfg)
    state = TrainState.create(params, tx, use_ema=use_ema, ema_decay=EMA_DECAY)
    if smoothing > 0:
        crit = lambda lg, lb: label_smoothing_cross_entropy(lg, lb, smoothing)  # noqa: E731
    else:
        crit = cross_entropy
    step = jax.jit(make_classification_train_step(
        model, tx, criterion=crit, update_freq=update_freq, lr_fn=lr_fn,
    ))
    losses = []
    U = update_freq
    for s in range(n_opt_steps):
        vs = np.concatenate([batches[s * U + u][0] for u in range(U)], axis=0)
        ls = np.concatenate([batches[s * U + u][1] for u in range(U)], axis=0)
        state, metrics = step(
            state, {"videos": jnp.asarray(vs), "labels": jnp.asarray(ls)},
            jax.random.PRNGKey(0),
        )
        losses.append(float(metrics["loss"]))
    return state, losses


def _make_batches(n_micro, seed=5):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.normal(size=(B, FRAMES, IMG, IMG, 3)).astype(np.float32) * 0.5,
            rng.integers(0, N_CLS, size=B).astype(np.int64),
        )
        for _ in range(n_micro)
    ]


def _assert_param_drift(repo_params, ref_sd, init_sd, what):
    """Per-leaf drift between trajectories must be tiny relative to how far
    training moved the tensor (same criterion as the slot trajectory test)."""
    merged, _ = merge_params(jax.tree.map(np.asarray, repo_params), ref_sd)
    init_merged, _ = merge_params(jax.tree.map(np.asarray, repo_params), init_sd)
    mismatches = []
    for (path, ours), (_, ref), (_, init) in zip(
        jax.tree_util.tree_flatten_with_path(repo_params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
        jax.tree_util.tree_flatten_with_path(init_merged)[0],
    ):
        ours = np.asarray(ours, np.float32)
        ref = np.asarray(ref, np.float32)
        init = np.asarray(init, np.float32)
        movement = np.max(np.abs(ref - init))
        drift = np.max(np.abs(ours - ref))
        if movement < 1e-12:
            ok = drift == 0.0
        else:
            ok = drift <= max(0.02 * movement, 5e-5)
        if not ok:
            mismatches.append(
                (jax.tree_util.keystr(path), float(drift), float(movement))
            )
    assert not mismatches, f"{what} diverged: {mismatches[:10]}"


@pytest.mark.parametrize(
    "update_freq,n_opt_steps,smoothing,use_ema",
    [(1, 6, 0.0, True), (2, 4, 0.1, False)],
)
def test_classification_trajectory_matches_reference(
    update_freq, n_opt_steps, smoothing, use_ema
):
    net = _build_reference()
    batches = _make_batches(n_opt_steps * update_freq)

    init_sd = import_torch_state_dict(torch_state_dict_to_numpy(net), "plain")

    state, repo_losses = _run_repo(
        net, batches, n_opt_steps, update_freq, smoothing, use_ema
    )
    stats, ref_micro, model_ema = _run_reference(
        net, batches, n_opt_steps, update_freq, smoothing, use_ema
    )

    assert len(ref_micro) == n_opt_steps * update_freq
    ref_steps = [
        float(np.mean(ref_micro[s * update_freq:(s + 1) * update_freq]))
        for s in range(n_opt_steps)
    ]
    np.testing.assert_allclose(
        repo_losses, ref_steps, rtol=1e-4,
        err_msg=f"per-step losses diverged (ref micro: {ref_micro})",
    )
    assert stats["loss"] == pytest.approx(float(np.mean(ref_micro)), rel=1e-5)

    final_sd = import_torch_state_dict(torch_state_dict_to_numpy(net), "plain")
    _assert_param_drift(state.params, final_sd, init_sd, "params")

    if use_ema:
        ema_sd = import_torch_state_dict(
            torch_state_dict_to_numpy(model_ema.ema), "plain"
        )
        _assert_param_drift(state.ema_params, ema_sd, init_sd, "EMA params")
