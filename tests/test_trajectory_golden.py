"""Multi-step training-trajectory golden vs the ACTUAL reference engine.

Single-step AdamW parity (test_train.py) and single-call loss parity
(test_reference_golden.py) leave the *composed* semantics unproven: the
per-group layer-decay LR scales (ref utils/optim_factory.py:49-93), the
warmup-cosine per-iteration arrays (ref utils/utils.py:422-439), the
schedule-indexing convention and grad-accumulation interaction of the
engine loop (ref engine/engine_for_slot.py:85-96,146-169). This test runs
the reference `train_one_epoch` — real optimizer factory, real cosine
arrays, real NativeScaler micro-step accumulation — on a reduced slot
model over fixed batches, then replays the identical schedule through
`make_optimizer` + `make_slot_train_step` from identical imported weights
and asserts per-step losses and final parameters match (VERDICT r2
missing item 1).

Determinism notes: all stochastic regularization is off (drop rates 0);
the mask model is a fixed zero-mask stand-in on both sides (the repo's
use_fame=False branch produces exactly zero masks, train/step.py:178-183;
FAME itself has its own oracle, tests/test_fame_oracle.py). The reduced
geometry keeps embed_dim 768 and the 14x14 grid because the reference
hard-codes both in AggregationBlock/MaskPredictor; depth, frames, and
agg_depth shrink instead.
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
from devias_tpu.losses import SlotLossConfig  # noqa: E402
from devias_tpu.nn import create_model  # noqa: E402
from devias_tpu.train import (  # noqa: E402
    OptimConfig,
    TrainState,
    TrainStepConfig,
    make_optimizer,
    make_slot_train_step,
)

load_reference()

from engine import engine_for_slot  # noqa: E402
from model import modeling_finetune, modeling_slot  # noqa: E402
from utils import utils as ref_utils  # noqa: E402
from utils.loss.train_loss import TrainLoss  # noqa: E402
from utils.optim_factory import LayerDecayValueAssigner, create_optimizer  # noqa: E402

# reduced geometry (see module docstring)
A_CLS, SC_CLS = 7, 365
DEPTH, FRAMES, AGG_DEPTH, HEADS = 2, 4, 2, 12
B = 2
LR, MIN_LR, WARMUP, WD, WD_END, LAYER_DECAY, AGG_SCALE = (
    1e-3, 1e-5, 2, 0.05, 0.02, 0.75, 0.1,
)


class _Recording(torch.nn.Module):
    """Wraps TrainLoss to record the per-micro-step total loss (the engine
    only returns epoch averages)."""

    def __init__(self, inner):
        super().__init__()
        self.inner = inner
        self.values = []

    def forward(self, *a, **k):
        out = self.inner(*a, **k)
        self.values.append(float(out[0].detach().squeeze()))
        return out


class FixedFAMEMask:
    """Stands in for the reference FAME module inside train_one_epoch (the
    engine selects the branch via `'FAME' in str(mask_model)`,
    ref engine_for_slot.py:107): identity on videos/labels, zero masks —
    exactly what the repo step's use_fame=False branch produces."""

    def __call__(self, samples, targets):
        bs = samples.shape[0]
        n_tok = 196 * (FRAMES // 2)
        return samples, targets, (torch.zeros(bs, 196), torch.zeros(bs, n_tok))

    def __str__(self):
        return "FixedFAMEMask(FAME)"


def _build_reference():
    torch.manual_seed(7)
    norm = lambda d: torch.nn.LayerNorm(d, eps=1e-6)  # noqa: E731
    net = modeling_slot.VisionTransformer(
        img_size=224, patch_size=16, num_classes=A_CLS, embed_dim=768,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=norm, init_scale=0.001, all_frames=FRAMES,
        tubelet_size=2, num_latents=2, slot_matching_method="matching",
        num_scene_classes=SC_CLS, agg_weights_tie=True, agg_depth=AGG_DEPTH,
    )
    teacher = modeling_finetune.VisionTransformer(
        img_size=224, patch_size=16, num_classes=SC_CLS, embed_dim=768,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=norm, all_frames=FRAMES, tubelet_size=2,
        use_mean_pooling=False, init_scale=1.0,
    )
    teacher.eval()
    return net, teacher


def _run_reference(net, teacher, batches, n_opt_steps, update_freq):
    # the engine calls torch.cuda.synchronize() unconditionally
    # (engine_for_slot.py:171); a device sync is a no-op on CPU
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None
    args = types.SimpleNamespace(
        opt="adamw", lr=LR, weight_decay=WD, opt_eps=1e-8, opt_betas=None,
        momentum=0.9,
    )
    num_layers = DEPTH
    assigner = LayerDecayValueAssigner(
        list(LAYER_DECAY ** (num_layers + 1 - i) for i in range(num_layers + 2))
    )
    optimizer = create_optimizer(
        args, net, get_num_layer=assigner.get_layer_id,
        get_layer_scale=assigner.get_scale,
    )
    # the run scripts pass agg_block_scale through get_parameter_groups'
    # default (0.1) — create_optimizer has no flag, the factory default IS
    # the recipe value (ref optim_factory.py:49, docs/TRAIN.md:48)
    total_iters = n_opt_steps
    # warmup_epochs>0 gates the warmup array build; warmup_steps overrides
    # the iteration count (ref utils/utils.py:424-430 — run scripts pass
    # both, run_slot_finetuning.py:572-576)
    lr_sched = ref_utils.cosine_scheduler(
        LR, MIN_LR, 1, total_iters, warmup_epochs=1, warmup_steps=WARMUP,
        start_warmup_value=0.0,
    )
    wd_sched = ref_utils.cosine_scheduler(WD, WD_END, 1, total_iters)
    criterion = torch.nn.CrossEntropyLoss()
    train_criterion = _Recording(
        TrainLoss(
            criterion=criterion, scene_criterion="KL", num_action_classes=A_CLS,
            slot_matching_method="matching", scene_loss_weight=4000.0,
            mask_prediction_loss_weight=1.0, mask_distill_loss_weight=3.0,
        )
    )
    loader = [
        (torch.from_numpy(v.transpose(0, 4, 1, 2, 3)).contiguous(), torch.from_numpy(l), 0, 0)
        for v, l in batches
    ]
    scaler = ref_utils.NativeScalerWithGradNormCount()
    # on CPU the GradScaler is disabled (pure passthrough — f32 math, which
    # is exactly what we want) but its state_dict is empty; the engine reads
    # ['scale'] for metrics only (engine_for_slot.py:169)
    _orig_sd = scaler._scaler.state_dict
    scaler._scaler.state_dict = lambda: {"scale": 1.0, **_orig_sd()}
    stats = engine_for_slot.train_one_epoch(
        net, teacher, train_criterion, loader, optimizer,
        torch.device("cpu"), epoch=0, loss_scaler=scaler, max_norm=None,
        start_steps=0, lr_schedule_values=lr_sched, wd_schedule_values=wd_sched,
        num_training_steps_per_epoch=n_opt_steps, update_freq=update_freq,
        mask_model=FixedFAMEMask(), args=None,
    )
    return stats, train_criterion.values


def _run_repo(net, teacher, batches, n_opt_steps, update_freq):
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=A_CLS,
        num_scene_classes=SC_CLS, depth=DEPTH, num_heads=HEADS,
        num_latents=2, agg_depth=AGG_DEPTH, agg_weights_tie=True,
        slot_matching_method="matching",
    )
    jteacher = create_model(
        "vit_base_patch16_224", num_classes=SC_CLS, depth=DEPTH,
        num_heads=HEADS, use_mean_pooling=False,
    )
    x0 = jnp.zeros((B, FRAMES, 224, 224, 3), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    imported = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "slot", agg_unique_layers=1
    )
    params, info = merge_params(init, imported)
    assert not info["unused_in_ckpt"], info["unused_in_ckpt"]

    tinit = jteacher.init({"params": jax.random.PRNGKey(1)}, x0)["params"]
    timported = import_torch_state_dict(
        torch_state_dict_to_numpy(teacher), "plain"
    )
    tparams, tinfo = merge_params(tinit, timported)
    assert not tinfo["unused_in_ckpt"], tinfo["unused_in_ckpt"]

    cfg = OptimConfig(
        lr=LR, min_lr=MIN_LR, warmup_lr=0.0, weight_decay=WD,
        weight_decay_end=WD_END, layer_decay=LAYER_DECAY,
        agg_block_scale=AGG_SCALE, num_layers=DEPTH,
        total_steps=n_opt_steps, warmup_steps=WARMUP,
    )
    tx, lr_fn = make_optimizer(params, cfg)
    state = TrainState.create(params, tx)
    loss_cfg = SlotLossConfig(
        num_action_classes=A_CLS, num_scene_classes=SC_CLS,
        scene_criterion="KL", scene_loss_weight=4000.0,
        mask_prediction_loss_weight=1.0, mask_distill_loss_weight=3.0,
    )
    step = jax.jit(
        make_slot_train_step(
            model, jteacher, tx, loss_cfg,
            TrainStepConfig(update_freq=update_freq, use_fame=False), lr_fn,
        )
    )
    losses = []
    U = update_freq
    for s in range(n_opt_steps):
        vs = np.concatenate([batches[s * U + u][0] for u in range(U)], axis=0)
        ls = np.concatenate([batches[s * U + u][1] for u in range(U)], axis=0)
        state, metrics = step(
            state, tparams,
            {"videos": jnp.asarray(vs), "labels": jnp.asarray(ls)},
            jax.random.PRNGKey(0),
        )
        losses.append(float(metrics["loss"]))
    return state, losses


def _make_batches(n_micro, seed=3):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.normal(size=(B, FRAMES, 224, 224, 3)).astype(np.float32) * 0.5,
            rng.integers(0, A_CLS, size=B).astype(np.int64),
        )
        for _ in range(n_micro)
    ]


@pytest.mark.parametrize("update_freq,n_opt_steps", [(1, 6), (2, 4)])
def test_training_trajectory_matches_reference(update_freq, n_opt_steps):
    net, teacher = _build_reference()
    batches = _make_batches(n_opt_steps * update_freq)

    # snapshot initial weights (for the drift-vs-movement param criterion)
    init_imported = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "slot", agg_unique_layers=1
    )

    # repo side first (imports weights BEFORE reference training mutates them)
    state, repo_losses = _run_repo(net, teacher, batches, n_opt_steps, update_freq)

    stats, ref_micro_losses = _run_reference(
        net, teacher, batches, n_opt_steps, update_freq
    )

    # 1) per-step losses: the reference records one (undivided) loss per
    # micro-step; each repo step loss is the mean over its U microbatches
    assert len(ref_micro_losses) == n_opt_steps * update_freq
    ref_steps = [
        float(np.mean(ref_micro_losses[s * update_freq : (s + 1) * update_freq]))
        for s in range(n_opt_steps)
    ]
    np.testing.assert_allclose(
        repo_losses, ref_steps, rtol=1e-4,
        err_msg=f"per-step losses diverged (ref micro: {ref_micro_losses})",
    )
    assert stats["loss"] == pytest.approx(float(np.mean(ref_micro_losses)), rel=1e-5)

    # 2) final params: export the trained reference weights and compare leaf
    # by leaf against the repo's trained state. Criterion: the divergence
    # between the two trajectories must be tiny relative to how far
    # TRAINING moved each tensor (|final_ref - init|) — a wd-mask,
    # schedule-indexing, or lr-scale bug moves a whole group differently
    # (drift ~ O(1) of movement), while cross-framework f32 Adam noise
    # (rsqrt of near-zero second moments in the first steps) stays at the
    # e-4 level of movement. Per-step losses above already pin the forward
    # /loss semantics to 1e-4.
    final_imported = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "slot", agg_unique_layers=1
    )
    merged, _ = merge_params(jax.tree.map(np.asarray, state.params), final_imported)
    init_merged, _ = merge_params(jax.tree.map(np.asarray, state.params), init_imported)
    mismatches = []
    for (path, ours), (_, ref), (_, init) in zip(
        jax.tree_util.tree_flatten_with_path(state.params)[0],
        jax.tree_util.tree_flatten_with_path(merged)[0],
        jax.tree_util.tree_flatten_with_path(init_merged)[0],
    ):
        ours = np.asarray(ours, np.float32)
        ref = np.asarray(ref, np.float32)
        init = np.asarray(init, np.float32)
        movement = np.max(np.abs(ref - init))
        drift = np.max(np.abs(ours - ref))
        if movement < 1e-12:  # untrained leaf must be bit-identical
            ok = drift == 0.0
        else:
            # 5e-5 absolute floor: leaves whose gradient is ~zero (norm_q
            # bias moves ~1e-5 in 6 steps) sit at cross-framework float
            # noise; any real semantic bug (wd mask, lr scale, schedule)
            # moves a group by O(lr)=1e-3+ per step
            ok = drift <= max(0.02 * movement, 5e-5)
        if not ok:
            mismatches.append(
                (jax.tree_util.keystr(path), float(drift), float(movement))
            )
    assert not mismatches, f"params diverged after {n_opt_steps} steps: {mismatches[:10]}"
