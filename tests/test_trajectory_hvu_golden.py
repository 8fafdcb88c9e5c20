"""Multi-step training-trajectory golden for the HVU engine.

Completes the trajectory-proof set over all four train engines (slot:
test_trajectory_golden.py, classification: test_trajectory_cls_golden.py,
multi-task: test_trajectory_mt_golden.py): the reference
`engine_for_slot_hvu.train_one_epoch` (ref engine/engine_for_slot_hvu.py:
23-150) with the real HVU TrainLoss (ref utils/loss/hvu_train_loss.py) and
real `get_parameter_groups` layer-decay/agg-scale groups (ref
utils/optim_factory.py:49-93), vs `make_hvu_train_step` + `make_optimizer`
from identical imported weights.

DeepSpeed emulation: the reference trains HVU ONLY through DeepSpeed — its
non-DS branch dereferences an undefined `targets`/mis-orders the criterion
args (ref engine_for_slot_hvu.py:72-77, a dead branch) — and deepspeed is
not importable here. `_DSEngine` below emulates exactly the engine-API
surface train_one_epoch touches (backward accumulates, step() applies
AdamW at accumulation boundaries, optimizer.cur_scale for the metric read
at engine_for_slot_hvu.py:20-21) in f32, with torch.optim.AdamW over the
reference's own param groups — bias-corrected AdamW, identical to the DS
config's adam_w_mode optimizer (ref utils/utils.py:create_ds_config).
update_freq stays 1: for U>1 DeepSpeed's scale_wrt_gas would divide the
(already engine-divided) loss again, a DS-internal semantic we cannot
verify without the package; micro-accumulation itself is goldened with
U=2 in the other three trajectory tests.

The engine's DS branch also calls `samples.half()` (fp16 under DS); the
test neutralizes it with a scoped torch.Tensor.half patch so both sides
run f32 (same convention as the slot golden's disabled GradScaler).

Determinism: drop rates 0, no mixup, fixed zero-mask FAME stand-in.
"""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import sys  # noqa: E402

from _ref_oracle import load_reference, torch_state_dict_to_numpy  # noqa: E402
from devias_tpu.ckpt import import_torch_state_dict  # noqa: E402
from devias_tpu.ckpt.torch_import import merge_params  # noqa: E402
from devias_tpu.losses import SlotLossConfig  # noqa: E402
from devias_tpu.nn import create_model  # noqa: E402
from devias_tpu.train import (  # noqa: E402
    OptimConfig,
    TrainState,
    TrainStepConfig,
    make_hvu_train_step,
    make_optimizer,
)

load_reference()

# hvu_train_loss and engine_for_slot_hvu both import the class counts from
# the (deepspeed-importing) entry script; stub just those two constants with
# reduced values (same trick as test_reference_golden.py::test_hvu_loss_golden)
A_CLS, SC_CLS = 13, 7
_stub = types.ModuleType("run_slot_finetuning_hvu")
_stub.HVU_NUM_ACTION_CLASSES = A_CLS
_stub.HVU_NUM_SCENE_CLASSES = SC_CLS
sys.modules["run_slot_finetuning_hvu"] = _stub

from engine import engine_for_slot_hvu  # noqa: E402
from model import modeling_slot  # noqa: E402
from utils import utils as ref_utils  # noqa: E402
from utils.loss.hvu_train_loss import TrainLoss as HVUTrainLoss  # noqa: E402
from utils.optim_factory import (  # noqa: E402
    LayerDecayValueAssigner,
    get_parameter_groups,
)

DEPTH, FRAMES, AGG_DEPTH, HEADS = 2, 4, 2, 12
B = 2
LR, MIN_LR, WARMUP, WD, WD_END, LAYER_DECAY, AGG_SCALE = (
    1e-3, 1e-5, 2, 0.05, 0.02, 0.75, 0.1,
)


class _Recording(torch.nn.Module):
    def __init__(self, inner):
        super().__init__()
        self.inner = inner
        self.values = []

    def forward(self, *a, **k):
        out = self.inner(*a, **k)
        self.values.append(float(out[0].detach().squeeze()))
        return out


class _DSEngine(torch.nn.Module):
    """The slice of the DeepSpeed engine API train_one_epoch uses (see
    module docstring)."""

    def __init__(self, net, optimizer, update_freq):
        super().__init__()
        self.module = net
        self.optimizer = optimizer
        self.update_freq = update_freq
        self.micro_steps = 0
        optimizer.cur_scale = 1.0  # read by get_loss_scale_for_deepspeed

    def forward(self, *a, **k):
        return self.module(*a, **k)

    def backward(self, loss):
        loss.backward()

    def step(self):
        self.micro_steps += 1
        if self.micro_steps % self.update_freq == 0:
            self.optimizer.step()
            self.optimizer.zero_grad()


class FixedFAMEMask:
    """Identity on videos/labels, zero masks — the engine selects the FAME
    branch via `'FAME' in str(mask_model)` (ref engine_for_slot_hvu.py:64);
    the non-FAME branch is unreachable (`masks` undefined)."""

    def __call__(self, samples, action_targets, scene_targets):
        bs = samples.shape[0]
        n_tok = 196 * (FRAMES // 2)
        return samples, action_targets, scene_targets, (
            torch.zeros(bs, 196), torch.zeros(bs, n_tok),
        )

    def __str__(self):
        return "FixedFAMEMask(FAME)"


def _build_reference():
    torch.manual_seed(11)
    norm = lambda d: torch.nn.LayerNorm(d, eps=1e-6)  # noqa: E731
    net = modeling_slot.VisionTransformer(
        img_size=224, patch_size=16, num_classes=A_CLS, embed_dim=768,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=norm, init_scale=0.001, all_frames=FRAMES,
        tubelet_size=2, num_latents=2, slot_matching_method="matching",
        num_scene_classes=SC_CLS, agg_weights_tie=True, agg_depth=AGG_DEPTH,
    )
    return net


def _run_reference(net, batches, n_opt_steps):
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None
    assigner = LayerDecayValueAssigner(
        list(LAYER_DECAY ** (DEPTH + 1 - i) for i in range(DEPTH + 2))
    )
    groups = get_parameter_groups(
        net, WD, net.no_weight_decay(),
        assigner.get_layer_id, assigner.get_scale, agg_block_scale=AGG_SCALE,
    )
    optimizer = torch.optim.AdamW(groups, lr=LR, betas=(0.9, 0.999), eps=1e-8)
    model = _DSEngine(net, optimizer, update_freq=1)

    lr_sched = ref_utils.cosine_scheduler(
        LR, MIN_LR, 1, n_opt_steps, warmup_epochs=1, warmup_steps=WARMUP,
        start_warmup_value=0.0,
    )
    wd_sched = ref_utils.cosine_scheduler(WD, WD_END, 1, n_opt_steps)
    train_criterion = _Recording(
        HVUTrainLoss(
            criterion=None,  # constructed but unused by the loss (quirk)
            scene_criterion="CE",
            slot_matching_method="matching",
            mask_prediction_loss_weight=1.0,
            mask_distill_loss_weight=1.0,
        )
    )
    loader = [
        (
            torch.from_numpy(v.transpose(0, 4, 1, 2, 3)).contiguous(),
            torch.from_numpy(al),
            torch.from_numpy(sl.copy()),  # the loss mutates these in place
            0, 0,
        )
        for v, al, sl in batches
    ]
    orig_half = torch.Tensor.half
    torch.Tensor.half = lambda self: self  # DS-branch fp16 cast -> f32 no-op
    try:
        stats = engine_for_slot_hvu.train_one_epoch(
            model, train_criterion, loader, optimizer,
            torch.device("cpu"), epoch=0, loss_scaler=None, max_norm=None,
            start_steps=0, lr_schedule_values=lr_sched,
            wd_schedule_values=wd_sched,
            num_training_steps_per_epoch=n_opt_steps, update_freq=1,
            mask_model=FixedFAMEMask(), args=None,
        )
    finally:
        torch.Tensor.half = orig_half
    return stats, train_criterion.values


def _run_repo(net, batches, n_opt_steps):
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=A_CLS,
        num_scene_classes=SC_CLS, depth=DEPTH, num_heads=HEADS,
        num_latents=2, agg_depth=AGG_DEPTH, agg_weights_tie=True,
        slot_matching_method="matching",
    )
    x0 = jnp.zeros((B, FRAMES, 224, 224, 3), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    imported = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "slot", agg_unique_layers=1
    )
    params, info = merge_params(init, imported)
    assert not info["unused_in_ckpt"], info["unused_in_ckpt"]

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
        scene_criterion="CE",
        mask_prediction_loss_weight=1.0, mask_distill_loss_weight=1.0,
    )
    step = jax.jit(
        make_hvu_train_step(
            model, tx, loss_cfg,
            TrainStepConfig(update_freq=1, use_fame=False), lr_fn,
        )
    )
    losses = []
    for s in range(n_opt_steps):
        v, al, sl = batches[s]
        state, metrics = step(
            state,
            {
                "videos": jnp.asarray(v),
                "labels": jnp.asarray(al),
                "scene_labels": jnp.asarray(sl),
            },
            jax.random.PRNGKey(0),
        )
        losses.append(float(metrics["loss"]))
    return state, losses


def _make_batches(n, seed=5):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.normal(size=(B, FRAMES, 224, 224, 3)).astype(np.float32) * 0.5,
            rng.integers(0, A_CLS, size=B).astype(np.int64),
            rng.integers(0, SC_CLS, size=B).astype(np.int64),
        )
        for _ in range(n)
    ]


def test_hvu_trajectory_matches_reference():
    n_opt_steps = 6
    net = _build_reference()
    batches = _make_batches(n_opt_steps)

    init_imported = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "slot", agg_unique_layers=1
    )

    state, repo_losses = _run_repo(net, batches, n_opt_steps)
    stats, ref_losses = _run_reference(net, batches, n_opt_steps)

    assert len(ref_losses) == n_opt_steps
    np.testing.assert_allclose(
        repo_losses, ref_losses, rtol=1e-4,
        err_msg=f"per-step losses diverged (ref: {ref_losses})",
    )
    assert stats["loss"] == pytest.approx(float(np.mean(ref_losses)), rel=1e-5)

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
        if movement < 1e-12:
            ok = drift == 0.0
        else:
            ok = drift <= max(0.02 * movement, 5e-5)
        if not ok:
            mismatches.append(
                (jax.tree_util.keystr(path), float(drift), float(movement))
            )
    assert not mismatches, f"params diverged after {n_opt_steps} steps: {mismatches[:10]}"
