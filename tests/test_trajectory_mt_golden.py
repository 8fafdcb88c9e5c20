"""Multi-step training-trajectory golden for the MULTI-TASK engine.

Completes the trajectory-proof set (slot: test_trajectory_golden.py,
classification: test_trajectory_cls_golden.py): the reference
`engine_for_multi_task.train_one_epoch` (ref engine/engine_for_multi_task.py:
27-137) with the run script's own TrainLoss (action CE + scene logit
distillation, ref run_multi_task_finetuning.py:31-78) and a frozen scene
teacher, vs `make_multi_task_train_step` + `make_optimizer` from identical
imported weights. This doubles as the first reference-import oracle for
`multi_task_loss` (the VERDICT r2 table noted it had no torch oracle) and
pins the engine's micro-accumulation: the repo CLI gained real update_freq
support with this test.

Covers: KL (batchmean, log_target) and CE pseudo-label distillation,
unified_head teacher padding, update_freq 1 and 2. Determinism: drop rates
0, no mixup.
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
from devias_tpu.nn import create_model  # noqa: E402
from devias_tpu.train import (  # noqa: E402
    OptimConfig,
    TrainState,
    make_multi_task_train_step,
    make_optimizer,
)

load_reference()

from engine import engine_for_multi_task  # noqa: E402
from model import modeling_finetune, modeling_multi_task  # noqa: E402
from run_multi_task_finetuning import TrainLoss as MTTrainLoss  # noqa: E402
from utils import utils as ref_utils  # noqa: E402
from utils.optim_factory import LayerDecayValueAssigner, create_optimizer  # noqa: E402

A_CLS, SC_CLS = 7, 13
DEPTH, FRAMES, HEADS, DIM, IMG = 2, 4, 3, 192, 64
B = 2
LR, MIN_LR, WARMUP, WD, WD_END, LAYER_DECAY = 1e-3, 1e-5, 2, 0.05, 0.02, 0.75


class _Recording(torch.nn.Module):
    def __init__(self, inner):
        super().__init__()
        self.inner = inner
        self.values = []

    def forward(self, *a, **k):
        out = self.inner(*a, **k)
        self.values.append(float(out[0].detach()))
        return out


def _build_reference(unified_head):
    torch.manual_seed(13)
    norm = lambda d: torch.nn.LayerNorm(d, eps=1e-6)  # noqa: E731
    net = modeling_multi_task.VisionTransformer(
        img_size=IMG, patch_size=16, num_classes=A_CLS, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=norm, init_scale=0.001, all_frames=FRAMES,
        tubelet_size=2, unified_head=unified_head, num_scene_classes=SC_CLS,
    )
    teacher = modeling_finetune.VisionTransformer(
        img_size=IMG, patch_size=16, num_classes=SC_CLS, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, mlp_ratio=4.0, qkv_bias=True,
        norm_layer=norm, all_frames=FRAMES, tubelet_size=2,
        use_mean_pooling=False, init_scale=1.0,
    )
    teacher.eval()
    for p in teacher.parameters():
        p.requires_grad_(False)
    return net, teacher


def _run_reference(net, teacher, batches, n_opt_steps, update_freq,
                   logit_criterion, unified_head):
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
    train_criterion = _Recording(MTTrainLoss(
        criterion=torch.nn.CrossEntropyLoss(), logit_criterion=logit_criterion,
        unified_head=unified_head, num_action_classes=A_CLS,
        logit_criterion_weight=1.0,
    ))
    loader = [
        (torch.from_numpy(v.transpose(0, 4, 1, 2, 3)).contiguous(),
         torch.from_numpy(l), 0, 0)
        for v, l in batches
    ]
    scaler = ref_utils.NativeScalerWithGradNormCount()
    _orig_sd = scaler._scaler.state_dict
    scaler._scaler.state_dict = lambda: {"scale": 1.0, **_orig_sd()}
    stats = engine_for_multi_task.train_one_epoch(
        net, teacher, train_criterion, loader, optimizer, torch.device("cpu"),
        epoch=0, loss_scaler=scaler, max_norm=None, mixup_fn=None,
        start_steps=0, lr_schedule_values=lr_sched, wd_schedule_values=wd_sched,
        num_training_steps_per_epoch=n_opt_steps, update_freq=update_freq,
    )
    return stats, train_criterion.values


def _run_repo(net, teacher, batches, n_opt_steps, update_freq,
              logit_criterion, unified_head):
    model = create_model(
        "disentangle_vit_base_patch16_224", num_classes=A_CLS,
        num_scene_classes=SC_CLS, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, unified_head=unified_head,
    )
    jteacher = create_model(
        "vit_base_patch16_224", num_classes=SC_CLS, embed_dim=DIM,
        depth=DEPTH, num_heads=HEADS, use_mean_pooling=False,
    )
    x0 = jnp.zeros((B, FRAMES, IMG, IMG, 3), jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    imported = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "multi_task"
    )
    params, info = merge_params(init, imported)
    assert not info["unused_in_ckpt"], info["unused_in_ckpt"]

    tinit = jteacher.init({"params": jax.random.PRNGKey(1)}, x0)["params"]
    tparams, tinfo = merge_params(
        tinit, import_torch_state_dict(torch_state_dict_to_numpy(teacher), "plain")
    )
    assert not tinfo["unused_in_ckpt"], tinfo["unused_in_ckpt"]

    cfg = OptimConfig(
        lr=LR, min_lr=MIN_LR, warmup_lr=0.0, weight_decay=WD,
        weight_decay_end=WD_END, layer_decay=LAYER_DECAY, num_layers=DEPTH,
        total_steps=n_opt_steps, warmup_steps=WARMUP,
    )
    tx, lr_fn = make_optimizer(params, cfg)
    state = TrainState.create(params, tx)
    step = jax.jit(make_multi_task_train_step(
        model, jteacher, tx, num_action_classes=A_CLS,
        logit_criterion=logit_criterion, unified_head=unified_head,
        update_freq=update_freq, lr_fn=lr_fn,
    ))
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


def _make_batches(n_micro, seed=9):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.normal(size=(B, FRAMES, IMG, IMG, 3)).astype(np.float32) * 0.5,
            rng.integers(0, A_CLS, size=B).astype(np.int64),
        )
        for _ in range(n_micro)
    ]


@pytest.mark.parametrize(
    "update_freq,n_opt_steps,logit_criterion,unified_head",
    [(1, 6, "KL", False), (2, 4, "CE", True)],
)
def test_multi_task_trajectory_matches_reference(
    update_freq, n_opt_steps, logit_criterion, unified_head
):
    net, teacher = _build_reference(unified_head)
    batches = _make_batches(n_opt_steps * update_freq)

    init_sd = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "multi_task"
    )

    state, repo_losses = _run_repo(
        net, teacher, batches, n_opt_steps, update_freq,
        logit_criterion, unified_head,
    )
    stats, ref_micro = _run_reference(
        net, teacher, batches, n_opt_steps, update_freq,
        logit_criterion, unified_head,
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

    # final params: drift between trajectories tiny vs training movement
    # (same criterion as the slot/classification trajectory tests)
    final_sd = import_torch_state_dict(
        torch_state_dict_to_numpy(net), "multi_task"
    )
    merged, _ = merge_params(jax.tree.map(np.asarray, state.params), final_sd)
    init_merged, _ = merge_params(jax.tree.map(np.asarray, state.params), init_sd)
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
    assert not mismatches, f"params diverged: {mismatches[:10]}"
