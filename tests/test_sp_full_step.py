"""The FULL slot training step under sequence parallelism: make_slot_
train_step with a (data, seq) mesh runs the backbone sequence-parallel
(frame/token axis sharded, attention K/V all_gathered, per-shard rng —
core/dist.py::seq_parallel_tokens) and the agg block / unified head /
Hungarian loss / optimizer on the full token tensor. Exactness vs the
unsharded step on the 8-device CPU mesh, plus a stochastic (dropout +
drop_path) training smoke at the published-recipe rates.

Reference being exceeded: the reference is DP-only
(ref utils/utils.py:249-282 DDP); this is the TPU-native beyond-parity
mode now wired end to end (--sp_shards on run_slot_finetuning).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.core.dist import make_sp_mesh
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    OptimConfig,
    TrainState,
    TrainStepConfig,
    make_optimizer,
    make_slot_train_step,
)

A_CLS, SC_CLS = 5, 9
B, T, HW = 8, 4, 32


def _setup():
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=A_CLS,
        num_scene_classes=SC_CLS, depth=4, embed_dim=64, num_heads=4,
        num_latents=2, agg_depth=2,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=SC_CLS, depth=2, embed_dim=64,
        num_heads=4, use_mean_pooling=False,
    )
    x0 = jnp.zeros((B, T, HW, HW, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x0)["params"]
    cfg = OptimConfig(lr=1e-3, total_steps=20, warmup_steps=0, num_layers=4)
    tx, lr_fn = make_optimizer(params, cfg)
    loss_cfg = SlotLossConfig(num_action_classes=A_CLS, num_scene_classes=SC_CLS)
    rng = np.random.default_rng(0)
    batches = [
        {
            "videos": jnp.asarray(
                rng.normal(size=(B, T, HW, HW, 3)).astype(np.float32) * 0.3
            ),
            "labels": jnp.asarray(rng.integers(0, A_CLS, size=B)),
        }
        for _ in range(2)
    ]
    return model, teacher, params, tparams, tx, lr_fn, loss_cfg, batches


def test_sp_full_step_matches_unsharded():
    model, teacher, params, tparams, tx, lr_fn, loss_cfg, batches = _setup()
    mesh = make_sp_mesh(2)  # 4 data x 2 seq over the 8 CPU devices
    scfg = TrainStepConfig(use_fame=False)

    step_ref = jax.jit(make_slot_train_step(model, teacher, tx, loss_cfg, scfg, lr_fn))
    step_sp = jax.jit(
        make_slot_train_step(
            model, teacher, tx, loss_cfg, scfg, lr_fn, sp_mesh=mesh
        )
    )

    s_ref = TrainState.create(params, tx)
    s_sp = TrainState.create(params, tx)
    for i, batch in enumerate(batches):
        s_ref, m_ref = step_ref(s_ref, tparams, batch, jax.random.PRNGKey(5))
        with mesh:
            s_sp, m_sp = step_sp(s_sp, tparams, batch, jax.random.PRNGKey(5))
        assert float(m_sp["loss"]) == pytest.approx(float(m_ref["loss"]), rel=2e-4), i

    for path, ours in jax.tree_util.tree_leaves_with_path(s_sp.params):
        ref = dict(jax.tree_util.tree_leaves_with_path(s_ref.params))[path]
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_sp_pp_mutually_exclusive():
    model, teacher, params, tparams, tx, lr_fn, loss_cfg, _ = _setup()
    from devias_tpu.core.pipeline import make_pp_mesh

    with pytest.raises(ValueError, match="mutually exclusive"):
        make_slot_train_step(
            model, teacher, tx, loss_cfg, TrainStepConfig(), lr_fn,
            pp_mesh=make_pp_mesh(2), sp_mesh=make_sp_mesh(2),
        )


def test_sp_full_step_stochastic_smoke():
    """drop_path 0.2 + dropout (the published recipe's regularization,
    docs/TRAIN.md) trains under SP with per-shard rng: finite loss/grads,
    params move."""
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=A_CLS,
        num_scene_classes=SC_CLS, depth=4, embed_dim=64, num_heads=4,
        num_latents=2, agg_depth=2, drop_path_rate=0.2, drop_rate=0.1,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=SC_CLS, depth=2, embed_dim=64,
        num_heads=4, use_mean_pooling=False,
    )
    x0 = jnp.zeros((B, T, HW, HW, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x0)["params"]
    tx, lr_fn = make_optimizer(
        params, OptimConfig(lr=1e-3, total_steps=20, warmup_steps=0, num_layers=4)
    )
    loss_cfg = SlotLossConfig(num_action_classes=A_CLS, num_scene_classes=SC_CLS)
    mesh = make_sp_mesh(2)
    step = jax.jit(
        make_slot_train_step(
            model, teacher, tx, loss_cfg,
            TrainStepConfig(use_fame=True), lr_fn,
            sp_mesh=mesh,
        )
    )
    state = TrainState.create(params, tx)
    rng = np.random.default_rng(1)
    batch = {
        "videos": jnp.asarray(
            np.abs(rng.normal(size=(B, T, HW, HW, 3))).astype(np.float32) % 1.0
        ),
        "labels": jnp.asarray(rng.integers(0, A_CLS, size=B)),
    }
    with mesh:
        new_state, metrics = step(state, tparams, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        state.params, new_state.params,
    )
    assert max(jax.tree.leaves(moved)) > 0.0
