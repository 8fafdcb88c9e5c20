"""The FULL slot training step under tensor parallelism: --tp_size places
params/EMA/AdamW moments with Megatron-style shardings (column-parallel
QKV/MLP-up, row-parallel proj/MLP-down — core/dist.py::tp_param_spec) on
a (data, model) mesh and runs the UNCHANGED train step; GSPMD derives the
all-reduces. Exactness vs the unsharded step on the 8-device CPU mesh,
placement survival across steps, and the zero1/fsdp exclusion guard.

Reference being exceeded: the reference is DP-only
(ref utils/utils.py:249-282 DDP); this is the TPU-native beyond-parity
mode now wired end to end (--tp_size on run_slot_finetuning).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.core.dist import (
    MODEL_AXIS,
    make_mesh,
    shard_train_state,
)
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


def _tp_sharded_leaves(params):
    """Leaves whose placement spans the model axis."""
    out = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        spec = getattr(leaf.sharding, "spec", None)
        if spec is not None and MODEL_AXIS in jax.tree.leaves(tuple(spec)):
            out.append(jax.tree_util.keystr(path))
    return out


def test_tp_full_step_matches_unsharded():
    model, teacher, params, tparams, tx, lr_fn, loss_cfg, batches = _setup()
    mesh = make_mesh(model_parallel=2)  # 4 data x 2 model over 8 devices
    scfg = TrainStepConfig(use_fame=False)

    step = jax.jit(make_slot_train_step(model, teacher, tx, loss_cfg, scfg, lr_fn))

    s_ref = TrainState.create(params, tx)
    s_tp = shard_train_state(TrainState.create(params, tx), mesh, tp=True)
    assert _tp_sharded_leaves(s_tp.params), "no TP-sharded params"

    for i, batch in enumerate(batches):
        s_ref, m_ref = step(s_ref, tparams, batch, jax.random.PRNGKey(5))
        with mesh:
            s_tp, m_tp = step(s_tp, tparams, batch, jax.random.PRNGKey(5))
        assert float(m_tp["loss"]) == pytest.approx(float(m_ref["loss"]), rel=2e-4), i

    # the Megatron placement must survive the jitted step
    assert _tp_sharded_leaves(s_tp.params), "TP sharding lost across steps"

    for path, ours in jax.tree_util.tree_leaves_with_path(s_tp.params):
        ref = dict(jax.tree_util.tree_leaves_with_path(s_ref.params))[path]
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_tp_excludes_zero1_fsdp():
    model, teacher, params, tparams, tx, lr_fn, loss_cfg, _ = _setup()
    mesh = make_mesh(model_parallel=2)
    with pytest.raises(ValueError, match="not supported"):
        shard_train_state(TrainState.create(params, tx), mesh, tp=True, zero1=True)
