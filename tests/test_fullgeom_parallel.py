"""PP / SP / TP full-step exactness at FULL ViT-B geometry (VERDICT r4
item 4): the real slot pytree — depth 12, dim 768, 12 heads, 8 tied agg
rounds, 400/365-way unified head — stepping under `--pp_stages 2`,
`--sp_shards 2`, and `--tp_size 2` on the 8-device CPU mesh, each
asserting loss parity vs the unsharded step.

The toy-geometry tiers (tests/test_{pp,sp,tp}_full_step.py, depth-4
dim-64 models) prove the mechanics; these tiers prove the *geometry* —
stage-boundary splits at 12 layers, GSPMD resharding of the tied-agg scan
under TP, and frame-shard token counts at the real tubelet layout only
exist at full size. Input is kept tiny (4 frames @ 112px -> 98 tokens):
the geometry claim is about the parameter pytree and layer counts, which
are full-size (same trick as test_fsdp.py::
test_fsdp_full_geometry_memory_and_parity).

Reference being exceeded: the reference is DP-only
(ref utils/utils.py:249-282 DDP).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    OptimConfig,
    TrainState,
    TrainStepConfig,
    make_optimizer,
    make_slot_train_step,
)

B, T, HW = 8, 4, 112  # 4 frames @ 112px -> 2 x 49 = 98 tokens


@pytest.fixture(scope="module")
def fullgeom():
    assert jax.device_count() >= 8
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=400, num_scene_classes=365,
        num_latents=2, agg_depth=8, agg_weights_tie=True,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=365, use_mean_pooling=False
    )
    x0 = jnp.zeros((B, T, HW, HW, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x0)["params"]
    cfg = OptimConfig(lr=1e-3, total_steps=20, warmup_steps=0)
    tx, lr_fn = make_optimizer(params, cfg)
    loss_cfg = SlotLossConfig(num_action_classes=400, num_scene_classes=365)
    rng = np.random.default_rng(0)
    batch = {
        "videos": jnp.asarray(
            rng.normal(size=(B, T, HW, HW, 3)).astype(np.float32) * 0.3
        ),
        "labels": jnp.asarray(rng.integers(0, 400, size=B)),
    }
    scfg = TrainStepConfig(use_fame=False)
    step_ref = jax.jit(make_slot_train_step(model, teacher, tx, loss_cfg, scfg, lr_fn))
    _, m_ref = step_ref(
        TrainState.create(params, tx), tparams, batch, jax.random.PRNGKey(5)
    )
    return {
        "model": model, "teacher": teacher, "params": params,
        "tparams": tparams, "tx": tx, "lr_fn": lr_fn, "loss_cfg": loss_cfg,
        "batch": batch, "ref_loss": float(m_ref["loss"]),
    }


@pytest.mark.slow
def test_pp_full_geometry(fullgeom):
    """12 backbone layers split 2x6 under the GPipe schedule; agg/heads/
    loss on the full token tensor (train/step.py pp_mesh path)."""
    from devias_tpu.core.pipeline import make_pp_mesh

    f = fullgeom
    mesh = make_pp_mesh(2)  # 4 data x 2 pipe
    step = jax.jit(
        make_slot_train_step(
            f["model"], f["teacher"], f["tx"], f["loss_cfg"],
            TrainStepConfig(use_fame=False, pp_microbatches=2),
            f["lr_fn"], pp_mesh=mesh,
        )
    )
    s = TrainState.create(f["params"], f["tx"])
    with mesh:
        s, m = step(s, f["tparams"], f["batch"], jax.random.PRNGKey(5))
    assert float(m["loss"]) == pytest.approx(f["ref_loss"], rel=2e-4)
    assert int(jax.device_get(s.step)) == 1


@pytest.mark.slow
def test_sp_full_geometry(fullgeom):
    """Frame axis sharded 2-way (2 tubelet groups x 49 tokens) through all
    12 layers with K/V all_gather (train/step.py sp_mesh path)."""
    from devias_tpu.core.dist import make_sp_mesh

    f = fullgeom
    mesh = make_sp_mesh(2)  # 4 data x 2 seq
    step = jax.jit(
        make_slot_train_step(
            f["model"], f["teacher"], f["tx"], f["loss_cfg"],
            TrainStepConfig(use_fame=False), f["lr_fn"], sp_mesh=mesh,
        )
    )
    s = TrainState.create(f["params"], f["tx"])
    with mesh:
        s, m = step(s, f["tparams"], f["batch"], jax.random.PRNGKey(5))
    assert float(m["loss"]) == pytest.approx(f["ref_loss"], rel=2e-4)
    assert int(jax.device_get(s.step)) == 1


@pytest.mark.slow
def test_tp_full_geometry(fullgeom):
    """Megatron placements on the real pytree — 12 heads split 2-way in
    every attention, column/row-parallel MLPs, the tied-agg scan resharded
    by GSPMD — with the step function unchanged."""
    from devias_tpu.core.dist import MODEL_AXIS, make_mesh, shard_train_state

    f = fullgeom
    mesh = make_mesh(model_parallel=2)  # 4 data x 2 model
    step = jax.jit(
        make_slot_train_step(
            f["model"], f["teacher"], f["tx"], f["loss_cfg"],
            TrainStepConfig(use_fame=False), f["lr_fn"],
        )
    )
    s = shard_train_state(TrainState.create(f["params"], f["tx"]), mesh, tp=True)
    n_tp = sum(
        MODEL_AXIS in jax.tree.leaves(tuple(l.sharding.spec))
        for l in jax.tree.leaves(s.params)
        if hasattr(l, "sharding") and getattr(l.sharding, "spec", None) is not None
    )
    assert n_tp > 50, f"only {n_tp} TP-sharded param leaves at full geometry"
    with mesh:
        s, m = step(s, f["tparams"], f["batch"], jax.random.PRNGKey(5))
    assert float(m["loss"]) == pytest.approx(f["ref_loss"], rel=2e-4)
    # placements survive the step — GSPMD may propagate the model axis
    # onto MORE leaves (co-sharding biases with their matmuls), never fewer
    n_post = sum(
        MODEL_AXIS in jax.tree.leaves(tuple(l.sharding.spec))
        for l in jax.tree.leaves(s.params)
        if hasattr(l, "sharding") and getattr(l.sharding, "spec", None) is not None
    )
    assert n_post >= n_tp
