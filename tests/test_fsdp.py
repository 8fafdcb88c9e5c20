"""FSDP / ZeRO-3 param+moment sharding (core/dist.py::shard_train_state
fsdp=True).

Beyond reference parity (the reference ships DeepSpeed configs but runs
stage 0 / plain DDP, SURVEY §2.8): params, EMA, AND AdamW moments are
sharded over the data axis; XLA's SPMD partitioner all-gathers each weight
at its first use and keeps only the shard resident between steps. Asserts
(a) numerical identity with the replicated placement, (b) the params are
actually sharded, and (c) the sharding survives the jitted step so the
memory saving is steady-state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from devias_tpu.core.dist import (
    DATA_AXIS, make_mesh, shard_batch, shard_train_state,
)
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    OptimConfig, TrainState, TrainStepConfig, make_optimizer,
    make_slot_train_step,
)

TINY = {"depth": 2, "embed_dim": 64, "num_heads": 4}


def _setup(use_ema=False):
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2, **TINY,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=4, use_mean_pooling=False, **TINY
    )
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    cfg = OptimConfig(lr=1e-3, min_lr=1e-3, warmup_lr=1e-3, total_steps=100)
    tx, _ = make_optimizer(params, cfg)
    loss_cfg = SlotLossConfig(num_action_classes=5, num_scene_classes=4)
    step = jax.jit(make_slot_train_step(
        model, teacher, tx, loss_cfg, TrainStepConfig(use_fame=False)
    ))
    state = TrainState.create(params, tx, use_ema=use_ema)
    return state, tparams, step


def _wide_leaves(tree):
    return [
        leaf for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "ndim") and leaf.ndim >= 2
    ]


def _data_sharded(leaf) -> bool:
    return DATA_AXIS in tuple(leaf.sharding.spec)


def test_fsdp_matches_replicated_and_stays_sharded():
    assert jax.device_count() >= 8
    state0, tparams, step = _setup()
    mesh = make_mesh()

    rng = np.random.default_rng(7)
    batch = shard_batch({
        "videos": jnp.asarray(rng.normal(size=(8, 4, 32, 32, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 5, size=8)),
    }, mesh)

    s_repl = shard_train_state(state0, mesh)
    s_f = shard_train_state(state0, mesh, fsdp=True)

    # placement: every >=2-D param AND moment leaf carries the data axis
    for leaf in _wide_leaves(s_f.params) + _wide_leaves(s_f.opt_state):
        assert _data_sharded(leaf), leaf.sharding

    losses_r, losses_f = [], []
    for i in range(3):
        key = jax.random.PRNGKey(i)
        s_repl, m_r = step(s_repl, tparams, batch, key)
        s_f, m_f = step(s_f, tparams, batch, key)
        losses_r.append(float(m_r["loss"]))
        losses_f.append(float(m_f["loss"]))

    np.testing.assert_allclose(losses_r, losses_f, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_repl.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # params stayed sharded through three jitted steps: the placement is
    # steady-state FSDP, not a first-step placement decaying to replication
    stayed = [_data_sharded(l) for l in _wide_leaves(s_f.params)]
    assert all(stayed), f"{sum(stayed)}/{len(stayed)} param leaves still sharded"
    stayed_m = [_data_sharded(l) for l in _wide_leaves(s_f.opt_state)]
    assert all(stayed_m), f"{sum(stayed_m)}/{len(stayed_m)} moments still sharded"


def test_fsdp_shards_ema_too():
    assert jax.device_count() >= 8
    mesh = make_mesh()
    params = {"w": jnp.zeros((16, 24)), "b": jnp.zeros((5,))}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx, use_ema=True)
    placed = shard_train_state(state, mesh, fsdp=True)
    assert _data_sharded(placed.params["w"])
    assert _data_sharded(placed.ema_params["w"])
    # non-divisible 1-D bias stays replicated (no crash, no padding)
    assert tuple(placed.params["b"].sharding.spec) == ()
    # step counter survives untouched
    assert int(placed.step) == 0


def _device0_bytes(tree, dev) -> int:
    """Bytes of `tree` actually resident on `dev` (addressable shard sizes,
    NOT the logical array sizes — the whole point of FSDP)."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "addressable_shards"):
            continue
        for s in leaf.addressable_shards:
            if s.device == dev:
                total += int(np.prod(s.data.shape)) * s.data.dtype.itemsize
    return total


@pytest.mark.slow
def test_fsdp_full_geometry_memory_and_parity():
    """The REAL slot ViT-B pytree (depth 12, dim 768, 8 tied agg rounds,
    400/365-way heads) under FSDP on the 8-device mesh: per-device
    params+moments bytes < replicated/4, and one training step matches the
    replicated placement (VERDICT r3 item 6 — the closest this environment
    gets to multi-chip memory truth; toy-geometry coverage is
    test_fsdp_matches_replicated_and_stays_sharded above).

    Input is kept tiny (2 frames @ 112px -> 49 tokens) — the memory claim
    is about the parameter pytree, which is full-size."""
    assert jax.device_count() >= 8
    mesh = make_mesh()

    model = create_model(
        "slot_vit_base_patch16_224", num_classes=400, num_scene_classes=365,
        num_latents=2, agg_depth=8, agg_weights_tie=True,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=365, use_mean_pooling=False
    )
    x = jnp.zeros((1, 2, 112, 112, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    tx, _ = make_optimizer(
        params, OptimConfig(lr=1e-3, min_lr=1e-3, warmup_lr=1e-3, total_steps=100)
    )
    step = jax.jit(make_slot_train_step(
        model, teacher, tx,
        SlotLossConfig(num_action_classes=400, num_scene_classes=365),
        TrainStepConfig(use_fame=False),
    ))
    state0 = TrainState.create(params, tx)

    s_repl = shard_train_state(state0, mesh)
    s_f = shard_train_state(state0, mesh, fsdp=True)

    dev0 = mesh.devices.flatten()[0]
    repl_bytes = _device0_bytes((s_repl.params, s_repl.opt_state), dev0)
    fsdp_bytes = _device0_bytes((s_f.params, s_f.opt_state), dev0)
    assert fsdp_bytes < repl_bytes / 4, (
        f"fsdp {fsdp_bytes/1e6:.1f} MB vs replicated {repl_bytes/1e6:.1f} MB"
    )

    rng = np.random.default_rng(11)
    batch = shard_batch({
        "videos": jnp.asarray(rng.normal(size=(8, 2, 112, 112, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 400, size=8)),
    }, mesh)
    key = jax.random.PRNGKey(0)
    s_repl, m_r = step(s_repl, tparams, batch, key)
    s_f, m_f = step(s_f, tparams, batch, key)
    np.testing.assert_allclose(float(m_r["loss"]), float(m_f["loss"]), rtol=1e-5)

    # sharding survived the jitted step AND the memory saving is steady-state
    post_bytes = _device0_bytes((s_f.params, s_f.opt_state), dev0)
    assert post_bytes < repl_bytes / 4, f"post-step {post_bytes/1e6:.1f} MB"


def test_fsdp_implies_zero1():
    assert jax.device_count() >= 8
    mesh = make_mesh()
    params = {"w": jnp.zeros((16, 24))}
    tx = optax.adam(1e-3)
    placed = shard_train_state(TrainState.create(params, tx), mesh, fsdp=True)
    mu = placed.opt_state[0].mu if hasattr(placed.opt_state[0], "mu") else None
    if mu is not None:
        assert _data_sharded(mu["w"])
