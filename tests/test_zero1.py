"""ZeRO-1 optimizer-state sharding (core/dist.py::shard_train_state).

Beyond reference parity (the reference ships DeepSpeed configs but runs
stage 0 / plain DDP, SURVEY §2.8): the AdamW moments — 2x the params in
f32, the largest replicated buffers of a DP run — are sharded over the
data axis. These tests assert (a) training is numerically identical to
the replicated placement, (b) the moments are actually sharded, and
(c) the sharding SURVIVES the jitted step (propagation, not a one-time
placement), so the memory saving holds across a whole run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from devias_tpu.core.dist import (
    DATA_AXIS, make_mesh, shard_batch, shard_train_state, zero1_spec,
)
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    OptimConfig, TrainState, TrainStepConfig, make_optimizer,
    make_slot_train_step,
)
from jax.sharding import PartitionSpec as P

TINY = {"depth": 2, "embed_dim": 64, "num_heads": 4}


def test_zero1_spec_picks_first_divisible_axis():
    n = 8
    assert zero1_spec(jnp.zeros((64, 192)), n) == P(DATA_AXIS)
    assert zero1_spec(jnp.zeros((3, 16)), n) == P(None, DATA_AXIS)
    assert zero1_spec(jnp.zeros((5, 7)), n) == P()  # nothing divisible
    assert zero1_spec(jnp.zeros(()), n) == P()  # scalar (count)
    assert zero1_spec(jnp.zeros((8,), jnp.int32), n) == P()  # integer leaf


def _moment_leaves(opt_state):
    return [
        leaf for leaf in jax.tree.leaves(opt_state)
        if hasattr(leaf, "ndim") and leaf.ndim >= 2
    ]


def _setup():
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
    return params, tparams, tx, step


def test_zero1_matches_replicated_and_stays_sharded():
    assert jax.device_count() >= 8
    params, tparams, tx, step = _setup()
    mesh = make_mesh()

    rng = np.random.default_rng(7)
    batch = {
        "videos": jnp.asarray(rng.normal(size=(8, 4, 32, 32, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 5, size=8)),
    }
    sharded_batch = shard_batch(batch, mesh)

    s_repl = shard_train_state(TrainState.create(params, tx), mesh, zero1=False)
    s_z1 = shard_train_state(TrainState.create(params, tx), mesh, zero1=True)

    # placement: every >=2-D moment leaf carries the data axis
    for leaf in _moment_leaves(s_z1.opt_state):
        assert DATA_AXIS in tuple(leaf.sharding.spec), leaf.sharding

    losses_r, losses_z = [], []
    for i in range(3):
        key = jax.random.PRNGKey(i)
        s_repl, m_r = step(s_repl, tparams, sharded_batch, key)
        s_z1, m_z = step(s_z1, tparams, sharded_batch, key)
        losses_r.append(float(m_r["loss"]))
        losses_z.append(float(m_z["loss"]))

    np.testing.assert_allclose(losses_r, losses_z, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_repl.params), jax.tree.leaves(s_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    # the sharding survived three jitted steps — the memory saving is
    # steady-state, not a first-step placement that decays to replication
    stayed = [
        DATA_AXIS in tuple(leaf.sharding.spec)
        for leaf in _moment_leaves(s_z1.opt_state)
    ]
    assert all(stayed), f"{sum(stayed)}/{len(stayed)} moment leaves still sharded"


def test_zero1_small_leaves_replicated():
    """1-D bias moments whose dim is not divisible stay replicated (no
    crash, no padding)."""
    assert jax.device_count() >= 8
    mesh = make_mesh()
    params = {"w": jnp.zeros((16, 24)), "b": jnp.zeros((5,))}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)
    placed = shard_train_state(state, mesh, zero1=True)
    mu = placed.opt_state[0].mu if hasattr(placed.opt_state[0], "mu") else None
    if mu is None:
        pytest.skip("optax state layout changed")
    assert DATA_AXIS in tuple(mu["w"].sharding.spec)
    assert tuple(mu["b"].sharding.spec) == ()
