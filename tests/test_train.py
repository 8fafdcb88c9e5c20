"""Training layer tests: optimizer grouping semantics, train steps, grad
accumulation equivalence, DP sharding on the 8-device CPU mesh, loss
decrease on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from devias_tpu.core.dist import make_mesh
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    OptimConfig,
    TrainState,
    TrainStepConfig,
    build_lr_scale_tree,
    build_wd_mask_tree,
    make_classification_train_step,
    make_optimizer,
    make_slot_train_step,
    make_hvu_train_step,
    place_data_parallel,
)
from devias_tpu.aug.fame import FAMEConfig

TINY = dict(depth=2, embed_dim=64, num_heads=4)


def _slot_setup(num_latents=2):
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=num_latents, agg_depth=2, **TINY,
    )
    teacher = create_model("vit_base_patch16_224", num_classes=4, **TINY)
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    return model, teacher, params, tparams


def test_lr_scale_tree_layer_decay_and_agg_scale():
    model, _, params, _ = _slot_setup()
    cfg = OptimConfig(layer_decay=0.75, agg_block_scale=0.1, num_layers=2)
    scales = build_lr_scale_tree(params, cfg)
    # patch embed -> layer 0 -> 0.75^3; block_1 -> layer 2 -> 0.75^1; head -> 1
    assert np.isclose(scales["backbone"]["patch_embed"]["kernel"], 0.75**3)
    assert np.isclose(scales["backbone"]["blocks_0"]["attn"]["qkv_kernel"], 0.75**2)
    assert np.isclose(scales["backbone"]["blocks_1"]["attn"]["qkv_kernel"], 0.75**1)
    assert np.isclose(scales["head"]["kernel"], 1.0)
    # all agg_block leaves get the agg scale (ref optim_factory.py:77-78)
    assert np.isclose(scales["agg_block"]["latents"], 0.1)
    assert np.isclose(scales["agg_block"]["layers_0"]["cross_attn"]["to_q"]["kernel"], 0.1)


def test_wd_mask_excludes_biases_and_1d():
    _, _, params, _ = _slot_setup()
    mask = build_wd_mask_tree(params)
    assert mask["backbone"]["blocks_0"]["attn"]["qkv_kernel"] is True
    assert mask["backbone"]["blocks_0"]["attn"]["q_bias"] is False
    assert mask["backbone"]["blocks_0"]["norm1"]["scale"] is False
    assert mask["head"]["bias"] is False
    assert mask["agg_block"]["latents"] is True  # 2-D, decayed (ref behavior)


def test_adamw_single_step_matches_torch():
    """One optimizer step on a toy param must equal torch.optim.AdamW."""
    w0 = np.asarray([[1.0, -2.0], [0.5, 3.0]], np.float32)
    g = np.asarray([[0.1, -0.2], [0.3, 0.05]], np.float32)
    lr, wd = 1e-3, 0.05

    params = {"w": jnp.asarray(w0)}
    cfg = OptimConfig(
        lr=lr, min_lr=lr, warmup_lr=lr, weight_decay=wd, total_steps=10, warmup_steps=0
    )
    tx, _ = make_optimizer(params, cfg)
    st = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g)}, st, params)
    new_w = np.asarray(optax.apply_updates(params, updates)["w"])

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([wt], lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)
    wt.grad = torch.from_numpy(g.copy())
    opt.step()
    np.testing.assert_allclose(new_w, wt.detach().numpy(), rtol=1e-5, atol=1e-7)


def _run_steps(n, model, teacher, params, tparams, update_freq=1, B=4):
    cfg = OptimConfig(lr=1e-3, min_lr=1e-3, warmup_lr=1e-3, total_steps=100)
    tx, lr_fn = make_optimizer(params, cfg)
    state = TrainState.create(params, tx)
    loss_cfg = SlotLossConfig(num_action_classes=5, num_scene_classes=4)
    step_cfg = TrainStepConfig(
        update_freq=update_freq, use_fame=True, fame=FAMEConfig(beta=0.25, prob_aug=0.5)
    )
    step = jax.jit(make_slot_train_step(model, teacher, tx, loss_cfg, step_cfg, lr_fn))
    rng = np.random.default_rng(0)
    videos = jnp.asarray(rng.normal(size=(B, 4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, size=B))
    losses = []
    for i in range(n):
        state, metrics = step(state, tparams, {"videos": videos, "labels": labels},
                              jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    return state, losses, metrics


def test_slot_train_step_runs_and_loss_decreases():
    model, teacher, params, tparams = _slot_setup()
    state, losses, metrics = _run_steps(8, model, teacher, params, tparams)
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    # overfitting a fixed batch must reduce the loss
    assert losses[-1] < losses[0], losses
    assert np.isfinite(float(metrics["grad_norm"]))
    for k in ("action_loss", "scene_loss", "cosine_loss", "mask_prediction_loss",
              "mask_distill_loss", "lr", "class_acc"):
        assert k in metrics


def test_grad_accum_matches_big_batch():
    """update_freq=2 over [a;b] must equal one step on the full batch with
    FAME disabled (FAME's shard-local perm differs by construction)."""
    model, teacher, params, tparams = _slot_setup()
    loss_cfg = SlotLossConfig(num_action_classes=5, num_scene_classes=4)
    cfg = OptimConfig(lr=1e-3, min_lr=1e-3, warmup_lr=1e-3, total_steps=100)
    tx, _ = make_optimizer(params, cfg)

    rng = np.random.default_rng(1)
    videos = jnp.asarray(rng.normal(size=(4, 4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, size=4))
    batch = {"videos": videos, "labels": labels}

    outs = {}
    for U in (1, 2):
        step = jax.jit(
            make_slot_train_step(
                model, teacher, tx, loss_cfg,
                TrainStepConfig(update_freq=U, use_fame=False),
            )
        )
        state = TrainState.create(params, tx)
        # per-micro rngs differ between U=1 and U=2; dropout is off in this
        # tiny config (rates 0), so only FAME would diverge — it's disabled.
        state, m = step(state, tparams, batch, jax.random.PRNGKey(0))
        outs[U] = (state.params, float(m["loss"]))

    # Not bit-exact by design: the teacher-logit padding value is the
    # *microbatch* min (ref train_loss.py:103), which differs between one
    # full batch and two micros — same behavior as the reference engine,
    # which also computes the loss per micro-step.
    np.testing.assert_allclose(outs[1][1], outs[2][1], rtol=1e-3)
    for a, b in zip(jax.tree.leaves(outs[1][0]), jax.tree.leaves(outs[2][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_data_parallel_8_devices_matches_single():
    """Same step on an 8-device mesh (batch sharded) must produce the same
    new params as single-device execution."""
    assert jax.device_count() >= 8
    model, teacher, params, tparams = _slot_setup()
    loss_cfg = SlotLossConfig(num_action_classes=5, num_scene_classes=4)
    cfg = OptimConfig(lr=1e-3, min_lr=1e-3, warmup_lr=1e-3, total_steps=100)
    tx, _ = make_optimizer(params, cfg)
    step = make_slot_train_step(
        model, teacher, tx, loss_cfg, TrainStepConfig(use_fame=False)
    )

    rng = np.random.default_rng(2)
    videos = jnp.asarray(rng.normal(size=(8, 4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, size=8))
    batch = {"videos": videos, "labels": labels}

    state0 = TrainState.create(params, tx)
    s_single, m_single = jax.jit(step)(state0, tparams, batch, jax.random.PRNGKey(0))

    mesh = make_mesh()
    state1 = TrainState.create(params, tx)
    state1, sharded_batch = place_data_parallel(mesh, state1, batch)
    s_dp, m_dp = jax.jit(step)(state1, tparams, sharded_batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-5)
    # param updates agree up to float reduction-order noise in the psum
    for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_dp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)  # MXU-dot reductions reorder accumulation across DP shards


def test_classification_train_step():
    model = create_model("vit_base_patch16_224", num_classes=5, **TINY)
    x = jnp.zeros((4, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    cfg = OptimConfig(lr=1e-3, min_lr=1e-3, warmup_lr=1e-3, total_steps=100)
    tx, lr_fn = make_optimizer(params, cfg)
    state = TrainState.create(params, tx)
    step = jax.jit(make_classification_train_step(model, tx, lr_fn=lr_fn))
    rng = np.random.default_rng(3)
    batch = {
        "videos": jnp.asarray(rng.normal(size=(4, 4, 32, 32, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 5, size=4)),
    }
    l0 = None
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        if l0 is None:
            l0 = float(m["loss"])
    assert float(m["loss"]) < l0


def test_hvu_train_step():
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=6, num_scene_classes=4, num_latents=2, agg_depth=2, **TINY,
    )
    x = jnp.zeros((2, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    cfg = OptimConfig(lr=1e-3, min_lr=1e-3, warmup_lr=1e-3, total_steps=100)
    tx, _ = make_optimizer(params, cfg)
    state = TrainState.create(params, tx)
    loss_cfg = SlotLossConfig(
        num_action_classes=6, num_scene_classes=4,
        mask_distill_loss_weight=1.0, mask_prediction_loss_weight=1.0,
    )
    step = jax.jit(make_hvu_train_step(model, tx, loss_cfg, TrainStepConfig(
        use_fame=True, fame=FAMEConfig(beta=0.25, prob_aug=0.25))))
    rng = np.random.default_rng(4)
    batch = {
        "videos": jnp.asarray(rng.normal(size=(4, 4, 32, 32, 3)), jnp.float32),
        "action_labels": jnp.asarray(rng.integers(0, 6, size=4)),
        "scene_labels": jnp.asarray(rng.integers(0, 4, size=4)),
    }
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_ema_tracks_params():
    model, teacher, params, tparams = _slot_setup()
    cfg = OptimConfig(lr=1e-2, min_lr=1e-2, warmup_lr=1e-2, total_steps=100)
    tx, _ = make_optimizer(params, cfg)
    state = TrainState.create(params, tx, use_ema=True, ema_decay=0.5)
    loss_cfg = SlotLossConfig(num_action_classes=5, num_scene_classes=4)
    step = jax.jit(make_slot_train_step(model, teacher, tx, loss_cfg,
                                        TrainStepConfig(use_fame=False)))
    rng = np.random.default_rng(5)
    batch = {
        "videos": jnp.asarray(rng.normal(size=(2, 4, 32, 32, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 5, size=2)),
    }
    state, _ = step(state, tparams, batch, jax.random.PRNGKey(0))
    # ema = 0.5*old + 0.5*new -> lies strictly between old and new params
    w_old = np.asarray(params["head"]["kernel"])
    w_new = np.asarray(state.params["head"]["kernel"])
    w_ema = np.asarray(state.ema_params["head"]["kernel"])
    np.testing.assert_allclose(w_ema, 0.5 * w_old + 0.5 * w_new, rtol=1e-5, atol=1e-7)
