"""ML-correctness smoke: the full DEVIAS slot training loop must be able to
memorize a tiny fixed synthetic set (loss-decrease assertions are the e2e
substitute for the reference's missing test suite, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.aug.fame import FAMEConfig
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    OptimConfig,
    TrainState,
    TrainStepConfig,
    make_optimizer,
    make_slot_train_step,
)

TINY = dict(depth=2, embed_dim=64, num_heads=4)


def _setup(matching: str):
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=4, num_scene_classes=3, num_latents=2, agg_depth=2,
        agg_weights_tie=True, slot_matching_method=matching, **TINY,
    )
    teacher = create_model("vit_base_patch16_224", num_classes=3, **TINY)
    rng = np.random.default_rng(0)
    B = 8
    videos = jnp.asarray(rng.normal(size=(B, 4, 32, 32, 3)) * 0.5, jnp.float32)
    labels = jnp.asarray(np.arange(B) % 4)
    params = model.init({"params": jax.random.PRNGKey(0)}, videos)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, videos)["params"]
    tx, lr_fn = make_optimizer(
        params, OptimConfig(lr=3e-3, min_lr=3e-3, warmup_lr=3e-3, total_steps=200,
                            layer_decay=1.0)
    )
    state = TrainState.create(params, tx)
    loss_cfg = SlotLossConfig(
        num_action_classes=4, num_scene_classes=3, slot_matching_method=matching
    )
    # FAME off so the memorization target is fixed
    step = jax.jit(make_slot_train_step(
        model, teacher, tx, loss_cfg, TrainStepConfig(use_fame=False), lr_fn))
    return state, step, tparams, {"videos": videos, "labels": labels}


def test_hard_select_training_memorizes_fixed_batch():
    state, step, tparams, batch = _setup("hard_select")
    for i in range(100):
        state, m = step(state, tparams, batch, jax.random.PRNGKey(0))
    mm = jax.device_get(m)
    assert float(mm["class_acc"]) == 1.0, mm
    assert float(mm["action_loss"]) < 0.2, mm


def test_matching_training_reduces_loss():
    """With Hungarian matching on a from-scratch toy model the slot
    assignment keeps flipping (the paper trains from a pretrained backbone),
    so assert strong total-loss reduction + scene-distillation convergence
    rather than memorization."""
    state, step, tparams, batch = _setup("matching")
    first = None
    for i in range(60):
        state, m = step(state, tparams, batch, jax.random.PRNGKey(0))
        if first is None:
            first = float(jax.device_get(m)["loss"])
    mm = jax.device_get(m)
    assert float(mm["loss"]) < first * 0.2, (first, mm)
    assert float(mm["scene_loss"]) < 1.0, mm
    assert float(mm["cosine_loss"]) < 1.0, mm


def test_remat_matches_no_remat():
    """use_checkpoint (rematerialization) must not change the math."""
    kw = dict(num_classes=4, num_scene_classes=3, num_latents=2, agg_depth=2, **TINY)
    plain = create_model("slot_vit_base_patch16_224", **kw)
    remat = create_model("slot_vit_base_patch16_224", remat=True, **kw)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 32, 32, 3)), jnp.float32)
    vs = plain.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(model, p):
        return (model.apply({"params": p}, x)["slots_head"] ** 2).sum()

    l1, g1 = jax.value_and_grad(lambda p: loss(plain, p))(vs["params"])
    l2, g2 = jax.value_and_grad(lambda p: loss(remat, p))(vs["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
