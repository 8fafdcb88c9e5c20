"""uint8 device-normalize pipeline: mathematical equivalence with host
normalization."""

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.data.transforms import normalize_clip, train_augment, val_transform
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


def test_model_input_norm_equals_host_normalize():
    rng = np.random.default_rng(0)
    clip_u8 = rng.integers(0, 256, size=(2, 4, 32, 32, 3), dtype=np.uint8)
    clip_norm = normalize_clip(clip_u8)

    host_model = create_model("vit_base_patch16_224", num_classes=5, **TINY)
    dev_model = create_model("vit_base_patch16_224", num_classes=5, input_norm=True, **TINY)
    vs = host_model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(clip_norm))
    out_host = host_model.apply(vs, jnp.asarray(clip_norm))["logits"]
    out_dev = dev_model.apply(vs, jnp.asarray(clip_u8))["logits"]
    np.testing.assert_allclose(np.asarray(out_dev), np.asarray(out_host), rtol=1e-4, atol=1e-5)


def test_train_augment_uint8_path():
    rng = np.random.default_rng(1)
    clip = rng.integers(0, 256, size=(4, 80, 80, 3), dtype=np.uint8)
    out = train_augment(clip, crop_size=32, host_normalize=False)
    assert out.dtype == np.uint8 and out.shape == (4, 32, 32, 3)
    v = val_transform(clip, 32, 32, host_normalize=False)
    assert v.dtype == np.uint8


def test_slot_step_device_normalize_matches_host():
    """Same batch through uint8+device-normalize vs host-normalized float
    must produce the same loss (FAME on: identical math since FAME sees the
    same [0,1] video either way)."""
    model_h = create_model(
        "slot_vit_base_patch16_224", num_classes=5, num_scene_classes=4,
        num_latents=2, agg_depth=2, **TINY,
    )
    model_d = create_model(
        "slot_vit_base_patch16_224", num_classes=5, num_scene_classes=4,
        num_latents=2, agg_depth=2, input_norm=True, **TINY,
    )
    teacher_h = create_model("vit_base_patch16_224", num_classes=4, **TINY)
    teacher_d = create_model("vit_base_patch16_224", num_classes=4, input_norm=True, **TINY)

    rng = np.random.default_rng(2)
    clip_u8 = rng.integers(0, 256, size=(2, 4, 32, 32, 3), dtype=np.uint8)
    clip_norm = normalize_clip(clip_u8)
    labels = jnp.asarray(rng.integers(0, 5, size=2))

    x = jnp.asarray(clip_norm)
    params = model_h.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    tparams = teacher_h.init({"params": jax.random.PRNGKey(1)}, x)["params"]
    cfg = OptimConfig(lr=1e-3, total_steps=10)
    tx, _ = make_optimizer(params, cfg)
    loss_cfg = SlotLossConfig(num_action_classes=5, num_scene_classes=4)

    from devias_tpu.aug.fame import FAMEConfig

    fame = FAMEConfig(beta=0.25, prob_aug=0.5)
    step_h = jax.jit(make_slot_train_step(
        model_h, teacher_h, tx, loss_cfg,
        TrainStepConfig(use_fame=True, fame=fame)))
    step_d = jax.jit(make_slot_train_step(
        model_d, teacher_d, tx, loss_cfg,
        TrainStepConfig(use_fame=True, fame=fame, device_normalize=True)))

    s_h, m_h = step_h(TrainState.create(params, tx), tparams,
                      {"videos": x, "labels": labels}, jax.random.PRNGKey(7))
    s_d, m_d = step_d(TrainState.create(params, tx), tparams,
                      {"videos": jnp.asarray(clip_u8), "labels": labels},
                      jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m_h["loss"]), float(m_d["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(m_h["grad_norm"]), float(m_d["grad_norm"]), rtol=1e-3
    )
    # Adam normalizes per-leaf, so f32 rounding differences between the two
    # (mathematically identical) formulations show up at the LR scale in the
    # params; compare with that tolerance
    for a, b in zip(jax.tree.leaves(s_h.params), jax.tree.leaves(s_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
