"""Mixup/CutMix tests (timm semantics, ref utils/transform/mixup.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from devias_tpu.aug.mixup import MixupConfig, mixup_cutmix, _smooth_one_hot


def _batch(B=4, T=2, HW=16):
    rng = np.random.default_rng(0)
    return (
        jnp.asarray(rng.normal(size=(B, T, HW, HW, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, 5, size=B)),
    )


def test_disabled_returns_smoothed_onehot():
    videos, labels = _batch()
    cfg = MixupConfig(mixup_alpha=0, cutmix_alpha=0, num_classes=5, label_smoothing=0.1)
    v, t = mixup_cutmix(jax.random.PRNGKey(0), videos, labels, cfg)
    np.testing.assert_allclose(np.asarray(v), np.asarray(videos))
    want = np.full((4, 5), 0.1 / 5)
    want[np.arange(4), np.asarray(labels)] = 1 - 0.1 + 0.1 / 5
    np.testing.assert_allclose(np.asarray(t), want, rtol=1e-6)


def test_mixup_convexity_and_target_mass():
    videos, labels = _batch()
    cfg = MixupConfig(mixup_alpha=0.8, cutmix_alpha=0.0, num_classes=5,
                      label_smoothing=0.0, prob=1.0)
    v, t = mixup_cutmix(jax.random.PRNGKey(1), videos, labels, cfg)
    t = np.asarray(t)
    np.testing.assert_allclose(t.sum(axis=1), 1.0, rtol=1e-5)
    # mixed video is a convex combination of the sample and its partner
    a = np.asarray(videos)
    mixed = np.asarray(v)
    lo = np.minimum(a, a[::-1]) - 1e-5
    hi = np.maximum(a, a[::-1]) + 1e-5
    assert ((mixed >= lo) & (mixed <= hi)).all()


def test_cutmix_pixels_come_from_either_sample():
    videos, labels = _batch()
    cfg = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0, num_classes=5,
                      label_smoothing=0.0, prob=1.0, switch_prob=1.0)
    v, t = mixup_cutmix(jax.random.PRNGKey(2), videos, labels, cfg)
    a = np.asarray(videos)
    mixed = np.asarray(v)
    from_self = np.isclose(mixed, a, atol=1e-6)
    from_partner = np.isclose(mixed, a[::-1], atol=1e-6)
    assert (from_self | from_partner).all()
    # target lambda equals the un-cut area fraction
    t = np.asarray(t)
    np.testing.assert_allclose(t.sum(axis=1), 1.0, rtol=1e-5)


def test_classification_step_with_mixup_trains():
    from devias_tpu.losses import soft_target_cross_entropy
    from devias_tpu.nn import create_model
    from devias_tpu.train import OptimConfig, TrainState, make_classification_train_step, make_optimizer

    model = create_model("vit_base_patch16_224", num_classes=5,
                         depth=2, embed_dim=64, num_heads=4)
    x = jnp.zeros((4, 4, 32, 32, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    tx, _ = make_optimizer(params, OptimConfig(lr=1e-3, total_steps=10))
    state = TrainState.create(params, tx)
    cfg = MixupConfig(num_classes=5, label_smoothing=0.1)
    step = jax.jit(make_classification_train_step(
        model, tx, criterion=soft_target_cross_entropy, mixup_cfg=cfg))
    rng = np.random.default_rng(3)
    batch = {
        "videos": jnp.asarray(rng.normal(size=(4, 4, 32, 32, 3)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 5, size=4)),
    }
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
