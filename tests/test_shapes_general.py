"""Generality across input geometries: the reference hardcodes 224x224/16f
(ref modeling_slot.py:174-175, 211); devias_tpu generalizes — verify
non-square, non-224, 32-frame inputs work through model + FAME + loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from devias_tpu.aug.fame import FAMEConfig, fame_augment
from devias_tpu.losses import SlotLossConfig, devias_slot_loss
from devias_tpu.nn import create_model

TINY = dict(depth=2, embed_dim=64, num_heads=4)


@pytest.mark.parametrize("T,H,W", [(8, 64, 96), (32, 48, 48), (16, 80, 64)])
def test_slot_model_arbitrary_geometry(T, H, W):
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2, **TINY,
    )
    x = jnp.zeros((1, T, H, W, 3), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(vs, x)
    n_tokens = (T // 2) * (H // 16) * (W // 16)
    n_spatial = (H // 16) * (W // 16)
    assert out["attn"].shape == (1, 4, 2, n_tokens)
    assert out["mask_predictions"].shape == (1, 2, n_spatial)


@pytest.mark.parametrize("T,HW", [(8, 64), (16, 96)])
def test_fame_arbitrary_geometry(T, HW):
    rng = np.random.default_rng(0)
    videos = jnp.asarray(rng.uniform(size=(2, T, HW, HW, 3)), jnp.float32)
    v, l, (fg, fgpf) = fame_augment(
        jax.random.PRNGKey(0), videos, jnp.arange(2), FAMEConfig(beta=0.25)
    )
    assert v.shape == videos.shape
    assert fg.shape == (2, (HW // 16) ** 2)
    assert fgpf.shape == (2, (T // 2) * (HW // 16) ** 2)


def test_full_loss_at_32_frames():
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=5, num_scene_classes=4, num_latents=2, agg_depth=2, **TINY,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 48, 3)), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(vs, x)
    n_sp = (48 // 16) ** 2
    total, _, _ = devias_slot_loss(
        out,
        jnp.asarray(rng.normal(size=(2, 4)), jnp.float32),
        jnp.asarray([0, 1]),
        jnp.asarray(rng.uniform(size=(2, n_sp)), jnp.float32),
        jnp.asarray(rng.uniform(size=(2, 16 * n_sp)), jnp.float32),
        SlotLossConfig(num_action_classes=5, num_scene_classes=4),
    )
    assert np.isfinite(float(total))


def test_metric_logger_and_tensor_logger(tmp_path):
    from devias_tpu.utils import MetricLogger, SmoothedValue, TensorLogger

    m = MetricLogger()
    for v in (1.0, 2.0, 3.0):
        m.update(loss=v, acc=v * 10)
    assert abs(m.meters["loss"].global_avg - 2.0) < 1e-9
    assert m.meters["acc"].max == 30.0
    sv = SmoothedValue(window_size=2)
    for v in (1, 2, 3):
        sv.update(v)
    assert sv.median == 2.5  # window keeps [2, 3]
    assert sv.global_avg == 2.0

    # log_every iterates transparently
    seen = list(m.log_every(range(5), print_freq=10, header="t"))
    assert seen == list(range(5))

    tl = TensorLogger(str(tmp_path))
    tl.update(head="train", step=0, loss=1.5)
    tl.update(head="train", step=1, loss=1.2)
    tl.flush()
    # either TB event files or the JSONL fallback must exist
    files = list(tmp_path.iterdir())
    assert files


def test_step_timer():
    from devias_tpu.utils import StepTimer

    t = StepTimer()
    t.start()
    dt = t.stop(sync_scalar=jnp.ones(()))
    assert dt >= 0 and "steps=1" in t.summary()
