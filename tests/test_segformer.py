"""SegFormer mask-model path: golden parity vs the HF torch implementation
(offline, random weights) + segformer_mix_sample semantics vs a torch
re-expression of the reference engine code (ref engine/engine_for_slot.py:
16-47, 108-118).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

from devias_tpu.aug.segformer_mix import segformer_frame_masks, segformer_mix_sample
from devias_tpu.ckpt.segformer_import import import_segformer_params
from devias_tpu.nn.segformer import (
    Segformer,
    SegformerConfig,
    person_masks,
    segformer_b0,
    segformer_b3,
)

# tiny geometry (full 4-stage structure, sr ratios > 1) for fast CPU parity
TINY = SegformerConfig(
    num_labels=19,
    hidden_sizes=(16, 32, 80, 128),
    depths=(1, 1, 2, 1),
    num_heads=(1, 2, 5, 8),
    decoder_hidden_size=64,
)


def _hf_model(cfg: SegformerConfig):
    from transformers import SegformerConfig as HFConfig
    from transformers import SegformerForSemanticSegmentation

    hf_cfg = HFConfig(
        num_labels=cfg.num_labels,
        hidden_sizes=list(cfg.hidden_sizes),
        depths=list(cfg.depths),
        num_attention_heads=list(cfg.num_heads),
        sr_ratios=list(cfg.sr_ratios),
        decoder_hidden_size=cfg.decoder_hidden_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0,
        drop_path_rate=0.0,
    )
    torch.manual_seed(0)
    m = SegformerForSemanticSegmentation(hf_cfg)
    # randomize BN running stats so frozen-BN parity is actually exercised
    with torch.no_grad():
        m.decode_head.batch_norm.running_mean.normal_(0, 0.5)
        m.decode_head.batch_norm.running_var.uniform_(0.5, 2.0)
    m.eval()
    return m


def test_logits_parity_vs_hf():
    hf = _hf_model(TINY)
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)).logits  # [B,19,16,16]
    params = import_segformer_params(hf.state_dict(), TINY)
    ours = Segformer(TINY, dtype=jnp.float32).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=2e-4, rtol=1e-3
    )


def test_person_mask_matches_torch_upsample():
    # x4 bilinear upsample (align_corners=False) of quarter-res logits,
    # then argmax == 11 (ref engine_for_slot.py:112-114)
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(3, 8, 8, 19)).astype(np.float32)
    t = torch.nn.functional.interpolate(
        torch.from_numpy(logits).permute(0, 3, 1, 2),
        scale_factor=4, mode="bilinear", align_corners=False,
    )
    ref_mask = (t.max(dim=1)[1] == 11).numpy()
    ours = np.asarray(person_masks(jnp.asarray(logits), (32, 32)))
    # identical up to argmax ties at interpolated values
    assert (ours == ref_mask).mean() > 0.999


def test_b3_preset_matches_reference_checkpoint_geometry():
    cfg = segformer_b3()
    assert cfg.depths == (3, 4, 18, 3)
    assert cfg.hidden_sizes == (64, 128, 320, 512)
    assert cfg.decoder_hidden_size == 768
    assert segformer_b0().hidden_sizes == (32, 64, 160, 256)


def _torch_mix_reference(mask, videos, label, prob_aug, keep=None):
    """Reference segformer_mix_sample re-expressed (engine_for_slot.py:16-47)
    with an injected permutation (identity-reversed) and keep decisions so
    the JAX side can be compared sample-for-sample."""
    mask = mask.to(videos.dtype)
    batch_size = videos.shape[0]
    masks_per_frame = torch.repeat_interleave(mask, repeats=2, dim=1)
    index = torch.arange(batch_size - 1, -1, -1)
    video_fuse = videos[index] * (1 - masks_per_frame.unsqueeze(1)) + videos * masks_per_frame.unsqueeze(1)
    if keep is not None:
        all_videos = torch.where(keep[:, None, None, None, None], video_fuse, videos)
    else:
        all_videos = video_fuse
    all_mask = mask
    pooled = torch.nn.functional.avg_pool2d(all_mask, kernel_size=16, stride=16)
    masks_per_frame = pooled.reshape(batch_size, -1)
    return all_videos, label, pooled, masks_per_frame


def test_mix_sample_matches_reference_semantics(monkeypatch):
    B, T, H, W = 4, 16, 64, 64
    rng = np.random.default_rng(2)
    videos = rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    masks = (rng.random(size=(B, T // 2, H, W)) > 0.5).astype(np.float32)
    labels = np.arange(B)

    # pin the permutation to reversal and keep to all-True by intercepting
    # jax.random inside the module
    import devias_tpu.aug.segformer_mix as sm

    monkeypatch.setattr(
        sm.jax.random, "permutation", lambda k, n: jnp.arange(n - 1, -1, -1)
    )
    v2, l2, (fg, fgpf) = sm.segformer_mix_sample(
        jax.random.PRNGKey(0), jnp.asarray(masks), jnp.asarray(videos),
        jnp.asarray(labels), prob_aug=1.0,
    )

    tv = torch.from_numpy(videos).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
    tm = torch.from_numpy(masks)
    rv, rl, pooled, r_fgpf = _torch_mix_reference(tm, tv, torch.from_numpy(labels), 1.0)

    np.testing.assert_allclose(
        np.asarray(v2), rv.permute(0, 2, 3, 4, 1).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(fgpf), r_fgpf.numpy(), atol=1e-6)
    # fg_mask is one of the 8 pooled frame masks (shared random index)
    fg_np = np.asarray(fg).reshape(B, 4, 4)
    assert any(
        np.allclose(fg_np, pooled[:, i].numpy(), atol=1e-6) for i in range(T // 2)
    )


def test_mix_sample_prob_aug_keeps_originals():
    B, T, H, W = 8, 4, 32, 32
    rng = np.random.default_rng(3)
    videos = rng.normal(size=(B, T, H, W, 3)).astype(np.float32)
    masks = np.zeros((B, T // 2, H, W), np.float32)  # all-background: fuse == donor
    v2, _, _ = segformer_mix_sample(
        jax.random.PRNGKey(4), jnp.asarray(masks), jnp.asarray(videos),
        jnp.arange(B), prob_aug=0.5,
    )
    v2 = np.asarray(v2)
    # every output sample is either its original or some donor clip
    kept = [np.allclose(v2[i], videos[i]) for i in range(B)]
    is_donor = [
        any(np.allclose(v2[i], videos[j]) for j in range(B)) for i in range(B)
    ]
    assert all(is_donor)
    assert 0 < sum(kept) < B  # prob_aug actually mixes some and keeps some


def test_frame_masks_and_train_step_end_to_end():
    """Full Segformer branch of the slot train step on tiny shapes."""
    from devias_tpu.aug.fame import FAMEConfig
    from devias_tpu.losses import SlotLossConfig
    from devias_tpu.nn import create_model
    from devias_tpu.train import (
        OptimConfig, TrainState, TrainStepConfig, make_optimizer,
        make_slot_train_step,
    )

    seg = Segformer(TINY, dtype=jnp.float32)
    B, T, H, W = 2, 4, 32, 32
    x = jnp.zeros((B * (T // 2), H, W, 3), jnp.float32)
    seg_params = jax.jit(seg.init)(jax.random.PRNGKey(0), x)["params"]
    seg_apply = lambda frames: seg.apply({"params": seg_params}, frames)

    videos = jnp.asarray(
        np.random.default_rng(5).normal(size=(B, T, H, W, 3)).astype(np.float32)
    )
    m = segformer_frame_masks(seg_apply, videos)
    assert m.shape == (B, T // 2, H, W)
    assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}

    model = create_model(
        "slot_vit_base_patch16_224", num_classes=5, num_scene_classes=7,
        num_latents=2, agg_depth=1, embed_dim=32, depth=1, num_heads=2,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=7, embed_dim=32, depth=1, num_heads=2,
    )
    params = model.init({"params": jax.random.PRNGKey(1)}, videos)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(2)}, videos)["params"]
    tx, lr_fn = make_optimizer(params, OptimConfig(lr=1e-4, total_steps=10, warmup_steps=1))
    state = TrainState.create(params, tx)
    step = jax.jit(
        make_slot_train_step(
            model, teacher, tx,
            SlotLossConfig(num_action_classes=5, num_scene_classes=7),
            TrainStepConfig(use_fame=False, fame=FAMEConfig(prob_aug=0.8)),
            lr_fn, segformer_apply=seg_apply,
        )
    )
    batch = {"videos": videos, "labels": jnp.asarray([1, 3])}
    state2, metrics = step(state, tparams, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_b3_geometry_logits_parity_vs_hf():
    """Full b3 geometry golden (VERDICT r2 item 5: the prior golden ran a
    reduced geometry). Exercises the real depths (3,4,18,3), dims
    (64,128,320,512), sr ratios, and the 18-block stage-3 at a reduced
    input resolution (geometry, not resolution, is what the b0 golden
    missed)."""
    cfg = segformer_b3()
    hf = _hf_model(cfg)
    x = np.random.default_rng(2).normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x).permute(0, 3, 1, 2)).logits
    params = import_segformer_params(hf.state_dict(), cfg)
    ours = Segformer(cfg, dtype=jnp.float32).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(0, 2, 3, 1).numpy(), atol=5e-4, rtol=1e-3
    )
