"""YUV420 (I420) wire format: device converter parity vs cv2, dataset
packing, and a train-step smoke over the packed wire."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from devias_tpu.data.yuv import i420_to_rgb, rgb_clip_to_i420


def test_i420_to_rgb_matches_cv2():
    """Device-side unpack matches cv2.COLOR_YUV2RGB_I420 to fixed-point
    rounding (cv2 uses integer arithmetic; we run BT.601 in f32)."""
    rng = np.random.default_rng(0)
    yuv = rng.integers(0, 256, (4, 48, 32), np.uint8)
    ours = np.asarray(i420_to_rgb(yuv)) * 255.0  # [4, 32, 32, 3]
    for t in range(4):
        ref = cv2.cvtColor(yuv[t], cv2.COLOR_YUV2RGB_I420).astype(np.float32)
        # cv2 saturates to [0,255] the same way we clip
        assert np.abs(ours[t] - ref).max() <= 2.0, t


def test_roundtrip_on_smooth_clip():
    """RGB -> I420 -> RGB is tight when chroma is locally smooth (the real
    augmented-video case; the source codec was 4:2:0 already)."""
    H = W = 32
    yy, xx = np.mgrid[0:H, 0:W]
    frame = np.stack(
        [40 + 4 * yy, 90 + 2 * xx, 160 - 2 * yy], axis=-1
    ).astype(np.uint8)
    clip = np.stack([frame, frame[::-1]], axis=0)
    packed = rgb_clip_to_i420(clip)
    assert packed.shape == (2, H * 3 // 2, W)
    back = np.asarray(i420_to_rgb(packed)) * 255.0
    assert np.abs(back - clip.astype(np.float32)).mean() < 2.0
    assert np.abs(back - clip.astype(np.float32)).max() < 14.0  # plane edges


def test_i420_batch_shapes():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (2, 3, 24, 16), np.uint8)  # [B, T, H*3//2, W]
    out = np.asarray(i420_to_rgb(x))
    assert out.shape == (2, 3, 16, 16, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_dataset_emits_packed_train_clips(tmp_path):
    from devias_tpu.data.datasets import DataConfig, build_dataset

    anno = tmp_path / "train.csv"
    anno.write_text("\n".join(f"clip{i}.mp4 {i % 4}" for i in range(4)))
    common = dict(
        data_set="UCF101", anno_path=str(anno), synthetic=True, nb_classes=4,
        input_size=32, short_side_size=32, num_frames=4, sampling_rate=2,
    )
    cfg = DataConfig(host_normalize=False, wire_format="yuv420", **common)
    ds, _ = build_dataset(True, False, cfg)
    item = ds[0]
    assert item["videos"].dtype == np.uint8
    assert item["videos"].shape == (4, 48, 32)

    with pytest.raises(ValueError):
        bad = DataConfig(host_normalize=True, wire_format="yuv420", **common)
        ds_bad, _ = build_dataset(True, False, bad)
        ds_bad[0]


def test_slot_train_step_on_yuv_wire():
    """Full micro-step over the packed wire: finite loss, and the unpack
    matches feeding the equivalent RGB through the plain unit-range path."""
    import jax
    import jax.numpy as jnp

    from devias_tpu.aug.fame import FAMEConfig
    from devias_tpu.losses import SlotLossConfig
    from devias_tpu.nn import create_model
    from devias_tpu.train import (
        OptimConfig, TrainState, TrainStepConfig, make_optimizer,
        make_slot_train_step,
    )

    TINY = dict(depth=2, embed_dim=64, num_heads=4)
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=4, num_scene_classes=5,
        num_latents=2, agg_depth=1, input_norm=True, **TINY,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=5, use_mean_pooling=False,
        input_norm=True, **TINY,
    )
    B, T, H = 2, 4, 32
    rng = np.random.default_rng(0)
    yuv = rng.integers(0, 256, (B, T, H * 3 // 2, H), np.uint8)
    labels = rng.integers(0, 4, size=B)

    x0 = jnp.zeros((B, T, H, H, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
    tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x0)["params"]
    tx, lr_fn = make_optimizer(params, OptimConfig(lr=1e-3, total_steps=10))
    loss_cfg = SlotLossConfig(num_action_classes=4, num_scene_classes=5)
    fame = FAMEConfig(beta=0.5, prob_aug=1.0)

    def run(wire, videos):
        step = jax.jit(make_slot_train_step(
            model, teacher, tx, loss_cfg,
            TrainStepConfig(use_fame=True, fame=fame,
                            device_normalize=True, wire_format=wire),
            lr_fn,
        ))
        state = TrainState.create(params, tx)
        batch = {"videos": jnp.asarray(videos), "labels": jnp.asarray(labels)}
        _, metrics = step(state, tparams, batch, jax.random.PRNGKey(7))
        return float(metrics["loss"])

    loss_yuv = run("yuv420", yuv)
    assert np.isfinite(loss_yuv)
    # the equivalent RGB wire: exactly the bytesless unpack scaled to u8
    # range is NOT representable (f32 path), so compare against the same
    # unpack done host-side and fed through the f32 unit-range branch
    rgb_f32 = np.asarray(i420_to_rgb(yuv)) * 255.0
    loss_rgb = run("rgb", rgb_f32.astype(np.float32))
    # rgb path divides by 255 -> identical values modulo f32 rounding
    assert abs(loss_yuv - loss_rgb) < 1e-2


# ---------------------------------------------------------------------------
# Round 5: YUV wire on the val/test chain (VERDICT r4 item 3 — the eval
# protocols were transfer-bound by always shipping RGB)
# ---------------------------------------------------------------------------

def _smooth_frame_dir(tmp_path, n=12, h=64, w=80):
    """A frame-folder clip with locally smooth chroma (the real-video case:
    sources are 4:2:0 already)."""
    d = tmp_path / "clip0"
    d.mkdir()
    yy, xx = np.mgrid[0:h, 0:w]
    for t in range(n):
        frame = np.stack(
            [
                (40 + yy + 2 * t) % 200,
                (90 + xx) % 200,
                (160 - yy + xx // 2) % 200,
            ],
            axis=-1,
        ).astype(np.uint8)
        cv2.imwrite(str(d / f"{t + 1:06d}.jpg"), frame[..., ::-1])
    return d


def _val_cfg(tmp_path, wire, size=32):
    from devias_tpu.data.datasets import DataConfig

    anno = tmp_path / "val.csv"
    anno.write_text("clip0 0")
    return DataConfig(
        data_set="UCF101", anno_path=str(anno), data_prefix=str(tmp_path),
        nb_classes=4, input_size=size, short_side_size=size, num_frames=4,
        sampling_rate=2, host_normalize=False, wire_format=wire,
    )


def test_val_chain_yuv_parity(tmp_path):
    """YUV val chain == RGB val chain within I420 roundtrip rounding: the
    same decoded frames, the same val transform, wire-packed vs raw."""
    from devias_tpu.data.datasets import build_dataset

    _smooth_frame_dir(tmp_path)
    rgb_ds, _ = build_dataset(False, False, _val_cfg(tmp_path, "rgb"))
    yuv_ds, _ = build_dataset(False, False, _val_cfg(tmp_path, "yuv420"))
    rgb = rgb_ds[0]["videos"].astype(np.float32)
    packed = yuv_ds[0]["videos"]
    assert packed.dtype == np.uint8 and packed.shape == (4, 48, 32)
    assert packed.nbytes * 2 == rgb.size  # half the uint8 wire bytes
    back = np.asarray(i420_to_rgb(packed)) * 255.0
    assert np.abs(back - rgb).mean() < 2.0
    assert np.abs(back - rgb).max() < 16.0


def test_test_chain_yuv_packs_views(tmp_path):
    """Test mode (view grid) ships I420 too; every view unpacks to the RGB
    chain's view within roundtrip rounding."""
    from devias_tpu.data.datasets import build_dataset

    _smooth_frame_dir(tmp_path)
    rgb_ds, _ = build_dataset(False, True, _val_cfg(tmp_path, "rgb"))
    yuv_ds, _ = build_dataset(False, True, _val_cfg(tmp_path, "yuv420"))
    assert len(yuv_ds) == len(rgb_ds)
    for i in range(len(yuv_ds)):
        r, y = rgb_ds[i], yuv_ds[i]
        assert (r["chunk"], r["split"]) == (y["chunk"], y["split"])
        back = np.asarray(i420_to_rgb(y["videos"])) * 255.0
        assert np.abs(back - r["videos"].astype(np.float32)).mean() < 2.0


def test_eval_forward_on_yuv_wire(tmp_path):
    """The caller-built eval forward (unpack -> input_norm model) matches
    the RGB-wire forward to unpack rounding — the serving-path contract
    bench_pipeline.py --mode eval relies on."""
    import jax
    import jax.numpy as jnp

    from devias_tpu.data.datasets import build_dataset
    from devias_tpu.nn import create_model

    _smooth_frame_dir(tmp_path)
    rgb_ds, _ = build_dataset(False, False, _val_cfg(tmp_path, "rgb"))
    yuv_ds, _ = build_dataset(False, False, _val_cfg(tmp_path, "yuv420"))

    model = create_model(
        "slot_vit_base_patch16_224", num_classes=4, num_scene_classes=5,
        num_latents=2, agg_depth=1, input_norm=True,
        depth=2, embed_dim=64, num_heads=4,
    )
    x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]

    def fwd(v):
        return model.apply({"params": params}, v, deterministic=True)["action_logit"]

    logits_rgb = np.asarray(fwd(jnp.asarray(rgb_ds[0]["videos"][None])))
    logits_yuv = np.asarray(fwd(i420_to_rgb(jnp.asarray(yuv_ds[0]["videos"][None]))))
    assert np.abs(logits_rgb - logits_yuv).max() < 0.15
    # sanity: distinguishable from a wrong input
    other = np.asarray(fwd(jnp.zeros_like(jnp.asarray(rgb_ds[0]["videos"][None]))))
    assert np.abs(logits_rgb - other).max() > np.abs(logits_rgb - logits_yuv).max()
