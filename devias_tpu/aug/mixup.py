"""Mixup / CutMix on device (timm semantics, batch mode).

ref: utils/transform/mixup.py (timm port; batch/pair/elem modes). All
published DEVIAS recipes disable it (mixup=0, docs/TRAIN.md:52-53), but
the reference supports it for the classification pipelines — implemented
here as a jit-friendly batched transform used by the classification train
step when enabled. Batch mode (the timm default and the only mode the
reference CLIs expose meaningfully) mixes each sample with the batch
reversed; labels become soft targets with optional smoothing
(ref mixup.py:22 mixup_target).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5  # P(cutmix | mixing)
    label_smoothing: float = 0.1
    num_classes: int = 400

    @property
    def enabled(self) -> bool:
        return self.mixup_alpha > 0 or self.cutmix_alpha > 0


def _smooth_one_hot(labels, num_classes, smoothing):
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes) * (on - off) + off


def _rand_bbox(rng, H, W, lam):
    """CutMix box with area ratio (1-lam); returns the corrected lam
    (ref mixup.py rand_bbox + clipped-area correction)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * ratio).astype(jnp.int32)
    cut_w = (W * ratio).astype(jnp.int32)
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (), 0, H)
    cx = jax.random.randint(rx, (), 0, W)
    y1 = jnp.clip(cy - cut_h // 2, 0, H)
    y2 = jnp.clip(cy + cut_h // 2, 0, H)
    x1 = jnp.clip(cx - cut_w // 2, 0, W)
    x2 = jnp.clip(cx + cut_w // 2, 0, W)
    lam_corrected = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)
    return y1, y2, x1, x2, lam_corrected


def mixup_cutmix(rng, videos, labels, cfg: MixupConfig):
    """videos [B,T,H,W,C], int labels [B] -> (videos, soft_targets [B,K]).
    Batch mode: partner = flip(batch)."""
    B, T, H, W, C = videos.shape
    targets = _smooth_one_hot(labels, cfg.num_classes, cfg.label_smoothing)
    if not cfg.enabled:
        return videos, targets

    r_use, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)
    use_mixing = jax.random.uniform(r_use) < cfg.prob
    use_cutmix = jnp.logical_and(
        cfg.cutmix_alpha > 0,
        jnp.logical_or(
            cfg.mixup_alpha <= 0, jax.random.uniform(r_switch) < cfg.switch_prob
        ),
    )

    lam_mix = jax.random.beta(r_lam_m, cfg.mixup_alpha, cfg.mixup_alpha) if cfg.mixup_alpha > 0 else jnp.float32(1.0)
    lam_cut = jax.random.beta(r_lam_c, cfg.cutmix_alpha, cfg.cutmix_alpha) if cfg.cutmix_alpha > 0 else jnp.float32(1.0)

    flipped = videos[::-1]
    t_flipped = targets[::-1]

    # mixup branch
    mixed_mix = videos * lam_mix + flipped * (1.0 - lam_mix)

    # cutmix branch: same box across frames
    y1, y2, x1, x2, lam_cut_c = _rand_bbox(r_box, H, W, lam_cut)
    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    box = ((row >= y1) & (row < y2) & (col >= x1) & (col < x2))[None, None, :, :, None]
    mixed_cut = jnp.where(box, flipped, videos)

    lam = jnp.where(use_cutmix, lam_cut_c, lam_mix)
    mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)

    out_videos = jnp.where(use_mixing, mixed, videos)
    out_targets = jnp.where(
        use_mixing, targets * lam + t_flipped * (1.0 - lam), targets
    )
    return out_videos.astype(videos.dtype), out_targets
