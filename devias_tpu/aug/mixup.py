"""Mixup / CutMix on device (timm semantics; batch, pair, and elem modes).

ref: utils/transform/mixup.py (timm port). All published DEVIAS recipes
disable it (mixup=0, docs/TRAIN.md:52-53), but the reference supports it
for the classification pipelines — implemented here as a jit-friendly
batched transform used by the classification train step when enabled.

Modes (ref mixup.py:160-216 Mixup.__call__):
  batch — one (lam, use_cutmix) for the whole batch; partner = flip(batch)
  elem  — independent (lam, use_cutmix, box) per element
  pair  — per-pair params drawn for the first B//2 elements; element i and
          its flip-partner j = B-1-i mix into each other symmetrically
          with the SAME lam/box (ref _mix_pair)
cutmix_minmax — Darknet-style min/max boxes replace the lam-derived square
box; lam is then always area-corrected (ref rand_bbox_minmax:55-76).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

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
    mode: str = "batch"  # batch | pair | elem
    cutmix_minmax: Optional[Tuple[float, float]] = None

    def __post_init__(self):
        if self.mode not in ("batch", "pair", "elem"):
            raise ValueError(
                f"--mixup_mode must be batch|pair|elem, got {self.mode!r}"
            )
        if self.cutmix_minmax is not None and len(self.cutmix_minmax) != 2:
            raise ValueError("--cutmix_minmax takes exactly two ratios")
        if self.cutmix_minmax is not None:
            # ref mixup.py:116-118: minmax active forces cutmix_alpha=1.0
            object.__setattr__(self, "cutmix_alpha", 1.0)

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


def _per_elem_params(rng, n, cfg: MixupConfig):
    """Vectorized ref _params_per_elem (mixup.py:128-146): per-element
    (lam, use_cutmix) with the mixing probability applied per element."""
    r_switch, r_beta_c, r_beta_m, r_prob = jax.random.split(rng, 4)
    if cfg.mixup_alpha > 0 and cfg.cutmix_alpha > 0:
        use_cutmix = jax.random.uniform(r_switch, (n,)) < cfg.switch_prob
        lam_c = jax.random.beta(r_beta_c, cfg.cutmix_alpha, cfg.cutmix_alpha, (n,))
        lam_m = jax.random.beta(r_beta_m, cfg.mixup_alpha, cfg.mixup_alpha, (n,))
        lam_mix = jnp.where(use_cutmix, lam_c, lam_m)
    elif cfg.mixup_alpha > 0:
        use_cutmix = jnp.zeros((n,), bool)
        lam_mix = jax.random.beta(r_beta_m, cfg.mixup_alpha, cfg.mixup_alpha, (n,))
    else:
        use_cutmix = jnp.ones((n,), bool)
        lam_mix = jax.random.beta(r_beta_c, cfg.cutmix_alpha, cfg.cutmix_alpha, (n,))
    mix = jax.random.uniform(r_prob, (n,)) < cfg.prob
    lam = jnp.where(mix, lam_mix.astype(jnp.float32), 1.0)
    return lam, use_cutmix


def _rand_bbox_vec(rng, n, H, W, lam, cfg: MixupConfig):
    """Per-element CutMix boxes + corrected lam. Standard boxes follow ref
    rand_bbox (square, lam-derived side, clipped); minmax boxes follow ref
    rand_bbox_minmax (independent h/w in [min,max]·dim, fully inside)."""
    if cfg.cutmix_minmax is not None:
        lo, hi = cfg.cutmix_minmax
        rh, rw, ry, rx = jax.random.split(rng, 4)
        cut_h = jax.random.randint(rh, (n,), int(H * lo), int(H * hi))
        cut_w = jax.random.randint(rw, (n,), int(W * lo), int(W * hi))
        y1 = jax.random.randint(ry, (n,), 0, H - cut_h)
        x1 = jax.random.randint(rx, (n,), 0, W - cut_w)
        y2, x2 = y1 + cut_h, x1 + cut_w
    else:
        ratio = jnp.sqrt(1.0 - lam)
        cut_h = (H * ratio).astype(jnp.int32)
        cut_w = (W * ratio).astype(jnp.int32)
        ry, rx = jax.random.split(rng)
        cy = jax.random.randint(ry, (n,), 0, H)
        cx = jax.random.randint(rx, (n,), 0, W)
        y1 = jnp.clip(cy - cut_h // 2, 0, H)
        y2 = jnp.clip(cy + cut_h // 2, 0, H)
        x1 = jnp.clip(cx - cut_w // 2, 0, W)
        x2 = jnp.clip(cx + cut_w // 2, 0, W)
    lam_corrected = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)
    return y1, y2, x1, x2, lam_corrected.astype(jnp.float32)


def _mix_elemwise(videos, lam, use_cutmix, boxes, pair_axes_quirk=False):
    """Shared elem/pair mixer: every element i mixes with the ORIGINAL
    flip-partner j = B-1-i under its own (lam_i, use_cutmix_i, box_i)
    (ref _mix_elem:148-163 — x_orig keeps the unmixed source). Returns
    (mixed videos, per-element corrected lam).

    pair_axes_quirk replicates a reference bug we keep for parity: timm's
    _mix_pair slices `x[i][:, yl:yh, xl:xh]` (mixup.py:176-177), written
    for [C,H,W] images — on DEVIAS's [C,T,H,W] videos that cuts the box
    along (T,H) with all columns, usually an EMPTY region since yl is drawn
    from [0,H) >> T, while lam is still 'corrected' by the (H,W) box area
    (_mix_elem's `[..., yl:yh, xl:xh]` is the correct spatial cut).
    Goldened by tests/test_mixup_oracle.py."""
    T, H, W = videos.shape[1], videos.shape[2], videos.shape[3]
    flipped = videos[::-1]
    y1, y2, x1, x2, lam_box = boxes
    # lam==1 (element not mixing) yields an empty standard box, but a
    # minmax box is lam-independent — gate it off explicitly like the
    # reference's `if lam != 1.` guard
    use_box = use_cutmix & (lam != 1.0)

    e = (slice(None), None, None, None, None)  # [B] -> [B,1,1,1,1]
    if pair_axes_quirk:
        frm = jnp.arange(T)[None, :, None, None, None]
        row = jnp.arange(H)[None, None, :, None, None]
        box = (frm >= y1[e]) & (frm < y2[e]) & (row >= x1[e]) & (row < x2[e])
    else:
        row = jnp.arange(H)[None, None, :, None, None]
        col = jnp.arange(W)[None, None, None, :, None]
        box = (row >= y1[e]) & (row < y2[e]) & (col >= x1[e]) & (col < x2[e])
    box = box & use_box[e]
    mixed_mix = videos * lam[e] + flipped * (1.0 - lam[e])
    out = jnp.where(box, flipped, jnp.where(use_cutmix[e], videos, mixed_mix))
    lam_out = jnp.where(use_box, lam_box, lam)
    return out, lam_out


def mixup_cutmix(rng, videos, labels, cfg: MixupConfig):
    """videos [B,T,H,W,C], int labels [B] -> (videos, soft_targets [B,K]).
    Partner = flip(batch) in every mode (ref Mixup.__call__:208-216)."""
    B, T, H, W, C = videos.shape
    targets = _smooth_one_hot(labels, cfg.num_classes, cfg.label_smoothing)
    if not cfg.enabled:
        return videos, targets

    if cfg.mode in ("elem", "pair"):
        r_par, r_box = jax.random.split(rng)
        if cfg.mode == "elem":
            lam, use_cutmix = _per_elem_params(r_par, B, cfg)
            boxes = _rand_bbox_vec(r_box, B, H, W, lam, cfg)
        else:
            # ref _mix_pair:165-181: B//2 param draws, mirrored so i and
            # j = B-1-i share lam/use_cutmix/box
            lam_h, cut_h = _per_elem_params(r_par, B // 2, cfg)
            boxes_h = _rand_bbox_vec(r_box, B // 2, H, W, lam_h, cfg)
            mir = lambda v: jnp.concatenate([v, v[::-1]])
            lam = mir(lam_h)
            use_cutmix = mir(cut_h)
            boxes = tuple(mir(b) for b in boxes_h)
        out, lam_out = _mix_elemwise(
            videos, lam, use_cutmix, boxes, pair_axes_quirk=(cfg.mode == "pair")
        )
        t_flipped = targets[::-1]
        lam_t = lam_out[:, None]
        return out.astype(videos.dtype), targets * lam_t + t_flipped * (1.0 - lam_t)

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
    if cfg.cutmix_minmax is not None:
        y1, y2, x1, x2, lam_cut_c = (
            v[0] for v in _rand_bbox_vec(r_box, 1, H, W, jnp.full((1,), lam_cut), cfg)
        )
    else:
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
