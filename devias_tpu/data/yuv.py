"""YUV420 (I420) wire format: halve host->device video bytes.

The uint8 device-normalize pipeline already ships 1/4 of the float bytes
(data/transforms.py:391-397); on hosts where the NIC/relay to the chip is
the pipeline bottleneck the remaining lever is chroma subsampling. Source
videos are h264 yuv420p, so the augmented clip's chroma carries little
detail above half resolution — repacking the augmented RGB frames as I420
(1.5 bytes/px vs 3) is the same trade the codec already made.

Host side packs with cv2 (`COLOR_RGB2YUV_I420`, BT.601 studio range);
the device side (`i420_to_rgb`) inverts it in f32 — BT.601 limited-range
matrix + nearest 2x2 chroma upsample, matching cv2's
`COLOR_YUV2RGB_I420` to ~1 LSB (cv2 uses fixed-point; verified in
tests/test_yuv.py) — and lands directly in [0, 1] unit range, the format
the device-normalize step consumes (train/step.py TrainStepConfig).

Training-path only: evaluation ships exact RGB (eval preprocessing is
golden-tested against the reference to the pixel; the wire format is an
opt-in throughput trade for the stochastic augmentation path, where the
chroma re-subsampling is below the augmentation noise floor).

Reference: the upstream pipeline ships normalized f32 over PCIe
(ref kinetics.py:239-298 normalizes on the host; engine_for_slot.py:98-99
non_blocking copies) — 8x the bytes of this path.
"""

from __future__ import annotations

import numpy as np

# ITU-R BT.601 studio-range YUV -> RGB (what cv2's I420 conversions use)
_Y_SCALE = 255.0 / 219.0  # 1.164383...
_V_R = 1.596027
_U_G = -0.391762
_V_G = -0.812968
_U_B = 2.017232


def rgb_clip_to_i420(clip: np.ndarray) -> np.ndarray:
    """[T, H, W, 3] uint8 RGB -> [T, H*3//2, W] uint8 I420 planes.

    H and W must be even (always true for the 224/160 train crops)."""
    import cv2

    T, H, W, _ = clip.shape
    if H % 2 or W % 2:
        raise ValueError(f"I420 needs even H, W; got {(H, W)}")
    out = np.empty((T, H * 3 // 2, W), np.uint8)
    for t in range(T):
        out[t] = cv2.cvtColor(clip[t], cv2.COLOR_RGB2YUV_I420)
    return out


def i420_to_rgb(x, dtype=None):
    """[..., T, H*3//2, W] uint8 I420 -> [..., T, H, W, 3] float in [0, 1].

    JAX/device-side inverse of rgb_clip_to_i420: BT.601 limited-range
    matrix, nearest 2x2 chroma upsample (cv2 semantics), clipped to unit
    range. Pure elementwise + reshape work — XLA fuses it into the first
    consumer (FAME statistics / patchify)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    Hp, W = x.shape[-2], x.shape[-1]
    H = Hp * 2 // 3
    lead = x.shape[:-2]

    y = x[..., :H, :].astype(dtype)
    # U/V planes: (H//4) buffer rows of W bytes == (H//2, W//2) row-major
    u = x[..., H : H + H // 4, :].reshape(*lead, H // 2, W // 2).astype(dtype)
    v = x[..., H + H // 4 :, :].reshape(*lead, H // 2, W // 2).astype(dtype)

    def up2(c):  # nearest 2x in both spatial dims
        c = jnp.repeat(c, 2, axis=-2)
        return jnp.repeat(c, 2, axis=-1)

    # cv2 computes the luma term with a saturating subtraction —
    # max(Y-16, 0) — before the matrix (verified empirically; matters for
    # sub-black Y with strong chroma)
    yf = jnp.maximum(y - 16.0, 0.0) * _Y_SCALE
    uf = up2(u) - 128.0
    vf = up2(v) - 128.0
    r = yf + _V_R * vf
    g = yf + _U_G * uf + _V_G * vf
    b = yf + _U_B * uf
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb * (1.0 / 255.0), 0.0, 1.0)
