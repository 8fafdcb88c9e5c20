"""Segformer-driven background mixing for slot training — pure JAX.

Capability parity with the reference ``segformer_mix_sample`` + the engine's
mask extraction (ref engine/engine_for_slot.py:16-47 and :108-118):

  * the frozen SegFormer-B3 (cityscapes) runs on every OTHER frame of the
    clip (8 of 16), on the already-video-normalized pixels (a reference
    quirk: no SegFormer-specific preprocessing is applied)
  * quarter-res logits are bilinearly upsampled x4, argmax == person (11)
  * per-frame masks are repeat_interleaved x2 in time and videos are mixed
    against a batch permutation: videos[perm]*(1-m) + videos*m
  * per-sample keep probability ``prob_aug`` — like the FAME port, the
    reference's batch *reordering* into [augmented; original]
    (engine_for_slot.py:27-38) becomes a shape-static per-sample `where`
    (same multiset, order preserved; downstream losses are order-invariant)
  * masks avg-pool to the patch grid: ``fg_mask`` is ONE randomly chosen
    frame's pooled mask (the reference draws a single shared frame index,
    torch.randint(0,8,(1,)), engine_for_slot.py:42), ``fg_masks_per_frames``
    is all 8 pooled frame masks flattened

Layout: channels-last [B, T, H, W, C] videos (TPU-native) vs the reference
NCTHW.  Everything is jit-friendly static-shape tensor math so the whole
mask-model + mix runs inside the train step on device.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from devias_tpu.nn.segformer import person_masks


def segformer_frame_masks(apply_fn: Callable, videos: jnp.ndarray) -> jnp.ndarray:
    """Frozen-SegFormer person masks for every other frame.

    apply_fn: [N, H, W, 3] -> quarter-res logits [N, H/4, W/4, L]
    videos:   [B, T, H, W, C] (normalized, as the reference feeds them)
    returns:  float mask [B, T//2, H, W]
    """
    B, T, H, W, C = videos.shape
    frames = videos[:, ::2].reshape(B * (T // 2), H, W, C)
    logits = jax.lax.stop_gradient(apply_fn(frames))
    mask = person_masks(logits, (H, W))
    return mask.reshape(B, T // 2, H, W).astype(jnp.float32)


def segformer_mix_sample(
    rng: jax.Array,
    masks: jnp.ndarray,
    videos: jnp.ndarray,
    labels: jnp.ndarray,
    prob_aug: float = 0.5,
    patch_size: int = 16,
) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Mix batch backgrounds behind per-frame person masks
    (ref engine/engine_for_slot.py:16-47).

    masks: [B, T/2, H, W] float; videos: [B, T, H, W, C].
    Returns (videos, labels, (fg_mask [B, N], fg_masks_per_frames [B, T/2*N]))
    with N = (H/patch)*(W/patch).

    Donor permutation spans this batch; under data parallelism wrap with
    shard_local_segformer_mix (train/step.py) so the videos[perm] gather
    stays device-local, mirroring the reference's rank-local permutation
    (engine_for_slot.py:22).
    """
    B, T, H, W, C = videos.shape
    Th = masks.shape[1]
    perm_rng, keep_rng, frame_rng = jax.random.split(rng, 3)

    # repeat each half-rate mask over its frame pair (torch.repeat_interleave
    # with repeats=2 on the time dim, engine_for_slot.py:21)
    m16 = jnp.repeat(masks, 2, axis=1)[..., None]  # [B, T, H, W, 1]
    perm = jax.random.permutation(perm_rng, B)
    fused = videos[perm] * (1.0 - m16) + videos * m16

    if prob_aug < 1:
        keep = jax.random.uniform(keep_rng, (B,)) < prob_aug
    else:
        keep = jnp.ones((B,), bool)
    videos_out = jnp.where(keep[:, None, None, None, None], fused, videos)

    # avg_pool2d(mask, 16, 16) -> [B, T/2, H/16, W/16] (engine_for_slot.py:40)
    gh, gw = H // patch_size, W // patch_size
    pooled = masks.reshape(B, Th, gh, patch_size, gw, patch_size).mean(axis=(3, 5))
    # one shared random frame index for the clip-level mask (:41-42)
    idx = jax.random.randint(frame_rng, (), 0, Th)
    fg_mask = jax.lax.dynamic_index_in_dim(pooled, idx, axis=1, keepdims=False)
    return (
        videos_out.astype(videos.dtype),
        labels,
        (fg_mask.reshape(B, -1), pooled.reshape(B, -1)),
    )
