"""SegFormer (MiT encoder + all-MLP decode head) — TPU-native flax.

The reference uses HuggingFace ``SegformerForSemanticSegmentation`` with the
``nvidia/segformer-b3-finetuned-cityscapes-1024-1024`` checkpoint as a frozen
person-mask model for slot training (ref run_slot_finetuning.py:423-427,
engine/engine_for_slot.py:108-118).  This is a from-scratch channels-last
re-implementation with the same math:

  * overlapping patch embeddings (7/4/3 then 3/2/1 convs) + LayerNorm
  * efficient self-attention with spatial-reduction (sr) K/V
  * Mix-FFN (dense -> 3x3 depthwise conv -> GELU -> dense)
  * per-stage final LayerNorm
  * all-MLP decode head: per-stage linear -> bilinear upsample to 1/4 ->
    concat (reversed stage order) -> 1x1 fuse conv -> frozen BatchNorm ->
    ReLU -> classifier; logits at 1/4 input resolution

Inference-only (the mask model is frozen eval in the reference); BatchNorm
uses imported running statistics, dropout/drop-path are omitted.  Layout is
NHWC / [B, N, C] so convs and matmuls tile directly onto the MXU; compute
dtype is configurable (bf16 for the in-step mask model, f32 for parity
tests).

Golden parity vs the HF torch implementation (random weights, offline):
tests/test_segformer.py.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from devias_tpu.nn.vit import FastLayerNorm

# FastLayerNorm keeps the LN stats on the MXU (nn/vit.py::_row_means)
# instead of XLA's cross-lane reductions; same math and param names/shapes
# as nn.LayerNorm, so HF checkpoint import is unchanged. Measured ~neutral
# at b3 geometry (209.9 vs 209.6 ms/step — the dense2 stall initially
# blamed on LN fusion was actually the exact-erf GELU, see _MixFFN); kept
# for consistency with the ViT path.
def _ln(eps, dtype, name):
    return FastLayerNorm(epsilon=eps, dtype=dtype, name=name)

# Cityscapes trainId 11 == 'person' (ref engine_for_slot.py:114 `== 11`).
CITYSCAPES_PERSON_CLASS = 11


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    num_labels: int = 19
    hidden_sizes: Tuple[int, ...] = (64, 128, 320, 512)
    depths: Tuple[int, ...] = (3, 4, 18, 3)
    num_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    mlp_ratio: int = 4
    decoder_hidden_size: int = 768
    layer_norm_eps: float = 1e-6
    bn_eps: float = 1e-5


def segformer_b0(num_labels: int = 19) -> SegformerConfig:
    return SegformerConfig(
        num_labels=num_labels, hidden_sizes=(32, 64, 160, 256),
        depths=(2, 2, 2, 2), decoder_hidden_size=256,
    )


def segformer_b3(num_labels: int = 19) -> SegformerConfig:
    """nvidia/segformer-b3-* geometry (the reference's mask model)."""
    return SegformerConfig(num_labels=num_labels)


class _EfficientSelfAttention(nn.Module):
    """Sequence-reduction attention: K/V come from an sr x sr strided conv
    of the feature map (HF SegformerEfficientSelfAttention semantics)."""

    dim: int
    heads: int
    sr_ratio: int
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        hd = C // self.heads
        q = nn.Dense(C, dtype=self.dtype, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            sp = x.reshape(B, H, W, C)
            sp = nn.Conv(
                C, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
                padding="VALID", dtype=self.dtype, name="sr",
            )(sp)
            kv_in = sp.reshape(B, -1, C)
            kv_in = _ln(self.eps, self.dtype, "sr_norm")(kv_in)
        k = nn.Dense(C, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(C, dtype=self.dtype, name="v")(kv_in)

        M = kv_in.shape[1]
        q = q.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, M, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, M, self.heads, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(jnp.asarray(hd, jnp.float32)).astype(q.dtype)
        a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(s.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v).transpose(0, 2, 1, 3).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(o)


class _MixFFN(nn.Module):
    """dense1 -> 3x3 depthwise conv (spatial) -> GELU -> dense2."""

    dim: int
    hidden: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, H, W):
        B, N, C = x.shape
        h = nn.Dense(self.hidden, dtype=self.dtype, name="dense1")(x)
        sp = h.reshape(B, H, W, self.hidden)
        sp = nn.Conv(
            self.hidden, (3, 3), padding=1, feature_group_count=self.hidden,
            dtype=self.dtype, name="dwconv",
        )(sp)
        h = sp.reshape(B, N, self.hidden)
        # bf16 path uses tanh GELU, f32 keeps exact erf — the same policy
        # (and the same <=4.7e-4 bound argument) as nn/vit.py::Mlp. XLA
        # fuses this GELU into the dense2 GEMM; with exact erf that fusion
        # ran at 7.9 TF/s (profiled round 4, ~16 ms/step across the MiT-B3
        # blocks at ~850M GELU evals/step).
        h = nn.gelu(h, approximate=self.dtype == jnp.bfloat16)
        return nn.Dense(self.dim, dtype=self.dtype, name="dense2")(h)


class _Block(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, H, W):
        h = _ln(self.eps, self.dtype, "norm1")(x)
        x = x + _EfficientSelfAttention(
            self.dim, self.heads, self.sr_ratio, self.eps, self.dtype, name="attn"
        )(h, H, W)
        h = _ln(self.eps, self.dtype, "norm2")(x)
        return x + _MixFFN(self.dim, self.dim * self.mlp_ratio, self.dtype, name="mlp")(h, H, W)


class _LinearFuseParam(nn.Module):
    """Holds the decode head's 1x1 fuse-conv kernel under the same param
    path/shape as the former nn.Conv ('linear_fuse'/kernel [1,1,4D,D]) so
    HF checkpoint import is unchanged; the head consumes it block-wise
    (see the commuted-resize note in Segformer.__call__)."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.out_features), jnp.float32,
        )


class _FrozenBatchNorm(nn.Module):
    """BatchNorm with imported running statistics (inference only)."""

    features: int
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)


class Segformer(nn.Module):
    """Semantic segmentation model; input [B, H, W, 3] -> logits
    [B, H/4, W/4, num_labels] (channels-last, matching HF's /4-resolution
    output before the engine's x4 upsample, ref engine_for_slot.py:112-113)."""

    config: SegformerConfig = SegformerConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = x.astype(self.dtype)
        feats = []
        for s in range(4):
            p, st = cfg.patch_sizes[s], cfg.strides[s]
            x = nn.Conv(
                cfg.hidden_sizes[s], (p, p), strides=(st, st), padding=p // 2,
                dtype=self.dtype, name=f"patch_embed_{s}_proj",
            )(x)
            B, H, W, C = x.shape
            t = x.reshape(B, H * W, C)
            t = _ln(cfg.layer_norm_eps, self.dtype, f"patch_embed_{s}_norm")(t)
            for i in range(cfg.depths[s]):
                t = _Block(
                    C, cfg.num_heads[s], cfg.sr_ratios[s], cfg.mlp_ratio,
                    cfg.layer_norm_eps, self.dtype, name=f"block_{s}_{i}",
                )(t, H, W)
            t = _ln(cfg.layer_norm_eps, self.dtype, f"stage_norm_{s}")(t)
            x = t.reshape(B, H, W, C)
            feats.append(x)

        # all-MLP decode head (HF SegformerDecodeHead): project each stage to
        # the decoder width, upsample to the stage-0 grid, concat REVERSED,
        # 1x1 fuse conv. Computed here in the algebraically identical order
        # fuse(concat(resize(p_s))) == sum_s resize(p_s @ W_s): a 1x1 conv
        # mixes channels per pixel and a bilinear resize mixes pixels per
        # channel, so they commute exactly; W_s is the REVERSED-concat block
        # of the fuse kernel (stage s -> rows (3-s)*D:(4-s)*D). Each stage's
        # fuse GEMM then runs on its own small grid (1/4..1/64 of the
        # pixels) and the 3072-wide concat disappears — measured ~8 ms/step
        # off the b3 head at batch 12x8 frames. Param tree is unchanged
        # (kernel [1,1,4D,D] under 'linear_fuse', HF import untouched).
        h0, w0 = feats[0].shape[1], feats[0].shape[2]
        D = cfg.decoder_hidden_size
        fuse_kernel = _LinearFuseParam(4 * D, D, name="linear_fuse")()
        fused = None
        for s, f in enumerate(feats):
            p = nn.Dense(D, dtype=self.dtype, name=f"linear_c_{s}")(f)
            w_s = fuse_kernel[0, 0, (3 - s) * D:(4 - s) * D, :].astype(self.dtype)
            q = p @ w_s
            if q.shape[1] != h0 or q.shape[2] != w0:
                q = jax.image.resize(
                    q.astype(jnp.float32), (q.shape[0], h0, w0, q.shape[3]), "bilinear"
                ).astype(self.dtype)
            fused = q if fused is None else fused + q
        fused = _FrozenBatchNorm(cfg.decoder_hidden_size, cfg.bn_eps, self.dtype,
                                 name="bn")(fused)
        fused = nn.relu(fused)
        return nn.Conv(cfg.num_labels, (1, 1), dtype=self.dtype, name="classifier")(fused)


def person_masks(logits: jnp.ndarray, out_hw: Tuple[int, int],
                 person_class: int = CITYSCAPES_PERSON_CLASS) -> jnp.ndarray:
    """Quarter-res logits [B, H/4, W/4, L] -> boolean person mask [B, H, W].

    Matches the reference post-processing (engine_for_slot.py:112-114):
    bilinear x4 upsample of the logits (align_corners=False, i.e. half-pixel
    centers, which jax.image.resize 'bilinear' also uses), then argmax ==
    person.  Upsampling the 19 class maps — not the argmax — preserves the
    reference's soft boundary behavior.
    """
    B = logits.shape[0]
    up = jax.image.resize(
        logits.astype(jnp.float32), (B, out_hw[0], out_hw[1], logits.shape[-1]),
        "bilinear",
    )
    return jnp.argmax(up, axis=-1) == person_class
