"""Slot-attention aggregation block.

Capability parity with the reference agg_block (ref: agg_block/agg_block.py:8-139,
agg_block/attention.py:85-141): `depth` rounds of Perceiver-style
cross-attention from `num_latents` learned slot queries onto the patch
tokens, with the slot-attention twist — softmax over the *slot* axis
(competition between slots for each token) followed by re-normalization
over the key axis — plus a pre-norm feed-forward, optional weight tying
across rounds, and a final LayerNorm.

Returns (slots [B, S, D], sim [B, heads, S, N]) where `sim` is the last
round's pre-renormalization slot-softmax attention, consumed by the mask
distillation loss after a head-mean (ref: utils/loss/train_loss.py:94-97).

TPU notes: the context (patch tokens) is fixed across rounds, so K/V and the
context LayerNorm are computed once per unique layer and reused; all matmuls
are [B*S or B*N, big] dense ops that tile onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from devias_tpu.nn.vit import trunc02

Dtype = Any

# torch nn.LayerNorm default eps (the agg block uses default-eps LayerNorms,
# unlike the backbone's 1e-6; ref agg_block/attention.py:29)
TORCH_LN_EPS = 1e-5


class _Kernel(nn.Module):
    """Param holder producing the same tree path as nn.Dense
    ('<name>/kernel' [+ '/bias']) so fused and unfused paths share
    checkpoints."""

    shape: tuple
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc02, self.shape, jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.shape[-1],), jnp.float32)
            return k, b
        return k


class SlotCrossAttention(nn.Module):
    """Cross-attention with inverted (slot-axis) softmax + key renorm
    (ref: agg_block/attention.py:85-141). heads=4, dim_head=512 as set at
    agg_block/agg_block.py:83.

    fused=True routes through the Pallas fused kernel
    (devias_tpu.kernels.slot_attention): projections + slot softmax +
    renorm + output projection in one context pass. Same math, same params."""

    heads: int = 4
    dim_head: int = 512
    dropout: float = 0.0
    fused: bool = False
    fused_interpret: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, deterministic: bool = True, k_pos=None):
        B, S, D = x.shape
        N = context.shape[1]
        inner = self.heads * self.dim_head
        scale = self.dim_head**-0.5

        wq = _Kernel((D, inner), name="to_q")()
        wk = _Kernel((context.shape[-1], inner), name="to_k")()
        wv = _Kernel((context.shape[-1], inner), name="to_v")()
        wo, bo = _Kernel((inner, D), use_bias=True, name="to_out")()
        wq, wk, wv, wo, bo = (w.astype(self.dtype) for w in (wq, wk, wv, wo, bo))

        if self.fused and self.dropout == 0.0 and k_pos is None:
            from devias_tpu.kernels.slot_attention import fused_slot_attention

            out, sim_distill = fused_slot_attention(
                x, context, wq, wk, wv, wo, bo,
                self.heads, self.dim_head, None, self.fused_interpret,
            )
            return out, sim_distill

        q = (x @ wq).reshape(B, S, self.heads, self.dim_head)
        # positional encoding is added to KEYS only (ref attention.py:123-126)
        k_in = context if k_pos is None else context + k_pos.astype(context.dtype)
        k = (k_in @ wk).reshape(B, N, self.heads, self.dim_head)
        v = (context @ wv).reshape(B, N, self.heads, self.dim_head)

        sim = jnp.einsum("bshd,bnhd->bhsn", q, k) * scale
        # slot-attention competition: softmax over the slot axis S
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=2)
        sim_distill = attn  # pre-renorm map used by the distill loss
        # re-normalize over keys so each slot's weights sum to 1
        attn = attn / (attn.sum(axis=-1, keepdims=True) + 1e-7)
        attn = attn.astype(self.dtype)

        out = jnp.einsum("bhsn,bnhd->bshd", attn, v).reshape(B, S, inner)
        out = out @ wo + bo
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, sim_distill


class _AggLayer(nn.Module):
    """One round: PreNorm(cross-attn) + residual, PreNorm(FF) + residual
    (ref: agg_block/agg_block.py:131-136). The context LayerNorm lives here
    (PreNorm's norm_context, ref agg_block/attention.py:25-40) but is applied
    by the caller once per unique layer since the context never changes."""

    latent_dim: int = 768
    heads: int = 4
    dim_head: int = 512
    ff_mult: int = 4
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    fused: bool = False
    fused_interpret: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.norm_q = nn.LayerNorm(epsilon=TORCH_LN_EPS, dtype=self.dtype, name="norm_q")
        self.norm_context = nn.LayerNorm(
            epsilon=TORCH_LN_EPS, dtype=self.dtype, name="norm_context"
        )
        self.cross_attn = SlotCrossAttention(
            heads=self.heads,
            dim_head=self.dim_head,
            dropout=self.attn_dropout,
            fused=self.fused,
            fused_interpret=self.fused_interpret,
            dtype=self.dtype,
            name="cross_attn",
        )
        self.norm_ff = nn.LayerNorm(epsilon=TORCH_LN_EPS, dtype=self.dtype, name="norm_ff")
        self.ff_fc1 = nn.Dense(
            self.latent_dim * self.ff_mult, dtype=self.dtype, kernel_init=trunc02, name="ff_fc1"
        )
        self.ff_fc2 = nn.Dense(
            self.latent_dim, dtype=self.dtype, kernel_init=trunc02, name="ff_fc2"
        )
        self.ff_drop = nn.Dropout(self.ff_dropout)

    def __call__(self, x, normed_context, deterministic: bool = True, k_pos=None):
        attn_out, sim = self.cross_attn(
            self.norm_q(x), normed_context, deterministic=deterministic, k_pos=k_pos
        )
        x = attn_out + x
        y = self.norm_ff(x)
        y = self.ff_fc1(y)
        y = nn.gelu(y, approximate=False)
        y = self.ff_drop(y, deterministic=deterministic)
        y = self.ff_fc2(y)
        x = y + x
        return x, sim

    def norm_ctx(self, context):
        return self.norm_context(context)


class AggregationBlock(nn.Module):
    """Stack of `depth` slot cross-attention rounds over learned queries.

    weight_tie=True reuses one _AggLayer's params for every round (the
    reference's cache_fn tying, ref agg_block/agg_block.py:90-103; the
    published recipes tie with depth 8 for K400/HVU, docs/TRAIN.md:48).
    """

    num_latents: int = 2
    latent_dim: int = 768
    depth: int = 4
    weight_tie: bool = True
    heads: int = 4
    dim_head: int = 512
    ff_mult: int = 4
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    last_ln: bool = True
    pos_enc_type: str = "none"  # 'none' (all published configs) | 'sine1d' | 'sine2d'
    fused: bool = False
    fused_interpret: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, context, deterministic: bool = True):
        B = context.shape[0]
        # learned queries, standard-normal init (ref agg_block/agg_block.py:62)
        latents = self.param(
            "latents",
            nn.initializers.normal(stddev=1.0),
            (self.num_latents, self.latent_dim),
            jnp.float32,
        )
        x = jnp.tile(latents.astype(self.dtype)[None], (B, 1, 1))

        n_unique = 1 if self.weight_tie else self.depth
        layers = [
            _AggLayer(
                latent_dim=self.latent_dim,
                heads=self.heads,
                dim_head=self.dim_head,
                ff_mult=self.ff_mult,
                attn_dropout=self.attn_dropout,
                ff_dropout=self.ff_dropout,
                fused=self.fused,
                fused_interpret=self.fused_interpret,
                dtype=self.dtype,
                name=f"layers_{i}",
            )
            for i in range(n_unique)
        ]
        # context is static across rounds: normalize once per unique layer
        normed_ctx = [layer.norm_ctx(context) for layer in layers]

        k_pos = None
        if self.pos_enc_type not in ("none", "", None):
            from devias_tpu.nn.pos_encoding import build_position_encoding

            k_pos = build_position_encoding(
                self.pos_enc_type, context.shape[1], context.shape[-1]
            )

        sim = None
        for i in range(self.depth):
            j = 0 if self.weight_tie else i
            x, sim = layers[j](x, normed_ctx[j], deterministic=deterministic, k_pos=k_pos)

        if self.last_ln:
            x = nn.LayerNorm(
                epsilon=TORCH_LN_EPS, dtype=self.dtype, name="last_norm"
            )(x)
        return x, sim
