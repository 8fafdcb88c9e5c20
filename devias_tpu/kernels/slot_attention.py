"""Fused slot cross-attention Pallas kernel for the aggregation block.

One kernel fuses the whole slot-attention round (ref agg_block/attention.py:
120-141): K/V projections of the 1568 patch tokens, the inverted softmax
over the slot axis, the key-axis renormalization, the value aggregation,
AND the output projection — while also emitting the pre-renorm attention
map the mask-distillation loss consumes (ref utils/loss/train_loss.py:94-97).

The fusion hinges on a structural property of slot attention: the softmax
is over SLOTS (per key), so it needs no cross-key reduction — and the
key-axis renorm is a running sum. The kernel streams (head, key-block)
tiles: ctx is read once per head, K/V never materialize outside VMEM, and
the per-head weight slices keep the VMEM footprint ~8 MB (whole projection
matrices double-buffered blow the 16 MB scoped limit).

Backward: jax.vjp replay of the algebraically identical XLA formulation
(slot_attention_reference) — correct by construction; the fwd fusion still
pays off in training because the fwd makes up half the attention cost and
all of eval.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slot_attention_reference(x, ctx, wq, wk, wv, wo, bo, heads: int, dim_head: int):
    """Pure-XLA formulation (identical math to nn/agg.py SlotCrossAttention)."""
    B, S, _ = x.shape
    N = ctx.shape[1]
    scale = dim_head**-0.5
    q = (x @ wq).reshape(B, S, heads, dim_head)
    k = (ctx @ wk).reshape(B, N, heads, dim_head)
    v = (ctx @ wv).reshape(B, N, heads, dim_head)
    sim = jnp.einsum("bshd,bnhd->bhsn", q, k) * scale
    attn = jax.nn.softmax(sim.astype(jnp.float32), axis=2)
    sim_distill = attn
    attn = (attn / (attn.sum(axis=-1, keepdims=True) + 1e-7)).astype(x.dtype)
    out = jnp.einsum("bhsn,bnhd->bshd", attn, v).reshape(B, S, heads * dim_head)
    return out @ wo + bo, sim_distill


def _kernel(x_ref, ctx_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref,
            out_ref, sim_ref, num_acc, den_acc, out_acc,
            *, heads: int, dim_head: int, n_blocks: int, n_real: int):
    ih = pl.program_id(1)
    ib = pl.program_id(2)
    S = x_ref.shape[1]
    scale = dim_head**-0.5

    @pl.when(jnp.logical_and(ih == 0, ib == 0))
    def _():
        out_acc[...] = jnp.zeros_like(out_acc)

    @pl.when(ib == 0)
    def _():
        num_acc[...] = jnp.zeros_like(num_acc)
        den_acc[...] = jnp.zeros_like(den_acc)

    x = x_ref[0]  # [S, D]
    ctx_blk = ctx_ref[0]  # [bn, D]
    bn = ctx_blk.shape[0]

    q = jnp.dot(x, wq_ref[...], preferred_element_type=jnp.float32)  # [S, dh]
    k = jnp.dot(ctx_blk, wk_ref[...], preferred_element_type=jnp.float32)  # [bn, dh]
    v = jnp.dot(ctx_blk, wv_ref[...], preferred_element_type=jnp.float32)  # [bn, dh]

    sim = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [S, bn]
    # slot-axis softmax: per key over S — no cross-key reduction
    m = sim.max(axis=0, keepdims=True)
    e = jnp.exp(sim - m)
    a = e / e.sum(axis=0, keepdims=True)  # [S, bn] f32
    # zero out padding keys (context padded to a 128-multiple: 1568 -> 1664)
    key_idx = ib * bn + jax.lax.broadcasted_iota(jnp.int32, (S, bn), 1)
    a = jnp.where(key_idx < n_real, a, 0.0)
    sim_ref[0, 0] = a.astype(sim_ref.dtype)

    den_acc[...] += a.sum(axis=-1, keepdims=True)  # [S, 1]
    num_acc[...] += jnp.dot(a.astype(jnp.float32), v, preferred_element_type=jnp.float32)

    @pl.when(ib == n_blocks - 1)
    def _():
        o = num_acc[...] / (den_acc[...] + 1e-7)  # [S, dh]
        out_acc[...] += jnp.dot(
            o.astype(wo_ref.dtype), wo_ref[...], preferred_element_type=jnp.float32
        )

        @pl.when(ih == heads - 1)
        def _():
            out_ref[0] = (out_acc[...] + bo_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _fused_fwd(x, ctx, wq, wk, wv, wo, bo, heads, dim_head, block_n, interpret):
    B, S, D = x.shape
    N = ctx.shape[1]
    inner = heads * dim_head
    # TPU lowering requires 128-divisible blocks on the last axis of the
    # sim output: pad the context rows up to a 128 multiple and mask
    bn = block_n or 256
    n_pad = -(-N // bn) * bn
    if n_pad != N:
        ctx = jnp.pad(ctx, ((0, 0), (0, n_pad - N), (0, 0)))
    n_blocks = n_pad // bn

    out, sim = pl.pallas_call(
        functools.partial(
            _kernel, heads=heads, dim_head=dim_head, n_blocks=n_blocks, n_real=N
        ),
        grid=(B, heads, n_blocks),
        in_specs=[
            pl.BlockSpec((1, S, D), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, D), lambda b, h, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, dim_head), lambda b, h, i: (0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, dim_head), lambda b, h, i: (0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, dim_head), lambda b, h, i: (0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim_head, D), lambda b, h, i: (h, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, S, D), lambda b, h, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, S, bn), lambda b, h, i: (b, h, 0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S, D), x.dtype),
            jax.ShapeDtypeStruct((B, heads, S, n_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, dim_head), jnp.float32),
            pltpu.VMEM((S, 1), jnp.float32),
            pltpu.VMEM((S, D), jnp.float32),
        ],
        interpret=interpret,
    )(x, ctx, wq, wk, wv, wo, bo.reshape(1, D))
    return out, sim[:, :, :, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def fused_slot_attention(
    x, ctx, wq, wk, wv, wo, bo,
    heads: int = 4, dim_head: int = 512,
    block_n: Optional[int] = None, interpret: bool = False,
):
    """(out [B,S,D], sim_distill [B,heads,S,N]) — fused slot cross-attention.
    x: normed latents; ctx: normed context; weights as in SlotCrossAttention."""
    return _fused_fwd(x, ctx, wq, wk, wv, wo, bo, heads, dim_head, block_n, interpret)


def _fsa_fwd(x, ctx, wq, wk, wv, wo, bo, heads, dim_head, block_n, interpret):
    out = fused_slot_attention(x, ctx, wq, wk, wv, wo, bo, heads, dim_head, block_n, interpret)
    return out, (x, ctx, wq, wk, wv, wo, bo)


def _fsa_bwd(heads, dim_head, block_n, interpret, res, cotangents):
    # XLA-replay backward of the algebraically identical reference
    x, ctx, wq, wk, wv, wo, bo = res
    _, vjp = jax.vjp(
        lambda *a: slot_attention_reference(*a, heads=heads, dim_head=dim_head),
        x, ctx, wq, wk, wv, wo, bo,
    )
    return vjp(cotangents)


fused_slot_attention.defvjp(_fsa_fwd, _fsa_bwd)
