"""Fused multi-head attention Pallas kernel for the video ViT backbone.

Why not textbook streaming flash attention: the DEVIAS sequence is FIXED at
1568 patch tokens with head_dim 64 (SURVEY §5.7), so an entire K/V head
(1568 x 64 bf16 = 200 KB each) fits comfortably in VMEM. The kernel
therefore tiles only the query axis and keeps whole attention rows
on-chip: s = qK^T and p = softmax(s) never touch HBM — which is exactly
the traffic that dominates the XLA baseline (the [B, 12, 1568, 1568]
materialization, ref model/modeling_slot.py:101-112).

fwd:  per (batch*head, q-block): s = q@K^T * scale (f32 on the MXU),
      row softmax in f32, o = p@V (p cast to input dtype).
bwd:  recomputes p from q/K (cheaper than spilling P to HBM), then
      dv += p^T dO ; dp = dO V^T ; ds = p*(dp - rowsum(dp*p)) ;
      dq = ds K * scale ; dk += ds^T q * scale — dk/dv accumulate across
      q-blocks by revisiting the same output block (sequential TPU grid).

Both directions are exposed through jax.custom_vjp; numerics match the
pure-JAX path (f32 softmax) to bf16 tolerance.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(n: int, preferred: int = 256) -> int:
    """Largest divisor of n that is <= preferred and a multiple of 16
    (bf16 sublane tile); falls back to n itself for tiny inputs."""
    best = None
    for b in range(min(preferred, n), 15, -1):
        if n % b == 0 and b % 16 == 0:
            best = b
            break
    return best or n


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # VPU passes over the [bq, n] tile are the fwd bottleneck (the two
    # matmuls are half-MXU at d=64), so: scale q (not s) on the tiny
    # [bq, d] block, and defer the softmax 1/rowsum past the e@V matmul —
    # the divide then runs on [bq, d] instead of [bq, n] (n/d = 24x less).
    q = q_ref[0] * scale  # [bq, d]
    k = k_ref[0]  # [n, d]
    v = v_ref[0]  # [n, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, n]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = e.sum(axis=-1, keepdims=True)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale: float):
    # Recomputes e from q/K (cheaper than spilling P to HBM), then applies
    # the flash-attention identities that keep every extra elementwise pass
    # on [bq, d] instead of [bq, n]:
    #   D  = rowsum(dO * O)                      (instead of rowsum(dP * P))
    #   t  = e * (dP - D)            => dS = t * inv_l (row scale, deferred)
    #   dq = (t @ K) * (inv_l * scale)           (row scale on [bq, d])
    #   dk += t^T @ (q * inv_l * scale)          (row scale on [bq, d])
    #   dv += (e * inv_l)^T @ dO
    iq = pl.program_id(1)
    nq = pl.num_programs(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]  # input dtype (bf16): feeds the MXU directly

    s = jax.lax.dot_general(
        q * scale, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)  # [bq, n] f32
    inv_l = 1.0 / e.sum(axis=-1, keepdims=True)  # [bq, 1]

    d_row = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32), axis=-1, keepdims=True
    )  # [bq, 1]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, n]
    t = (e * (dp - d_row)).astype(q.dtype)  # [bq, n]
    p = (e * inv_l).astype(q.dtype)  # [bq, n]

    dq_ref[0] = (
        jnp.dot(t, k, preferred_element_type=jnp.float32) * (inv_l * scale)
    ).astype(dq_ref.dtype)

    dk_contrib = jax.lax.dot_general(
        t, (q * (inv_l * scale)).astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n, d]
    dv_contrib = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [n, d]

    # accumulate in VMEM scratch (one HBM write at the end instead of a
    # read-modify-write of the [N, D] f32 outputs on every q-step)
    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    dk_acc[...] += dk_contrib
    dv_acc[...] += dv_contrib

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _fwd_call(q, k, v, scale: float, block_q: Optional[int], interpret: bool):
    BH, N, D = q.shape
    # fwd holds one [bq, N] f32 tile: bq=784 fits VMEM at N=1568 and
    # measures ~8% faster than 224 (fewer grid steps, better pipelining)
    bq = block_q or _pick_block(N, preferred=784)
    grid = (BH, N // bq)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * N * N * D, bytes_accessed=3 * BH * N * D * 2, transcendentals=BH * N * N
        ),
    )(q, k, v)


def _bwd_call(q, k, v, o, do, scale: float, block_q: Optional[int], interpret: bool):
    BH, N, D = q.shape
    bq = block_q or _pick_block(N)
    grid = (BH, N // bq)
    # accumulated dk/dv in f32 to keep the cross-block sum accurate
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, D), jnp.float32),
            pltpu.VMEM((N, D), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * BH * N * N * D, bytes_accessed=6 * BH * N * D * 2, transcendentals=BH * N * N
        ),
    )(q, k, v, o, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax attention over full rows. q/k/v: [B, H, N, D] -> [B, H, N, D].

    scale multiplies the logits (the reference's q*head_dim**-0.5,
    ref model/modeling_slot.py:105). interpret=True runs the kernel in the
    Pallas interpreter (CPU tests)."""
    B, H, N, D = q.shape
    out = _fwd_call(
        q.reshape(B * H, N, D), k.reshape(B * H, N, D), v.reshape(B * H, N, D),
        scale, block_q, interpret,
    )
    return out.reshape(B, H, N, D)


def _fa_fwd(q, k, v, scale, block_q, interpret):
    out = fused_attention(q, k, v, scale, block_q, interpret)
    # o is saved for the backward's D = rowsum(dO * O) identity, which
    # replaces the [bq, n]-wide rowsum(dP * P)
    return out, (q, k, v, out)


def _fa_bwd(scale, block_q, interpret, res, g):
    q, k, v, o = res
    B, H, N, D = q.shape
    dq, dk, dv = _bwd_call(
        q.reshape(B * H, N, D), k.reshape(B * H, N, D), v.reshape(B * H, N, D),
        o.reshape(B * H, N, D), g.reshape(B * H, N, D), scale, block_q, interpret,
    )
    return dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape)


fused_attention.defvjp(_fa_fwd, _fa_bwd)
