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
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# exp2-folded softmax (DEVIAS_ATTN_EXP2=1 enables): fold log2(e) into the
# q pre-scale so the row softmax evaluates e = 2^(s2 - m2) directly,
# hoping to delete one full-width [bq, n] VPU multiply per exp. Exact
# math: with S2 = S*log2(e), 2^(S2 - max S2) == exp(S - max S), and in
# the backward the d(2^x)/dx ln2 factor cancels against the folded
# log2(e), so dq/dk keep the ORIGINAL `scale` — verified by the
# kernel-vs-XLA parity tests, which run green either way.
# MEASURED NEUTRAL 2026-08-21 (in-step A/B, docs/PERF.md round 5:
# 153.4 vs 153.5 ms/step): Mosaic's exp already lowers through exp2 with
# the multiply fused, so there is no pass to save. Kept as an off-by-
# default knob so the next person doesn't have to rebuild the experiment.
_EXP2 = os.environ.get("DEVIAS_ATTN_EXP2", "0") == "1"
_LOG2E = 1.4426950408889634


def _softmax_scale(scale: float) -> float:
    return scale * _LOG2E if _EXP2 else scale


def _exp(x):
    return jnp.exp2(x) if _EXP2 else jnp.exp(x)


def _pick_block(n: int, preferred: int = 256) -> int:
    """Largest divisor of n that is <= preferred and a multiple of 16
    (bf16 sublane tile); falls back to n itself for tiny inputs."""
    best = None
    for b in range(min(preferred, n), 15, -1):
        if n % b == 0 and b % 16 == 0:
            best = b
            break
    return best or n


def _vmem_block(n: int, preferred: int, f32_tiles: float) -> int:
    """Block pick that also respects VMEM: the kernels hold ~f32_tiles
    [bq, n] f32 intermediates, so cap bq to keep them under ~45 MB. At the
    flagship N=1568 the caps (fwd 2869, bwd 2049) leave the tuned
    preferred sizes untouched; for longer sequences (e.g. 384^2 / 32-frame
    clips -> 9216 tokens) the q blocks shrink instead of overflowing VMEM.
    Raises (instead of silently overflowing via the whole-N fallback) when
    n has no 16-multiple divisor under the cap."""
    cap = max(16, int(45e6 / (4.0 * f32_tiles * n)))
    bq = _pick_block(n, preferred=min(preferred, cap))
    if bq > cap:
        raise ValueError(
            f"sequence length {n} has no 16-multiple divisor <= {cap}; the "
            f"attention intermediates would overflow VMEM. Pad the token "
            f"count or shard the sequence (core/dist.py seq parallelism)."
        )
    return bq


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # VPU passes over the [bq, n] tile are the fwd bottleneck (the two
    # matmuls are half-MXU at d=64), so: scale q (not s) on the tiny
    # [bq, d] block, and defer the softmax 1/rowsum past the e@V matmul —
    # the divide then runs on [bq, d] instead of [bq, n] (n/d = 24x less).
    q = q_ref[0] * _softmax_scale(scale)  # [bq, d]
    k = k_ref[0]  # [n, d]
    v = v_ref[0]  # [n, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, n]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = _exp(s - m)
    l = e.sum(axis=-1, keepdims=True)
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale: float, q_axis: int = 1):
    # Recomputes e from q/K (cheaper than spilling P to HBM), then applies
    # the flash-attention identities that keep every extra elementwise pass
    # on [bq, d] instead of [bq, n]:
    #   D  = rowsum(dO * O)                      (instead of rowsum(dP * P))
    #   t  = e * (dP - D)            => dS = t * inv_l (row scale, deferred)
    #   dq = (t @ K) * (inv_l * scale)           (row scale on [bq, d])
    #   dk += t^T @ (q * inv_l * scale)          (row scale on [bq, d])
    #   dv += e^T @ (dO * inv_l)                 (row scale on [bq, d];
    #         avoids materializing P = e * inv_l as an extra [bq, n] pass)
    iq = pl.program_id(q_axis)
    nq = pl.num_programs(q_axis)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]  # input dtype (bf16): feeds the MXU directly

    s = jax.lax.dot_general(
        q * _softmax_scale(scale), k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    e = _exp(s - m)  # [bq, n] f32  (dq/dk below keep the ORIGINAL scale:
    # the exp2 backward's ln2 cancels the folded log2e exactly)
    inv_l = 1.0 / e.sum(axis=-1, keepdims=True)  # [bq, 1]

    d_row = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32), axis=-1, keepdims=True
    )  # [bq, 1]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, n]
    t = (e * (dp - d_row)).astype(q.dtype)  # [bq, n]
    e_b = e.astype(q.dtype)  # [bq, n] (the only other full-width pass)

    dq_ref[0] = (
        jnp.dot(t, k, preferred_element_type=jnp.float32) * (inv_l * scale)
    ).astype(dq_ref.dtype)

    dk_contrib = jax.lax.dot_general(
        t, (q * (inv_l * scale)).astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [n, d]
    dv_contrib = jax.lax.dot_general(
        e_b, (do * inv_l).astype(q.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
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
    # wide q blocks win in the backward too (5.52 vs 5.95 ms/layer at 224
    # on v5e, batch 12): fewer grid steps amortize the K/V residency
    bq = block_q or _pick_block(N, preferred=784)
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


def _stats_width(hpb: int) -> int:
    """Lanes of the softmax-stats side output: m and l per head, padded to
    a multiple of 8 sublane-friendly lanes (block last dim == array dim,
    so any width is Mosaic-legal)."""
    return max(8, 2 * hpb)


def _fwd_kernel_mh(q_ref, k_ref, v_ref, o_ref, *stats_ref, scale: float, D: int):
    """Forward over `hpb` heads laid side by side in the minor dim
    (block width hpb*D so the lane dimension stays 128-aligned).

    With a stats output present (the differentiated path) it also emits the
    per-row softmax statistics — columns [0, hpb) hold the row max m,
    [hpb, 2*hpb) the exp-sum l — so the backward can rebuild e = exp(s - m)
    and 1/l without re-reducing the [bq, n] tile (the two cross-lane
    reductions cost ~0.8 ms/layer at batch 12). The primal/eval path omits
    the output entirely (frozen-teacher and inference forwards should not
    pay the extra HBM writes)."""
    hpb = q_ref.shape[-1] // D
    q = q_ref[0] * _softmax_scale(scale)
    # software pipeline across the side-by-side heads: issue head h+1's
    # s-matmul (MXU) before head h's softmax (VPU), and head h's e@V before
    # head h+1's softmax — the units overlap instead of serializing.
    # Profiled serial form: 1.148 ms/layer == MXU time (0.77) + VPU time
    # (0.37) exactly; the independent per-head chains are what the
    # in-order-issue core needs to hide the exp passes.
    def _s(h):
        sl = slice(h * D, (h + 1) * D)
        return jax.lax.dot_general(
            q[:, sl], k_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    cols = []
    s_next = _s(0)
    for h in range(hpb):
        sl = slice(h * D, (h + 1) * D)
        s = s_next
        if h + 1 < hpb:
            s_next = _s(h + 1)  # MXU ahead of this head's VPU work
        m = jnp.max(s, axis=-1, keepdims=True)
        e = _exp(s - m)
        # the exp-sum l rides the e@V matmul as a ones-column appended to
        # the V tile: at D=64 the dot fills only half the MXU's 128 output
        # lanes, so the extra column is free MXU work and replaces a
        # cross-lane VPU reduction over the [bq, n] tile (the serialized
        # VPU time is the measured fwd gap to roofline, docs/PERF.md).
        # l sums the same bf16-rounded e the numerator uses, so o = o65/l
        # stays self-consistent.
        eb = e.astype(v_ref.dtype)
        v65 = jnp.concatenate(
            [v_ref[0, :, sl], jnp.ones((v_ref.shape[1], 1), v_ref.dtype)], axis=1
        )
        o65 = jnp.dot(eb, v65, preferred_element_type=jnp.float32)
        l = o65[:, D:D + 1]
        o_ref[0, :, sl] = (o65[:, :D] / l).astype(o_ref.dtype)
        cols.append((m, l))
    if stats_ref:
        (sref,) = stats_ref
        pad = sref.shape[-1] - 2 * hpb
        parts = [m for m, _ in cols] + [l for _, l in cols]
        if pad:  # zero-size vectors are not Mosaic-legal
            parts.append(jnp.zeros((q.shape[0], pad), jnp.float32))
        sref[0, 0] = jnp.concatenate(parts, axis=1)


def _bwd_kernel_mh(q_ref, k_ref, v_ref, o_ref, do_ref, stats_ref,
                   dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                   *, scale: float, D: int):
    # e is rebuilt from the forward's saved per-row (m, l) — identical to
    # the forward's e (better than a recompute) and ~0.8 ms/layer cheaper
    # than re-reducing max and sum over the [bq, n] tile.
    iq = pl.program_id(2)
    nq = pl.num_programs(2)
    hpb = q_ref.shape[-1] // D

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    # software pipeline across the side-by-side heads (same idea as the
    # forward): every head's s-matmul (MXU) is hoisted ahead of the first
    # head's VPU passes, and each head's dP matmul issues at the TOP of its
    # iteration — so e_h (which depends only on s_h) executes on the VPU
    # while the MXU works through dP_h and the previous head's three output
    # matmuls. The serial form measured 2.60 ms/layer = MXU time + ~0.7 ms
    # of unoverlapped VPU. Only the s tiles stay live across heads, keeping
    # whole-N q-blocks inside the VMEM budget.
    s_all = []
    for h in range(hpb):
        sl = slice(h * D, (h + 1) * D)
        s_all.append(jax.lax.dot_general(
            q_ref[0, :, sl] * _softmax_scale(scale), k_ref[0, :, sl],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    for h in range(hpb):
        sl = slice(h * D, (h + 1) * D)
        q = q_ref[0, :, sl]
        k = k_ref[0, :, sl]
        do = do_ref[0, :, sl]
        dp = jax.lax.dot_general(
            do, v_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = stats_ref[0, 0, :, h][:, None]
        e = _exp(s_all[h] - m)
        inv_l = (1.0 / stats_ref[0, 0, :, hpb + h])[:, None]
        d_row = jnp.sum(
            do.astype(jnp.float32) * o_ref[0, :, sl].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        t = (e * (dp - d_row)).astype(q.dtype)
        e_b = e.astype(q.dtype)
        dq_ref[0, :, sl] = (
            jnp.dot(t, k, preferred_element_type=jnp.float32) * (inv_l * scale)
        ).astype(dq_ref.dtype)
        dk_acc[:, sl] += jax.lax.dot_general(
            t, (q * (inv_l * scale)).astype(q.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_acc[:, sl] += jax.lax.dot_general(
            e_b, (do * inv_l).astype(q.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _heads_per_block(H: int, D: int) -> int:
    """Fewest side-by-side heads making the block lane dim 128-aligned."""
    hpb = 1
    while (hpb * D) % 128 != 0 and hpb < H:
        hpb += 1
    if (hpb * D) % 128 != 0 or H % hpb != 0:
        raise ValueError(f"cannot tile heads: H={H}, D={D}")
    return hpb


def _fwd_call_qkv(qkv, H: int, scale: float, block_q: Optional[int], interpret: bool,
                  with_stats: bool = True):
    """Attention directly on the fused projection output.

    qkv: [B, N, 3*H*D] (the qkv Dense output, q|k|v each H*D wide)
    returns o: [B, N, H*D]

    The per-(head, component) D-slices are contiguous in the minor dim, so
    BlockSpec index maps address them as blocks of width hpb*D — q/k/v are
    never transposed into [B, H, N, D] form. This retires the
    head-split/merge layout copies that dominated the profile (~20 ms/step
    at batch 12: [12,12,1568,64] and [12,N,2304] copies around every
    attention call).
    """
    B, N, W3 = qkv.shape
    D = W3 // (3 * H)
    hpb = 1 if interpret else _heads_per_block(H, D)
    G = H // hpb  # head-group blocks per component
    bq = block_q or _vmem_block(N, preferred=784, f32_tiles=3.5)
    grid = (B, G, N // bq)
    W = hpb * D
    SW = _stats_width(hpb)
    out_specs = [pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, N, H * D), qkv.dtype)]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((1, 1, bq, SW), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((B, G, N, SW), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_mh, scale=scale, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda b, h, i, G=G: (b, 0, G + h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda b, h, i, G=G: (b, 0, 2 * G + h), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * N * N * D, bytes_accessed=4 * B * N * H * D * 2,
            transcendentals=B * H * N * N,
        ),
    )(qkv, qkv, qkv)
    return out if with_stats else (out[0], None)


def _bwd_call_qkv(qkv, o, do, stats, H: int, scale: float, block_q: Optional[int],
                  interpret: bool):
    """Backward for the qkv-fused layout. Returns dqkv [B, N, 3*H*D]."""
    B, N, W3 = qkv.shape
    D = W3 // (3 * H)
    hpb = 1 if interpret else _heads_per_block(H, D)
    G = H // hpb
    bq = block_q or _vmem_block(N, preferred=1568, f32_tiles=4.5)
    grid = (B, G, N // bq)
    W = hpb * D
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_mh, scale=scale, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda b, h, i, G=G: (b, 0, G + h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda b, h, i, G=G: (b, 0, 2 * G + h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, _stats_width(hpb)), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda b, h, i: (b, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, W), lambda b, h, i: (b, 0, h), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, H * D), qkv.dtype),
            # dk/dv accumulate in f32 VMEM scratch; the HBM write narrows
            # to the input dtype (the Dense backward consumes bf16 anyway)
            jax.ShapeDtypeStruct((B, N, H * D), qkv.dtype),
            jax.ShapeDtypeStruct((B, N, H * D), qkv.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, W), jnp.float32),
            pltpu.VMEM((N, W), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * N * N * D, bytes_accessed=8 * B * N * H * D * 2,
            transcendentals=B * H * N * N,
        ),
    )(qkv, qkv, qkv, o, do, stats)
    # dqkv in the Dense layout; the casts fuse into the concat write
    return jnp.concatenate([dq, dk, dv], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_attention_qkv(
    qkv: jnp.ndarray,
    num_heads: int,
    scale: float,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax attention taking the fused qkv projection [B, N, 3*H*D]
    (q|k|v contiguous) and returning [B, N, H*D] — both in the layouts the
    surrounding Dense layers produce/consume, so no transposes enter the
    graph in either direction."""
    out, _ = _fwd_call_qkv(qkv, num_heads, scale, block_q, interpret,
                           with_stats=False)
    return out


def _fa_qkv_fwd(qkv, num_heads, scale, block_q, interpret):
    out, stats = _fwd_call_qkv(qkv, num_heads, scale, block_q, interpret)
    return out, (qkv, out, stats)


def _fa_qkv_bwd(num_heads, scale, block_q, interpret, res, g):
    qkv, o, stats = res
    return (_bwd_call_qkv(qkv, o, g, stats, num_heads, scale, block_q, interpret),)


fused_attention_qkv.defvjp(_fa_qkv_fwd, _fa_qkv_bwd)


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


def _fwd_call_q_kv(q, kv, H: int, scale: float, block_q: Optional[int],
                   interpret: bool, with_stats: bool = True):
    """Cross-shard attention: local queries against gathered K/V.

    q: [B, Nq, H*D] (this shard's query rows), kv: [B, Nk, 2*H*D]
    (k|v contiguous, typically all_gather'd over a sequence-parallel axis).
    Returns o: [B, Nq, H*D]. Same kernel bodies as the fused-qkv entry.
    """
    B, Nq, WHD = q.shape
    D = WHD // H
    Nk = kv.shape[1]
    hpb = 1 if interpret else _heads_per_block(H, D)
    G = H // hpb
    # cap from the GATHERED Nk (the [bq, Nk] intermediates), divisor from Nq
    cap = max(16, int(45e6 / (4.0 * 2.5 * Nk)))
    bq = block_q or _pick_block(Nq, preferred=min(784, cap))
    grid = (B, G, Nq // bq)
    W = hpb * D
    SW = _stats_width(hpb)
    out_specs = [pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, Nq, H * D), q.dtype)]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((1, 1, bq, SW), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((B, G, Nq, SW), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_mh, scale=scale, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, W), lambda b, h, i: (b, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, W), lambda b, h, i, G=G: (b, 0, G + h), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Nq * Nk * D,
            bytes_accessed=(2 * B * Nq * H * D + 2 * B * Nk * H * D) * 2,
            transcendentals=B * H * Nq * Nk,
        ),
    )(q, kv, kv)
    return out if with_stats else (out[0], None)


def _bwd_call_q_kv(q, kv, o, do, stats, H: int, scale: float, block_q: Optional[int],
                   interpret: bool):
    """Backward for the q/kv-split layout. Returns (dq, dkv)."""
    B, Nq, WHD = q.shape
    D = WHD // H
    Nk = kv.shape[1]
    hpb = 1 if interpret else _heads_per_block(H, D)
    G = H // hpb
    cap = max(16, int(45e6 / (4.0 * 3.5 * Nk)))
    bq = block_q or _pick_block(Nq, preferred=min(1568, cap))
    grid = (B, G, Nq // bq)
    W = hpb * D
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_mh, scale=scale, D=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, W), lambda b, h, i: (b, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, W), lambda b, h, i, G=G: (b, 0, G + h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, _stats_width(hpb)), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, W), lambda b, h, i: (b, i, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, W), lambda b, h, i: (b, 0, h), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, W), lambda b, h, i: (b, 0, h), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Nq, H * D), q.dtype),
            jax.ShapeDtypeStruct((B, Nk, H * D), kv.dtype),
            jax.ShapeDtypeStruct((B, Nk, H * D), kv.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Nk, W), jnp.float32),
            pltpu.VMEM((Nk, W), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * H * Nq * Nk * D,
            bytes_accessed=(4 * B * Nq * H * D + 4 * B * Nk * H * D) * 2,
            transcendentals=B * H * Nq * Nk,
        ),
    )(q, kv, kv, o, do, stats)
    dkv = jnp.concatenate([dk, dv], axis=-1)
    return dq, dkv


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_attention_q_kv(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    num_heads: int,
    scale: float,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax attention of local query rows [B, Nq, H*D] against a
    (possibly larger) K/V set [B, Nk, 2*H*D].

    The sequence-parallel building block: under `shard_map` with tokens
    sharded over a mesh axis, each shard calls this with its own q rows and
    the `jax.lax.all_gather`'d kv — autodiff then turns the gather's
    transpose into the reduce-scatter of dkv automatically. Also usable as
    a generic cross-attention kernel."""
    out, _ = _fwd_call_q_kv(q, kv, num_heads, scale, block_q, interpret,
                            with_stats=False)
    return out


def _fa_qkv2_fwd(q, kv, num_heads, scale, block_q, interpret):
    out, stats = _fwd_call_q_kv(q, kv, num_heads, scale, block_q, interpret)
    return out, (q, kv, out, stats)


def _fa_qkv2_bwd(num_heads, scale, block_q, interpret, res, g):
    q, kv, o, stats = res
    return _bwd_call_q_kv(q, kv, o, g, stats, num_heads, scale, block_q, interpret)


fused_attention_q_kv.defvjp(_fa_qkv2_fwd, _fa_qkv2_bwd)
