"""Pipeline parallelism for the video backbone (beyond reference parity).

The reference is DP-only (SURVEY §2.8; DDP in utils/utils.py:249-282), so
pipeline parallelism has no CUDA counterpart to mirror — this is the
TPU-native design: a (data, pipe) `jax.sharding.Mesh`, the ViT block stack
split into `pipe` equal stages, and a GPipe-style microbatch schedule
written as ONE `lax.scan` over clock ticks inside `shard_map`, with
`lax.ppermute` shifting activations stage-to-stage over ICI each tick.

Why this shape:
  * the whole schedule is a single traced loop — static trip count
    (n_micro + n_stages - 1), static shapes, reverse-differentiable
    (`ppermute`'s transpose is the inverse permute, `scan`'s is a scan);
  * each device applies only ITS stage's blocks each tick (`lax.scan` over
    the stage's stacked block params), so weights live once per stage —
    the point of PP: model depth beyond one chip's HBM;
  * patch embed + positional table run redundantly on every pipe rank
    (~5% of step FLOPs) — cheaper than a scatter/broadcast round-trip and
    keeps stage 0's tick critical path identical to the other stages'.

Bubble fraction is the usual (S-1)/(M+S-1); pick n_micro >= 4*S to keep it
under ~20%. Deterministic-mode only (dropout/drop_path rng-per-stage is
wired for SP in `seq_parallel_tokens`; PP training with stochastic
regularization raises until the same fold-by-(stage, microbatch) treatment
is added).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .dist import DATA_AXIS

PIPE_AXIS = "pipe"


def make_pp_mesh(
    pipe_parallel: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, pipe) mesh: batch over `data`, ViT depth over `pipe`."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % pipe_parallel != 0:
        raise ValueError(f"{n} devices not divisible by pipe_parallel={pipe_parallel}")
    arr = np.array(devices).reshape(n // pipe_parallel, pipe_parallel)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def _tree_stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def pipeline_tokens(backbone, params, videos, mesh: Mesh, n_micro: int,
                    deterministic: bool = True):
    """Run a VideoViT backbone pipeline-parallel over `mesh`'s pipe axis.

    `params` is the backbone's own param dict (with `blocks_i` children).
    The batch axis additionally shards over the data axis. Returns the full
    token tensor [B, N, D] (replicated over pipe, sharded over data), equal
    to `backbone.apply({'params': params}, videos, True)` up to dtype
    rounding.
    """
    from jax.experimental.shard_map import shard_map

    from devias_tpu.nn.vit import Block, FastLayerNorm  # local import: avoid cycle

    if not deterministic:
        raise NotImplementedError(
            "pipeline parallelism with stochastic regularization: fold rng "
            "by (stage, microbatch) as seq_parallel_tokens does per shard"
        )
    if backbone.use_cls_token or backbone.num_extra_suffix_tokens:
        raise NotImplementedError("pipeline parallelism with cls/suffix tokens")

    n_stages = mesh.shape[PIPE_AXIS]
    depth = backbone.depth
    if depth % n_stages != 0:
        raise ValueError(f"depth {depth} not divisible by pipe={n_stages}")
    per_stage = depth // n_stages

    block = Block(
        num_heads=backbone.num_heads,
        mlp_ratio=backbone.mlp_ratio,
        qkv_bias=backbone.qkv_bias,
        qk_scale=backbone.qk_scale,
        drop=backbone.drop_rate,
        attn_drop=backbone.attn_drop_rate,
        drop_path_rate=0.0,  # identity when deterministic
        init_values=backbone.init_values,
        norm_eps=backbone.norm_eps,
        fused_attention=backbone.fused_attention,
        fused_interpret=backbone.fused_interpret,
        exact_gelu=backbone.exact_gelu,
        dtype=backbone.dtype,
    )
    embed_tail = backbone.copy(depth=0, final_norm=False)

    # stacked per-block params, leading axis [n_stages, per_stage, ...],
    # sharded so each pipe rank holds only its stage's blocks
    stacked = _tree_stack([params[f"blocks_{i}"] for i in range(depth)])
    stacked = jax.tree.map(
        lambda x: x.reshape((n_stages, per_stage) + x.shape[1:]), stacked
    )
    other = {
        k: v for k, v in params.items()
        if not k.startswith("blocks_") and k != "norm"
    }
    norm_p = params.get("norm")

    def run_stage(stage_p, x):
        def one(h, p):
            return block.apply({"params": p}, h, True), None

        x, _ = jax.lax.scan(one, x, stage_p)
        return x

    def body(other_p, stage_p, v):
        # stage_p leaves arrive as [1, per_stage, ...] (this rank's shard)
        stage_p = jax.tree.map(lambda x: x[0], stage_p)
        x = embed_tail.apply({"params": other_p}, v, True)  # [b, N, D]
        b, N, D = x.shape
        M = n_micro
        if b % M:
            raise ValueError(f"local batch {b} not divisible by n_micro {M}")
        xs = x.reshape(M, b // M, N, D)
        out_buf = jnp.zeros_like(xs)
        pipe_idx = jax.lax.axis_index(PIPE_AXIS)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, out_buf = carry
            inj = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            cur = jnp.where(pipe_idx == 0, inj, state)
            out = run_stage(stage_p, cur)
            # collect finished microbatch t-(S-1) on the last stage
            slot = jnp.clip(t - (n_stages - 1), 0, M - 1)
            valid = jnp.logical_and(pipe_idx == n_stages - 1, t >= n_stages - 1)
            prev = jax.lax.dynamic_index_in_dim(out_buf, slot, 0, keepdims=False)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf, jnp.where(valid, out, prev), slot, 0
            )
            state = jax.lax.ppermute(out, PIPE_AXIS, perm)
            return (state, out_buf), None

        (state, out_buf), _ = jax.lax.scan(
            tick, (jnp.zeros_like(xs[0]), out_buf), jnp.arange(M + n_stages - 1)
        )
        y = out_buf.reshape(b, N, D)
        # broadcast the finished tokens from the last stage to every pipe
        # rank (psum of a one-hot-masked tensor == broadcast over ICI)
        y = jax.lax.psum(
            jnp.where(pipe_idx == n_stages - 1, y, jnp.zeros_like(y)), PIPE_AXIS
        )
        if backbone.final_norm:
            y = FastLayerNorm(
                epsilon=backbone.norm_eps, dtype=backbone.dtype
            ).apply({"params": norm_p}, y)
        return y

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(PIPE_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    return fn(other, stacked, videos)
