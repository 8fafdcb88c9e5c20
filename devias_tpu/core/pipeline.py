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
under ~20%.

Stochastic training (deterministic=False, requires `rng`): rng streams are
derived so that the same (sample, block) pair always sees the same stream
regardless of which stage/tick processes it —
  * embed/pos dropout folds the data-shard index only (it runs redundantly
    on every pipe rank and MUST agree across them);
  * in-block dropout and drop_path fold (data shard, global block index,
    microbatch) — distinct streams per block application, with flax's
    make_rng sequencing the two drop_path call sites within a block;
  * each block's stochastic-depth RATE is the reference linspace value for
    its GLOBAL index (ref modeling_slot.py:259 dpr), selected at runtime
    inside the stage scan (nn/vit.py Block drop_path_override).
This enables the published drop_path 0.2 recipe under PP (VERDICT r3
item 4: the full slot step trains under --pp_stages).
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
                    deterministic: bool = True, rng=None):
    """Run a VideoViT backbone pipeline-parallel over `mesh`'s pipe axis.

    `params` is the backbone's own param dict (with `blocks_i` children).
    The batch axis additionally shards over the data axis. Returns the full
    token tensor [B, N, D] (replicated over pipe, sharded over data), equal
    to `backbone.apply({'params': params}, videos, True)` up to dtype
    rounding. deterministic=False (requires `rng`) trains with dropout /
    stochastic depth — rng derivation in the module docstring.
    """
    from jax.experimental.shard_map import shard_map

    from devias_tpu.nn.vit import Block, FastLayerNorm  # local import: avoid cycle

    if not deterministic and rng is None:
        raise ValueError("deterministic=False requires rng")
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

    dpr_full = jnp.asarray(
        np.linspace(0.0, backbone.drop_path_rate, depth), jnp.float32
    )

    def body(other_p, stage_p, v, key):
        # stage_p leaves arrive as [1, per_stage, ...] (this rank's shard)
        stage_p = jax.tree.map(lambda x: x[0], stage_p)
        di = jax.lax.axis_index(DATA_AXIS)
        pipe_idx = jax.lax.axis_index(PIPE_AXIS)
        if deterministic:
            embed_rngs = None
            k_drop = k_dp = None
        else:
            k_embed, k_drop, k_dp = jax.random.split(key, 3)
            # every pipe rank MUST draw the same embed/pos dropout mask
            # (the embed tail runs redundantly on all of them): data fold only
            embed_rngs = {"dropout": jax.random.fold_in(k_embed, di)}
        x = embed_tail.apply(
            {"params": other_p}, v, deterministic, rngs=embed_rngs
        )  # [b, N, D]
        b, N, D = x.shape
        M = n_micro
        if b % M:
            raise ValueError(f"local batch {b} not divisible by n_micro {M}")
        xs = x.reshape(M, b // M, N, D)
        out_buf = jnp.zeros_like(xs)
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        # global block ids of this rank's stage (for the linspace drop_path
        # rate and the per-block rng folds)
        gidx = pipe_idx * per_stage + jnp.arange(per_stage)

        def run_stage(stage_p, x, mb):
            def one(h, p_gi):
                p, gi = p_gi
                if deterministic:
                    return block.apply({"params": p}, h, True), None

                def fold(k):
                    k = jax.random.fold_in(k, di)
                    k = jax.random.fold_in(k, gi)
                    return jax.random.fold_in(k, mb)

                return block.apply(
                    {"params": p}, h, False,
                    drop_path_override=dpr_full[gi],
                    rngs={"dropout": fold(k_drop), "drop_path": fold(k_dp)},
                ), None

            x, _ = jax.lax.scan(one, x, (stage_p, gidx))
            return x

        def tick(carry, t):
            state, out_buf = carry
            inj = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            cur = jnp.where(pipe_idx == 0, inj, state)
            # microbatch id flowing through THIS stage at tick t (warmup /
            # drain ticks compute garbage that is never collected; the clip
            # keeps the rng fold in range)
            out = run_stage(stage_p, cur, jnp.clip(t - pipe_idx, 0, M - 1))
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
        in_specs=(P(), P(PIPE_AXIS), P(DATA_AXIS), P()),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)  # unused when deterministic
    return fn(other, stacked, videos, rng)
