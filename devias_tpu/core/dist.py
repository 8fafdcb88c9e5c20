"""Device mesh + distributed initialization.

Replaces the reference's NCCL process-group setup
(ref: utils/utils.py:249-282 `init_distributed_mode`) with the JAX model:
one process per host, all devices visible, collectives inserted by XLA
under `jit` according to sharding annotations.

Mesh axes:
  data  — batch (data parallel; gradient psum rides ICI)
  model — optional tensor-parallel axis for the ViT MLP/attention heads
          (capability beyond the reference, which is DP-only; SURVEY §2.8)
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a known launcher —
    the counterpart of the reference's env-var/SLURM `init_distributed_mode`
    called from every entry script (ref utils/utils.py:249-282,
    run_slot_finetuning.py:259). Called from every CLI main.

    Launch modes:
      * DEVIAS_TPU_COORDINATOR=<host:port> + DEVIAS_TPU_NUM_PROCS +
        DEVIAS_TPU_PROC_ID — explicit (the torchrun-env equivalent; also
        what tests/test_multihost.py uses on CPU)
      * DEVIAS_TPU_AUTO_DIST=1 — `jax.distributed.initialize()` auto-detect
        (Cloud TPU pod slices / SLURM)
    Single-host (the common case, incl. tests) is a no-op; mirrors the
    reference's single-GPU fallback (utils/utils.py:261-265).
    """
    # NB: must run before any backend use; jax.process_count() here would
    # itself materialize a single-process backend.
    try:
        if os.environ.get("DEVIAS_TPU_COORDINATOR"):
            jax.distributed.initialize(
                coordinator_address=os.environ["DEVIAS_TPU_COORDINATOR"],
                num_processes=int(os.environ.get("DEVIAS_TPU_NUM_PROCS", "1")),
                process_id=int(os.environ.get("DEVIAS_TPU_PROC_ID", "0")),
            )
        elif os.environ.get("DEVIAS_TPU_AUTO_DIST"):
            jax.distributed.initialize()
    except RuntimeError as exc:  # double init (e.g. repeated main() in tests)
        if "already initialized" not in str(exc).lower():
            raise


def device_count() -> int:
    return jax.device_count()


def make_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a (data, model) mesh over all devices.

    model_parallel=1 gives pure DP — the reference's only strategy
    (DDP/DeepSpeed ZeRO-0; SURVEY §2.8).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-host batch size for the host-side data loader."""
    n_data = mesh.shape[DATA_AXIS]
    if global_batch % n_data != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {n_data}")
    hosts = jax.process_count()
    return global_batch // hosts


def shard_batch(tree, mesh: Mesh):
    """Place a host-local batch pytree onto the mesh, sharded over data axis."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def tp_param_spec(path, leaf) -> P:
    """Megatron-style tensor-parallel PartitionSpec for a ViT param leaf:
    column-parallel QKV/MLP-up (shard the output features), row-parallel
    attention-proj/MLP-down (shard the input features); XLA inserts the
    matching all-reduces. Beyond reference parity (the reference is
    DP-only, SURVEY §2.8) — used when ViT-B is scaled past one chip."""
    names = tuple(getattr(p, "key", str(p)) for p in path)
    last = names[-1] if names else ""
    parent = names[-2] if len(names) > 1 else ""
    in_mlp = "mlp" in names
    if last == "qkv_kernel":  # column-parallel fused QKV
        return P(None, MODEL_AXIS)
    if in_mlp and parent == "fc1":  # column-parallel MLP up
        return P(None, MODEL_AXIS) if last == "kernel" else P(MODEL_AXIS)
    if in_mlp and parent == "fc2" and last == "kernel":  # row-parallel MLP down
        return P(MODEL_AXIS, None)
    if parent == "proj" and last == "kernel":  # row-parallel attn output
        return P(MODEL_AXIS, None)
    return P()


def shard_params_tp(params, mesh: Mesh):
    """Place a param tree with tensor-parallel shardings over the model
    axis (replicated where tp_param_spec returns P())."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, tp_param_spec(path, leaf)))

    return jax.tree_util.tree_map_with_path(place, params)


def zero1_spec(leaf, n_data: int) -> P:
    """ZeRO-1 PartitionSpec for one optimizer-moment leaf: shard the first
    axis divisible by the data-axis size, replicate leaves with none (tiny
    biases/scales — their replication cost is negligible)."""
    if leaf.ndim == 0 or not jnp_issubdtype_inexact(leaf):
        return P()
    for axis, d in enumerate(leaf.shape):
        if d >= n_data and d % n_data == 0:
            return P(*([None] * axis + [DATA_AXIS]))
    return P()


def jnp_issubdtype_inexact(leaf) -> bool:
    import jax.numpy as jnp

    return jnp.issubdtype(leaf.dtype, jnp.inexact)


def shard_train_state(state, mesh: Mesh, zero1: bool = False, fsdp: bool = False,
                      tp: bool = False):
    """Place a TrainState on the mesh: params (and EMA) replicated; with
    zero1=True the optimizer moment leaves (AdamW mu/nu — 2x the params in
    f32, the largest replicated buffers in a DP run) are sharded over the
    data axis instead. With fsdp=True the params and EMA shard the same
    way too (ZeRO-3 / FSDP equivalent; implies zero1).

    The reference ships DeepSpeed configs but runs stage 0 (SURVEY §2.8;
    beyond parity). XLA's SPMD partitioner derives the collectives from
    the placement alone: sharded moments turn the update into
    reduce-scatter(grad) -> local moment math -> all-gather(update)
    (ZeRO-1); sharded params additionally all-gather each weight just
    before its first use in fwd/bwd and keep only the shard resident
    between steps (ZeRO-3), cutting params+moments memory per chip by the
    data-axis size. Sharding propagates through the jitted step, so the
    placement STAYS sharded across steps (asserted by tests/test_zero1.py
    and tests/test_fsdp.py).

    With tp=True the params, EMA, AND the AdamW moments get Megatron-style
    tensor-parallel placements over the model axis instead
    (tp_param_spec keys on trailing path segments, so moment leaves — the
    param pytree nested inside optax's state — shard identically to their
    params); GSPMD inserts the row/column-parallel all-reduces in the
    unchanged train step. Mutually exclusive with zero1/fsdp.
    """
    if tp:
        if zero1 or fsdp:
            raise ValueError("tp placement with zero1/fsdp is not supported")

        def place_tp(path, leaf):
            if not hasattr(leaf, "ndim"):
                return leaf
            return jax.device_put(
                leaf, NamedSharding(mesh, tp_param_spec(path, leaf))
            )

        return jax.tree_util.tree_map_with_path(place_tp, state)
    n_data = mesh.shape[DATA_AXIS]
    zero1 = zero1 or fsdp

    def place(leaf, shard: bool):
        if not hasattr(leaf, "ndim"):
            return leaf
        spec = zero1_spec(leaf, n_data) if shard else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    placed_opt = jax.tree.map(lambda l: place(l, zero1), state.opt_state)
    rest = jax.tree.map(
        lambda l: place(l, fsdp), state.replace(opt_state=None)
    )
    return rest.replace(opt_state=placed_opt)


SEQ_AXIS = "seq"


def make_sp_mesh(
    seq_parallel: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A (data, seq) mesh for sequence-parallel backbone runs: batch over
    `data`, the token/frame axis over `seq` (capability beyond the
    reference, which is DP-only — SURVEY §2.8; pays once clips get longer
    or resolution grows past one chip's comfort at the fixed 1568 tokens)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % seq_parallel != 0:
        raise ValueError(f"{n} devices not divisible by seq_parallel={seq_parallel}")
    arr = np.array(devices).reshape(n // seq_parallel, seq_parallel)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def seq_parallel_tokens(backbone, params, videos, mesh: Mesh,
                        deterministic: bool = True, rng=None):
    """Run a VideoViT backbone sequence-parallel over `mesh`'s seq axis.

    `backbone` must be constructed with `seq_axis=SEQ_AXIS` and
    `seq_shards=mesh.shape[SEQ_AXIS]`. The video's FRAME axis is sharded
    (token order (t, h, w) makes frame shards contiguous token shards);
    every shard runs patch embed / LN / MLP on its local tokens and
    attention gathers K/V over the axis (`nn/vit.py:Attention.seq_axis`).
    Differentiable end to end: the K/V gather's transpose is the dK/dV
    reduce-scatter. Returns the full token tensor [B, N, D] (sharded over
    seq on the mesh). Batch is additionally sharded over the data axis.

    Stochastic training (deterministic=False, requires `rng`): the rng
    streams are derived per shard so that
      * token-level dropout gets a DIFFERENT stream per (data, seq) shard —
        a shared stream would repeat the same mask on every token shard;
      * drop_path gets the SAME stream on every seq shard of a sample (the
        per-sample keep/drop decision must agree across its token shards)
        but a different stream per data shard (independent samples).
    This enables the published drop_path 0.2 recipe (docs/TRAIN.md:118)
    under SP. attn_drop stays unsupported (nn/vit.py raises — the attention
    map is distributed over shards).
    """
    from jax.experimental.shard_map import shard_map

    T = videos.shape[1]
    s = mesh.shape[SEQ_AXIS]
    tb = backbone.tubelet_size
    if T % (s * tb) != 0:
        raise ValueError(
            f"frames {T} not divisible by seq shards {s} x tubelet {tb}"
        )
    if not deterministic and rng is None:
        raise ValueError("deterministic=False requires rng")

    if deterministic:
        fn = shard_map(
            lambda p, v: backbone.apply({"params": p}, v, True),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, SEQ_AXIS)),
            out_specs=P(DATA_AXIS, SEQ_AXIS),
            check_rep=False,
        )
        return fn(params, videos)

    def body(p, v, key):
        di = jax.lax.axis_index(DATA_AXIS)
        si = jax.lax.axis_index(SEQ_AXIS)
        drop_key, dp_key = jax.random.split(key)
        rngs = {
            "dropout": jax.random.fold_in(jax.random.fold_in(drop_key, di), si),
            "drop_path": jax.random.fold_in(dp_key, di),
        }
        return backbone.apply({"params": p}, v, False, rngs=rngs)

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, SEQ_AXIS), P()),
        out_specs=P(DATA_AXIS, SEQ_AXIS),
        check_rep=False,
    )
    return fn(params, videos, rng)
