"""Worker for tests/test_multihost.py: one JAX process of a 2-process CPU
'cluster' (4 virtual devices each -> 8 global). Exercises the REAL
multi-host path end to end:

  maybe_init_distributed (env launcher) -> global (data,) mesh ->
  per-host loader shard -> device_prefetch assembling global arrays ->
  jitted DP train steps (gradient psum over the global mesh) ->
  cross-host metric sync -> per-host final_test result files.

Writes '<outdir>/summary_<rank>.json' with the final loss and param
checksum so the parent test can assert both hosts agree and that the run
matches a single-process reference run.

Usage: python _multihost_worker.py <proc_id> <nprocs> <port> <outdir>
"""

import json
import os
import sys

proc_id, nprocs, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
eval_n = int(sys.argv[5]) if len(sys.argv) > 5 else 32

# 8 global devices regardless of process count (2 procs x 4, 4 procs x 2)
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={8 // nprocs}"
os.environ["DEVIAS_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["DEVIAS_TPU_NUM_PROCS"] = str(nprocs)
os.environ["DEVIAS_TPU_PROC_ID"] = str(proc_id)

import jax

jax.config.update("jax_platforms", "cpu")

from devias_tpu.core.dist import make_mesh, maybe_init_distributed

maybe_init_distributed()
assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 8

import jax.numpy as jnp
import numpy as np
import optax

from devias_tpu.data.loader import DataLoader, device_prefetch
from devias_tpu.eval import final_test
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import TrainState, TrainStepConfig, make_slot_train_step
from devias_tpu.utils import MetricLogger
from jax.sharding import NamedSharding, PartitionSpec as P


class SyntheticDataset:
    """Deterministic per-index tiny clips (same content on every host)."""

    def __init__(self, n, t=4, hw=32):
        self.n, self.t, self.hw = n, t, hw

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return {
            "videos": rng.normal(size=(self.t, self.hw, self.hw, 3)).astype(np.float32) * 0.3,
            "labels": np.int64(i % 5),
            "video_id": f"v{i:03d}",
            "chunk": np.int64(0),
            "split": np.int64(0),
        }


GLOBAL_BATCH = 8
N = 32
model = create_model(
    "slot_vit_base_patch16_224", num_classes=5, num_scene_classes=3,
    num_latents=2, agg_depth=2, depth=2, embed_dim=64, num_heads=4,
)
teacher = create_model(
    "vit_base_patch16_224", num_classes=3, depth=2, embed_dim=64, num_heads=4,
)
x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
params = model.init({"params": jax.random.PRNGKey(0)}, x0)["params"]
tparams = teacher.init({"params": jax.random.PRNGKey(1)}, x0)["params"]

mesh = make_mesh()
tx = optax.adamw(1e-3)
state = TrainState.create(params=params, tx=tx)
step = jax.jit(make_slot_train_step(
    model, teacher, tx, SlotLossConfig(num_action_classes=5, num_scene_classes=3),
    TrainStepConfig(use_fame=False),
))

repl = NamedSharding(mesh, P())
data_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
state = jax.tree.map(lambda a: jax.device_put(a, repl), state)
tparams = jax.tree.map(lambda a: jax.device_put(a, repl), tparams)

ds = SyntheticDataset(N)
loader = DataLoader(
    ds, batch_size=GLOBAL_BATCH // nprocs, shuffle=True, drop_last=True,
    num_workers=0, seed=0, shard=proc_id, num_shards=nprocs,
)
loader.set_epoch(0)

meters = MetricLogger()
rng = jax.random.PRNGKey(42)
batches = ({"videos": b["videos"], "labels": b["labels"]} for b in loader)
n_steps = 0
for dev_batch in device_prefetch(batches, size=2, sharding=data_sh):
    state, metrics = step(state, tparams, dev_batch, rng)
    meters.update(**{k: float(v) for k, v in jax.device_get(metrics).items()})
    n_steps += 1
meters.synchronize_between_processes()

# distributed eval: per-host result files (ref engine final_test + merge).
# eval_n != train N exercises UNEVEN contiguous shards (e.g. 30 over 4
# hosts -> 8,8,7,7), the reference's dist_eval padding caveat
# (ref run_slot_finetuning.py:283-291)
eds = SyntheticDataset(eval_n)
eval_loader = DataLoader(
    eds, batch_size=4, shuffle=False, drop_last=False, num_workers=0,
    shard=proc_id, num_shards=nprocs, pad_shards=False,
)


@jax.jit
def fwd(p, videos):
    return model.apply({"params": p}, videos, deterministic=True)["action_logit"][:, :5]


final_test(eval_loader, lambda v: fwd(state.params, v), 4, outdir, rank=proc_id)

# multi-host kNN feature-bank assembly: padded equal shards over an ODD
# dataset size (unpadded shards would be ragged), rows scattered back into
# dataset-index order with padding duplicates collapsing (the reference's
# index_copy_ semantics, ref run_knn.py:100-120)
from devias_tpu.data.loader import shard_indices
from devias_tpu.eval.knn import gather_features_across_hosts

NK = eval_n - 1  # odd vs the padded shard grid -> wrapped duplicate rows
kds = SyntheticDataset(NK)
kloader = DataLoader(
    kds, batch_size=4, shuffle=False, drop_last=False, num_workers=0,
    shard=proc_id, num_shards=nprocs, pad_shards=True,
)
feats, labs = [], []
for b in kloader:
    feats.append(b["videos"].mean(axis=(1, 2, 3)))
    labs.append(b["labels"])
feats, labs = np.concatenate(feats), np.concatenate(labs)
idx = shard_indices(NK, proc_id, nprocs, False, 0, 0, True)
assert len(idx) == len(feats), (len(idx), len(feats))
bank_f, bank_l = gather_features_across_hosts(
    feats, labs, n_total=NK, local_indices=idx
)
exp = np.stack([kds[i]["videos"].mean(axis=(0, 1, 2)) for i in range(NK)])
knn_bank_ok = bool(
    np.allclose(bank_f, exp, atol=1e-6) and (bank_l == np.arange(NK) % 5).all()
)

checksum = float(
    sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) for l in jax.tree.leaves(jax.device_get(state.params)))
)
with open(os.path.join(outdir, f"summary_{proc_id}.json"), "w") as f:
    json.dump(
        {
            "rank": proc_id,
            "n_steps": n_steps,
            "loss_global_avg": meters.meters["loss"].global_avg,
            "param_checksum": checksum,
            "world": jax.process_count(),
            "knn_bank_ok": knn_bank_ok,
        },
        f,
    )
print("worker", proc_id, "done")
