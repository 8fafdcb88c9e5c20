"""Profile the flagship train step and aggregate device op durations.

Captures a jax.profiler trace of the bench.py step (FAME + teacher fwd +
slot student fwd/bwd + loss + AdamW), then parses the trace proto/json and
prints a per-op-family breakdown so the "fusion tail" (VERDICT r2 weak
item 2) can be attacked with data, not guesses.

--segformer swaps FAME for the frozen MiT-B3 mask-model path (the
'--mask_model Segformer' step bench_segformer.py times; ref
engine_for_slot.py:108-118) so its 209.6 ms step gets the same
per-subsystem rollup the FAME step's roofline defense is built on
(VERDICT r3 item 5).

Usage: python scripts/profile_step.py [--steps 5] [--out /tmp/prof] [--segformer]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def run_and_trace(out_dir: str, steps: int, segformer: bool = False):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp
    import numpy as np

    from devias_tpu.aug.fame import FAMEConfig
    from devias_tpu.losses import SlotLossConfig
    from devias_tpu.nn import create_model
    from devias_tpu.train import (
        OptimConfig, TrainState, TrainStepConfig, make_optimizer,
        make_slot_train_step,
    )

    BATCH = 12
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=400, num_scene_classes=365,
        num_latents=2, agg_depth=8, agg_weights_tie=True, dtype=jnp.bfloat16,
        fused_attention=True, patch_embed_conv=False,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=365, use_mean_pooling=False,
        dtype=jnp.bfloat16, fused_attention=True, patch_embed_conv=False,
    )
    x = jnp.zeros((BATCH, 16, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)["params"]
    tparams = jax.jit(teacher.init)({"params": jax.random.PRNGKey(1)}, x)["params"]
    tx, lr_fn = make_optimizer(params, OptimConfig(lr=5e-4, total_steps=1000, warmup_steps=10))
    state = TrainState.create(params, tx)
    seg_apply = None
    if segformer:
        from devias_tpu.nn.segformer import Segformer, segformer_b3

        seg = Segformer(segformer_b3(), dtype=jnp.bfloat16)
        sparams = jax.jit(seg.init)(
            {"params": jax.random.PRNGKey(2)},
            jnp.zeros((1, 224, 224, 3), jnp.float32),
        )["params"]
        seg_apply = lambda frames: seg.apply({"params": sparams}, frames)  # noqa: E731
    step = jax.jit(
        make_slot_train_step(
            model, teacher, tx,
            SlotLossConfig(num_action_classes=400, num_scene_classes=365),
            TrainStepConfig(
                use_fame=not segformer,
                fame=FAMEConfig(beta=0.5, prob_aug=0.8),
            ),
            lr_fn, segformer_apply=seg_apply,
        ),
        donate_argnums=(0,),
    )
    rng = np.random.default_rng(0)
    batch = {
        "videos": jnp.asarray(rng.normal(size=(BATCH, 16, 224, 224, 3)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 400, size=BATCH)),
    }
    for _ in range(3):
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(0))
    jax.device_get(metrics["loss"])

    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(0))
    jax.device_get(metrics["loss"])
    jax.profiler.stop_trace()


FAMILY_RULES = [
    ("attn_kernel", re.compile(r"fused_attention|flash|attn_fwd|attn_bwd|custom-call", re.I)),
    ("fusion", re.compile(r"^(loop_)?fusion")),
    ("conv", re.compile(r"convolution|conv")),
    ("dot", re.compile(r"^dot|gemm|matmul", re.I)),
    ("copy", re.compile(r"copy|transpose|bitcast", re.I)),
    ("dynamic", re.compile(r"dynamic-(update-)?slice|gather|scatter|select", re.I)),
    ("reduce", re.compile(r"reduce")),
    ("rng", re.compile(r"rng|random", re.I)),
]


def classify(name: str) -> str:
    for fam, rx in FAMILY_RULES:
        if rx.search(name):
            return fam
    return "other"


def aggregate(out_dir: str, steps: int, top: int = 60):
    files = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        print("no trace json found under", out_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-side complete events carry 'dur' (us); keep TPU op lanes only
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e.get("pid")] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_names[(e.get("pid"), e.get("tid"))] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        if "step" in lane.lower() or "framework" in lane.lower():
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.startswith("pjit"):
            continue  # umbrella events double-count their children
        per_op[name] += e["dur"]
        per_op_n[name] += 1

    total_us = sum(per_op.values())
    print(f"trace: {path}")
    print(f"device total: {total_us/1000/steps:.2f} ms/step over {steps} steps\n")

    fam = collections.Counter()
    for name, us in per_op.items():
        fam[classify(name)] += us
    print("== per family (ms/step) ==")
    for k, us in fam.most_common():
        print(f"  {k:12s} {us/1000/steps:8.2f}")

    print("\n== top ops (ms/step, count/step) ==")
    for name, us in per_op.most_common(top):
        print(f"  {us/1000/steps:8.3f}  x{per_op_n[name]/steps:6.1f}  {name[:120]}")

    # the tail: everything below the top list, grouped by name prefix
    shown = {n for n, _ in per_op.most_common(top)}
    tail = collections.Counter()
    tail_n = collections.Counter()
    for name, us in per_op.items():
        if name in shown:
            continue
        pref = re.split(r"[.\d]", name)[0] or name
        tail[pref] += us
        tail_n[pref] += per_op_n[name]
    print(f"\n== tail (below top {top}): {sum(tail.values())/1000/steps:.2f} ms/step ==")
    for pref, us in tail.most_common(30):
        print(f"  {us/1000/steps:8.3f}  x{tail_n[pref]/steps:6.1f}  {pref}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/prof_step")
    ap.add_argument("--aggregate_only", action="store_true")
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--segformer", action="store_true",
                    help="profile the frozen-MiT-B3 mask-model step instead "
                    "of the FAME step")
    args = ap.parse_args()
    if not args.aggregate_only:
        run_and_trace(args.out, args.steps, segformer=args.segformer)
    aggregate(args.out, args.steps, args.top)
