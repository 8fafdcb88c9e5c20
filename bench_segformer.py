"""Segformer mask-model path benchmark (VERDICT r2 item 5).

Times the '--mask_model Segformer' flagship step at the reference's b3
geometry (ref engine_for_slot.py:108-118: frozen MiT-B3 over every 2nd
frame -> person masks -> background mix -> slot step) on one chip, next to
the FAME step for comparison. Prints ONE JSON line.

The frozen Segformer runs with RANDOM weights here (no checkpoint in the
container) — identical compute/time to real weights.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--variant", default="b3", choices=["b0", "b3"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    import jax.numpy as jnp

    from devias_tpu.aug.fame import FAMEConfig
    from devias_tpu.losses import SlotLossConfig
    from devias_tpu.nn import create_model
    from devias_tpu.nn.segformer import Segformer, segformer_b0, segformer_b3
    from devias_tpu.train import (
        OptimConfig, TrainState, TrainStepConfig, make_optimizer,
        make_slot_train_step,
    )

    B = args.batch_size
    model = create_model(
        "slot_vit_base_patch16_224", num_classes=400, num_scene_classes=365,
        num_latents=2, agg_depth=8, agg_weights_tie=True, dtype=jnp.bfloat16,
        fused_attention=True, patch_embed_conv=False,
    )
    teacher = create_model(
        "vit_base_patch16_224", num_classes=365, use_mean_pooling=False,
        dtype=jnp.bfloat16, fused_attention=True, patch_embed_conv=False,
    )
    seg_cfg = {"b0": segformer_b0, "b3": segformer_b3}[args.variant]()
    seg = Segformer(seg_cfg, dtype=jnp.bfloat16)

    x = jnp.zeros((B, 16, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)["params"]
    tparams = jax.jit(teacher.init)({"params": jax.random.PRNGKey(1)}, x)["params"]
    sparams = jax.jit(seg.init)(
        {"params": jax.random.PRNGKey(2)}, jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    seg_apply = lambda frames: seg.apply({"params": sparams}, frames)  # noqa: E731

    tx, lr_fn = make_optimizer(params, OptimConfig(lr=5e-4, total_steps=1000, warmup_steps=10))
    state = TrainState.create(params, tx)
    step = jax.jit(
        make_slot_train_step(
            model, teacher, tx,
            SlotLossConfig(num_action_classes=400, num_scene_classes=365),
            TrainStepConfig(use_fame=False, fame=FAMEConfig(prob_aug=0.8)),
            lr_fn, segformer_apply=seg_apply,
        ),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    batch = {
        "videos": jnp.asarray(rng.normal(size=(B, 16, 224, 224, 3)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 400, size=B)),
    }
    for _ in range(2):
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(0))
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(0))
    jax.device_get(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "metric": "devias_segformer_step_throughput",
        "value": round(B / dt, 2),
        "unit": "clips/sec/chip",
        "ms_per_step": round(dt * 1000, 1),
        "variant": args.variant,
    }))


if __name__ == "__main__":
    main()
