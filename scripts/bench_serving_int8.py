"""A/B: deterministic eval-protocol slot forward, bf16 vs opt-in w8a8 int8.

The in-step int8 teacher was measured throughput-NEUTRAL (docs/PERF.md:
the per-step dynamic-quant VPU passes + broken mega-fusions cancel the 2x
MXU rate at ViT-B geometry). Serving is the remaining candidate: the
SCUBA/HAT/val protocol forward (ref engine_for_slot.py:217-307) is pure
frozen inference, so this script measures the same eval_fwd bench.py times
(bf16) against the int8_dense student on one chip and prints both rates.

NOTE (relay methodology, docs/PERF.md): iterations form a data-dependent
chain; independent dispatches over the axon relay time the RPC, not the
device.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from devias_tpu.nn import create_model

BATCH = 12
N_STEPS = 40


def measure(int8: bool) -> float:
    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=400, num_scene_classes=365, num_latents=2,
        agg_depth=8, agg_weights_tie=True, dtype=jnp.bfloat16,
        fused_attention=True, patch_embed_mode="patchify",
        int8_dense=int8,
    )
    x = jnp.zeros((BATCH, 16, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)["params"]

    @jax.jit
    def eval_fwd(p, v):
        out = model.apply({"params": p}, v, deterministic=True)
        return out["action_logit"], out["scene_logit"]

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(BATCH, 16, 224, 224, 3)).astype(np.float32))
    # dependent chain: feed a scalar derived from the previous output back
    # into the input so dispatch overlaps compute (see docs/PERF.md). The
    # coupling goes through optimization_barrier so no XLA simplification
    # (e.g. folding the former `carry * 0.0` trick) can sever it and turn
    # this into timing the relay RPC.
    @jax.jit
    def chained(p, v, carry):
        v, carry = jax.lax.optimization_barrier((v, carry))
        a, s = eval_fwd(p, v)
        return a, s, jnp.mean(a).astype(jnp.float32)

    carry = jnp.float32(0)
    for _ in range(3):
        a, s, carry = chained(params, v, carry)
    jax.device_get(carry)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        a, s, carry = chained(params, v, carry)
    jax.device_get(carry)
    dt = time.perf_counter() - t0
    return BATCH * N_STEPS / dt


if __name__ == "__main__":
    bf16 = measure(False)
    i8 = measure(True)
    # interleave a second pair to bound session noise
    bf16b = measure(False)
    i8b = measure(True)
    print(
        json.dumps(
            {
                "metric": "devias_serving_int8_ab",
                "unit": "clips/sec/chip",
                "batch": BATCH,
                "steps_per_window": N_STEPS,
                "bf16_clips_per_sec": [round(bf16, 1), round(bf16b, 1)],
                "int8_clips_per_sec": [round(i8, 1), round(i8b, 1)],
                "bf16_mean": round((bf16 + bf16b) / 2, 1),
                "int8_mean": round((i8 + i8b) / 2, 1),
                "speedup": round((i8 + i8b) / (bf16 + bf16b), 4),
            }
        )
    )
