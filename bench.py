"""Benchmark: DEVIAS slot-training throughput (clips/sec/chip) on one TPU.

Measures the full flagship training step — ViT-B/16 student fwd+bwd with
slot aggregation + Hungarian matching loss + FAME on-device augmentation +
frozen ViT-B scene-teacher forward + AdamW update — at the reference's
per-GPU batch size (12 clips, docs/TRAIN.md:20) in bfloat16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline compares against an A100 estimate for the same step: the
reference repo publishes no numbers (BASELINE.md). Derivation of the
estimate: DEVIAS slot training moves ~1.68 TFLOP/clip (student ViT-B
fwd+bwd 3 x 0.42 TF + frozen teacher fwd 0.42 TF at 1568 tokens); an
A100 at 312 TFLOPS bf16/fp16 and a typical 25-30%% MFU for torch video
ViT training sustains ~78-94 TFLOP/s -> 46-56 clips/s. We use 50.
"""

import json
import os
import subprocess
import sys
import time

_T_START = time.perf_counter()

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from bench_common import await_backend as _await_backend

A100_CLIPS_PER_SEC_ESTIMATE = 50.0
BATCH = int(os.environ.get("BENCH_BATCH", "12"))  # reference per-GPU batch (docs/TRAIN.md:20)
# BENCH_EMBED: patch-embed lowering A/B — 'patchify' (default) | 'dot' | 'conv'
EMBED = os.environ.get("BENCH_EMBED", "patchify")

# Model FLOPs per clip for MFU reporting: student ViT-B fwd at 1568 tokens
# = 12 x (24*N*d^2 + 4*N^2*d) + patch embed ~= 0.361 TF; backward ~= 2x fwd;
# frozen teacher fwd (1569 tokens) ~= 0.361 TF; agg block (8 tied rounds,
# 4x512 heads over 1568 keys) + heads + FAME + loss ~= 0.02 TF.
FLOPS_PER_CLIP = 3 * 0.361e12 + 0.361e12 + 0.02e12  # ~1.464 TF
V5E_PEAK_FLOPS = 197e12  # bf16


def _run_sub(script: str, extra_args, timeout_s: float):
    """Run a sub-benchmark script, return its last JSON line (or None).
    On timeout, surface the child's stderr tail — it carries the
    bench_common.mark() progress stamps that say which section ate the
    budget (ADVICE r4: TimeoutExpired silently discarded them)."""
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)), script)]
    cmd += list(extra_args)
    try:
        out = subprocess.run(cmd, timeout=timeout_s, capture_output=True,
                             text=True)
    except subprocess.TimeoutExpired as exc:
        tail = (exc.stderr or b"")
        if isinstance(tail, bytes):
            tail = tail.decode(errors="replace")
        for line in tail.strip().splitlines()[-6:]:
            print(f"# {script} timeout; child stderr: {line}",
                  file=sys.stderr, flush=True)
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    return None


def main():
    _await_backend()
    from devias_tpu.aug.fame import FAMEConfig
    from devias_tpu.losses import SlotLossConfig
    from devias_tpu.nn import create_model
    from devias_tpu.train import (
        OptimConfig,
        TrainState,
        TrainStepConfig,
        make_optimizer,
        make_slot_train_step,
    )

    model = create_model(
        "slot_vit_base_patch16_224",
        num_classes=400, num_scene_classes=365, num_latents=2,
        agg_depth=8, agg_weights_tie=True, dtype=jnp.bfloat16,
        fused_attention=True, patch_embed_mode=EMBED,
    )
    # BENCH_TEACHER_INT8=1: the opt-in w8a8 teacher (nn/quant.py) — reported
    # as a separate A/B, never the headline (it perturbs teacher logits)
    teacher = create_model(
        "vit_base_patch16_224", num_classes=365, use_mean_pooling=False,
        dtype=jnp.bfloat16, fused_attention=True, patch_embed_mode=EMBED,
        int8_dense=bool(os.environ.get("BENCH_TEACHER_INT8")),
    )

    x = jnp.zeros((BATCH, 16, 224, 224, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x)["params"]
    tparams = jax.jit(teacher.init)({"params": jax.random.PRNGKey(1)}, x)["params"]

    cfg = OptimConfig(lr=5e-4, total_steps=1000, warmup_steps=10)
    tx, lr_fn = make_optimizer(params, cfg)
    state = TrainState.create(params, tx)
    loss_cfg = SlotLossConfig(num_action_classes=400, num_scene_classes=365)
    step_cfg = TrainStepConfig(
        use_fame=True, fame=FAMEConfig(beta=0.5, prob_aug=0.8)
    )
    step = jax.jit(
        make_slot_train_step(model, teacher, tx, loss_cfg, step_cfg, lr_fn),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    batch = {
        "videos": jnp.asarray(
            rng.normal(size=(BATCH, 16, 224, 224, 3)).astype(np.float32)
        ),
        "labels": jnp.asarray(rng.integers(0, 400, size=BATCH)),
    }

    # warmup (compile) + 2 steps. NOTE: on the axon TPU relay,
    # block_until_ready does not reliably await remote completion —
    # device_get (a real value fetch) is the only trustworthy sync.
    for _ in range(3):
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(0))
    jax.device_get(metrics["loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, tparams, batch, jax.random.PRNGKey(0))
    jax.device_get(metrics["loss"])
    dt = time.perf_counter() - t0

    clips_per_sec = BATCH * n_steps / dt
    result = {
        "metric": "devias_slot_train_throughput",
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / A100_CLIPS_PER_SEC_ESTIMATE, 3),
        "ms_per_step": round(dt / n_steps * 1000, 1),
        "mfu": round(clips_per_sec * FLOPS_PER_CLIP / V5E_PEAK_FLOPS, 3),
    }
    # progressive artifact: print the line NOW and again after each
    # enrichment below — the driver parses the LAST JSON line, so a
    # driver-side kill during a sub-bench still leaves a valid (if less
    # enriched) artifact instead of none
    print(json.dumps(result), flush=True)
    # best-effort inference/serving figure: the deterministic slot-model
    # forward (the SCUBA/HAT/val protocol step, eval/protocols.py) on the
    # same chip. Guarded so it can never sink the headline metric.
    try:
        if os.environ.get("BENCH_SKIP_EVAL"):
            raise RuntimeError("skipped")
        # stay inside the driver window: the eval graph compiles fresh on a
        # cold cache (~1-2 min over the relay); skip rather than risk the
        # headline line
        if time.perf_counter() - _T_START > 300:
            raise RuntimeError("over time budget")

        @jax.jit
        def eval_fwd(p, v):
            out = model.apply({"params": p}, v, deterministic=True)
            return out["action_logit"], out["scene_logit"]

        ev = jax.device_get(eval_fwd(state.params, batch["videos"]))
        t0 = time.perf_counter()
        for _ in range(n_steps):
            ev = eval_fwd(state.params, batch["videos"])
        jax.device_get(ev[0])
        dt_e = time.perf_counter() - t0
        result["eval_clips_per_sec"] = round(BATCH * n_steps / dt_e, 2)
    except Exception:
        pass
    print(json.dumps(result), flush=True)
    # best-effort end-to-end pipeline figure (decode -> host augment ->
    # prefetch -> step on real mp4s; see bench_pipeline.py). Never allowed
    # to sink the headline metric.
    _PIPE_FIELDS = (
        "host_clips_per_sec", "augment_clips_per_sec",
        "augment_no_native_clips_per_sec",
        "e2e_clips_per_sec", "e2e_vs_bound", "bound_clips_per_sec",
        "bound_binding", "bound_host_clips_per_sec",
        "bound_transfer_clips_per_sec", "bound_cpu_clips_per_sec",
        "transfer_clips_per_sec", "bg_busy_frac_pre", "host_bg_busy_frac",
        "e2e_bg_busy_frac",
        "e2e_attr_cpu_frac", "stage_transfer_MBps", "batch_bytes_mb",
        "e2e_produced_batches", "measured_batches", "host_cores", "wire",
    )
    try:
        if os.environ.get("BENCH_SKIP_PIPELINE"):
            raise RuntimeError("skipped")
        # a degraded relay can stall one attempt past any reasonable
        # timeout (observed: 42 s of CPU in 500 s of wall); retry once
        # with a smaller window — but only while the eval-pipeline bench
        # below still has room inside its 480 s gate (ADVICE r4: an
        # unconditional retry silently starved it)
        pipe = _run_sub("bench_pipeline.py", ["--batches", "3"], 330)
        if pipe is None and time.perf_counter() - _T_START < 350:
            pipe = _run_sub("bench_pipeline.py", ["--batches", "2"], 300)
        if pipe is not None:
            for k in _PIPE_FIELDS:
                if pipe.get(k) is not None:
                    result[k] = pipe[k]
    except Exception:
        pass
    print(json.dumps(result), flush=True)
    # best-effort SERVING pipeline figure (decode -> val transform ->
    # I420 wire -> deterministic forward with per-batch logits fetch: the
    # SCUBA/HAT/val protocol loop — bench_pipeline.py --mode eval;
    # VERDICT r3 item 8, r4 item 3 adds the YUV wire + bound fields).
    try:
        if os.environ.get("BENCH_SKIP_PIPELINE"):
            raise RuntimeError("skipped")
        if time.perf_counter() - _T_START > 480:
            raise RuntimeError("over time budget")
        pipe = _run_sub("bench_pipeline.py", ["--mode", "eval", "--batches", "3"], 330)
        if pipe is not None:
            for k in _PIPE_FIELDS:
                if pipe.get(k) is not None:
                    result["eval_" + k] = pipe[k]
    except Exception:
        pass
    print(json.dumps(result), flush=True)
    # late retry for the TRAIN pipeline figures: a relay-degradation
    # episode during the first attempts (observed: compile stuck >300 s,
    # then healthy minutes later) should not cost the artifact its train
    # e2e/bound fields when the budget still has room
    try:
        if os.environ.get("BENCH_SKIP_PIPELINE"):
            raise RuntimeError("skipped")
        if "e2e_clips_per_sec" not in result and time.perf_counter() - _T_START < 650:
            pipe = _run_sub("bench_pipeline.py", ["--batches", "3"], 330)
            if pipe is not None:
                for k in _PIPE_FIELDS:
                    if pipe.get(k) is not None:
                        result[k] = pipe[k]
    except Exception:
        pass
    print(json.dumps(result), flush=True)
    # best-effort Segformer mask-path step figure (bench_segformer.py) so
    # the Segformer optimization claim lives in a driver-captured artifact
    # (VERDICT r4 item 8). Runs last; skipped when the budget is spent.
    try:
        if os.environ.get("BENCH_SKIP_PIPELINE"):
            raise RuntimeError("skipped")
        if time.perf_counter() - _T_START > 700:
            raise RuntimeError("over time budget")
        seg = _run_sub("bench_segformer.py", [], 240)
        if seg is not None:
            result["segformer_clips_per_sec"] = seg.get("value")
            result["segformer_ms_per_step"] = seg.get("ms_per_step")
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
