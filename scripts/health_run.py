"""At-scale training-health probe with a slot-disentanglement assert
(VERDICT r4 item 6a): ~1.5k AdamW steps of the FLAGSHIP geometry (ViT-B
slot student, 8 tied agg rounds, Pallas kernels, bf16, FusedAdamW) at the
published recipe's stochastic configuration — FAME beta=0.5 prob=0.8 with
donor scene-label swap, cosine LR schedule with warmup, EMA — on
SYNTHETIC clips whose motion pattern defines the action label and whose
background texture defines the scene label, independently sampled.

This probes what 2-step trajectory goldens and the 200-step overfit probe
cannot: the *composed* system (FAME + Hungarian matching + schedules +
bf16 + kernels + EMA) staying healthy for thousands of steps — loss-scale
drift, slot-role collapse, EMA interactions. The disentanglement assert
is the DEVIAS thesis in miniature: after training, the ACTION slot must
predict the motion label and the SCENE slot the background label; the
cross readings (action slot -> scene label) are printed for the record.

Uses the HVU step (real scene labels, no teacher — train/step.py::
make_hvu_train_step, ref engine_for_slot_hvu.py:23-150) because synthetic
backgrounds give exact scene ground truth. All 60 clips stay
device-resident (one upload); per-step batches are gathered on device, so
the relay wire is out of the measurement.

Run: python scripts/health_run.py [--steps 2000] (the asserted tier;
--steps 60 is a wiring smoke). Measured 2026-08-21 on v5e (2000 steps,
7.7 steps/s between relay stalls): loss 6.9 -> 1.11, action-slot/motion
1.000, scene-slot/scene 1.000, BOTH cross readings 0.000, held-out
instances 0.917/1.000 — see docs/PERF.md round 5.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import jax.numpy as jnp
import numpy as np

from devias_tpu.aug.fame import FAMEConfig
from devias_tpu.losses import SlotLossConfig
from devias_tpu.nn import create_model
from devias_tpu.train import (
    OptimConfig, TrainState, TrainStepConfig, make_hvu_train_step,
    make_optimizer,
)

N_MOTION, N_SCENE = 4, 3
B = 12
RES, T = 224, 16


def make_clip(rng, motion: int, scene: int) -> np.ndarray:
    """One clip: scene = oriented grating background (texture only, no
    motion information), motion = the moving block's trajectory CLASS —
    {static, slow horizontal, fast horizontal, vertical}, with the
    direction sign randomized per instance so the class is encoded by
    speed/axis (temporal variance), not frame order. The block's
    appearance is identical across classes."""
    yy, xx = np.mgrid[0:RES, 0:RES].astype(np.float32)
    theta = [0.0, np.pi / 3, 2 * np.pi / 3][scene]
    freq = [12.0, 20.0, 31.0][scene]
    phase = rng.uniform(0, 2 * np.pi)
    bg = 0.7 * np.sin(
        2 * np.pi * freq * (xx * np.cos(theta) + yy * np.sin(theta)) / RES + phase
    )
    clip = np.empty((T, RES, RES, 3), np.float32)
    x0, y0 = rng.integers(20, RES - 60, size=2)
    sign = int(rng.integers(0, 2)) * 2 - 1
    vel = [(0, 0), (4 * sign, 0), (14 * sign, 0), (0, 9 * sign)][motion]
    for t in range(T):
        f = np.repeat(bg[:, :, None], 3, axis=2).copy()
        f += rng.normal(scale=0.05, size=f.shape).astype(np.float32)
        cx = (x0 + vel[0] * t) % (RES - 40)
        cy = (y0 + vel[1] * t) % (RES - 40)
        f[cy : cy + 40, cx : cx + 40] = 1.8
        clip[t] = f
    return clip


def make_pool(rng, n_per_combo: int):
    vids, am, sc = [], [], []
    for m in range(N_MOTION):
        for s in range(N_SCENE):
            for _ in range(n_per_combo):
                vids.append(make_clip(rng, m, s))
                am.append(m)
                sc.append(s)
    return (
        np.stack(vids),
        np.asarray(am, np.int64),
        np.asarray(sc, np.int64),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--per_combo", type=int, default=5)  # 12 combos x 5 = 60 clips
    args = ap.parse_args()

    model = create_model(
        "slot_vit_base_patch16_224", num_classes=N_MOTION,
        num_scene_classes=N_SCENE, num_latents=2, agg_depth=8,
        agg_weights_tie=True, dtype=jnp.bfloat16, fused_attention=True,
    )
    x0 = jnp.zeros((B, T, RES, RES, 3), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x0)["params"]
    tx, lr_fn = make_optimizer(params, OptimConfig(
        lr=3e-4, min_lr=1e-6, warmup_lr=1e-7,
        warmup_steps=max(args.steps // 20, 10), total_steps=args.steps,
        layer_decay=0.75, agg_block_scale=0.1,  # published recipe scales
    ))
    state = TrainState.create(params, tx, use_ema=True, ema_decay=0.999)
    step = jax.jit(
        make_hvu_train_step(
            model, tx,
            SlotLossConfig(num_action_classes=N_MOTION, num_scene_classes=N_SCENE),
            TrainStepConfig(use_fame=True, fame=FAMEConfig(beta=0.5, prob_aug=0.8)),
            lr_fn,
        ),
        donate_argnums=(0,),
    )

    rng = np.random.default_rng(0)
    print("generating pool...", flush=True)
    vids, am, sc = make_pool(rng, args.per_combo)
    N = vids.shape[0]
    d_vids = jax.device_put(jnp.asarray(vids))
    d_am, d_sc = jnp.asarray(am), jnp.asarray(sc)

    # pool passed as ARGUMENTS: a closure would bake the 578 MB pool into
    # the serialized program (the axon relay rejects oversized compile
    # requests with HTTP 413 — same rule as __graft_entry__.entry)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def sampled_step(state, vids, am_d, sc_d, key):
        idx = jax.random.choice(key, N, shape=(B,), replace=False)
        batch = {
            "videos": jnp.take(vids, idx, axis=0),
            "labels": jnp.take(am_d, idx),
            "scene_labels": jnp.take(sc_d, idx),
        }
        return step(state, batch, key)

    t0 = time.time()
    hist = []
    for s in range(args.steps):
        state, metrics = sampled_step(state, d_vids, d_am, d_sc, jax.random.PRNGKey(s))
        if s == 0:
            m0 = {k: float(v) for k, v in jax.device_get(metrics).items()}
            hist.append((0, m0))  # true initial loss for the trend assert
            t0 = time.time()
            print(f"compiled; step 0 loss {m0['loss']:.3f}; timing from step 1",
                  flush=True)
        if (s % 100 == 0 and s) or s == args.steps - 1:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            hist.append((s, m))
            print(
                f"step {s:5d} loss {m['loss']:8.3f} acc {m['class_acc']:.3f} "
                f"action {m['action_loss']:.3f} scene {m['scene_loss']:.3f} "
                f"cos {m['cosine_loss']:.4f} gnorm {m['grad_norm']:.2f} "
                f"lr {m.get('lr', 0):.2e} (+{time.time() - t0:.0f}s)",
                flush=True,
            )
            assert np.isfinite(m["loss"]), f"loss diverged at step {s}: {m}"
    wall = time.time() - t0
    print(f"train wall {wall:.0f}s post-compile ({(args.steps - 1) / wall:.2f} steps/s)")

    # ---- disentanglement probe: action slot -> motion, scene slot -> bg
    @jax.jit
    def probe(p, v):
        out = model.apply({"params": p}, v, deterministic=True)
        return out["action_logit"], out["scene_logit"]

    def accs(p, tag):
        a_hit = s_hit = a_x = s_x = 0
        for i in range(0, N, B):
            v = d_vids[i : i + B]
            al, sl = am[i : i + B], sc[i : i + B]
            a_log, s_log = jax.device_get(probe(p, v))
            a_hit += (a_log[:, :N_MOTION].argmax(-1) == al).sum()
            s_hit += (s_log[:, N_MOTION:].argmax(-1) == sl).sum()
            # cross readings: each slot probed for the OTHER factor
            a_x += (a_log[:, N_MOTION:].argmax(-1) == sl).sum()
            s_x += (s_log[:, :N_MOTION].argmax(-1) == al).sum()
        print(
            f"{tag}: action-slot/motion {a_hit / N:.3f}  "
            f"scene-slot/scene {s_hit / N:.3f}  "
            f"[cross: action-slot/scene {a_x / N:.3f}, "
            f"scene-slot/motion {s_x / N:.3f}]",
            flush=True,
        )
        return a_hit / N, s_hit / N

    a_acc, s_acc = accs(state.params, "train pool")
    accs(state.ema_params, "train pool (EMA)")

    # held-out instances of the SAME combos (fresh rng): generalization,
    # printed for the record (the hard assert is the train-pool tier)
    ho_v, ho_a, ho_s = make_pool(np.random.default_rng(1234), 1)
    a_log, s_log = jax.device_get(probe(state.params, jnp.asarray(ho_v)))
    print(
        f"held-out instances: action {np.mean(a_log[:, :N_MOTION].argmax(-1) == ho_a):.3f} "
        f"scene {np.mean(s_log[:, N_MOTION:].argmax(-1) == ho_s):.3f}",
        flush=True,
    )

    losses = [m["loss"] for _, m in hist]
    if len(losses) >= 2:
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])
    if args.steps >= 1000:
        assert a_acc >= 0.85, f"action slot failed to learn motion: {a_acc}"
        assert s_acc >= 0.85, f"scene slot failed to learn background: {s_acc}"
        ema_finite = all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree.leaves(jax.device_get(state.ema_params))
        )
        assert ema_finite
    print("HEALTH RUN OK")


if __name__ == "__main__":
    main()
