"""End-to-end input-pipeline benchmark: decode -> host augment -> transfer
-> train step, on real encoded mp4s (VERDICT r1 item 8; per-stage
instrumentation + steady-state window VERDICT r3 item 1; --mode eval
VERDICT r3 item 8; contemporaneous in-window bound VERDICT r4 item 1).

--mode eval benches the SERVING pipeline instead: decode -> val transform
(short-side resize + center crop, data/transforms.py::val_transform) ->
transfer -> deterministic slot-model forward with a per-batch logits fetch
(exactly what eval/protocols.py does per batch during SCUBA/HAT/val
sweeps, which are decode-bound in practice). Round 5: the val chain ships
I420 like the train chain (data/datasets.py wire_format='yuv420' now
covers val/test; halves the eval wire bytes).

Measures solo-stage rates as diagnostics and prints ONE JSON line:

  host_clips_per_sec    — decode + sample + RandAugment/crop/flip alone
                          (loader iterated, nothing sent to the device)
  augment_(no_native_)clips_per_sec — the augment stage alone over one
                          pre-decoded buffer, C++ core on/off (the
                          native-augment A/B; same-buffer staging so
                          page-cache warmth can't tilt the comparison)
  device_clips_per_sec  — the jitted train step on a preloaded batch
                          (same figure bench.py reports)
  e2e_clips_per_sec     — loader + device_prefetch + train step overlapped,
                          i.e. what a real training run sustains, measured
                          over a trimmed steady-state window that EXTENDS
                          ITSELF until the loader produced (within one
                          batch) what the window consumed — queue-drain
                          cannot inflate the figure (e2e_produced_batches
                          carries the proof)

The BOUND is computed entirely from measurements taken INSIDE the e2e
window (the round-4 bound mixed solo windows measured minutes apart; the
relay wire rate drifts 15-28 MB/s between windows, so that "bound" was
crossed in both directions — VERDICT r4 weak item 1). Terms, each of
which provably upper-bounds the e2e rate by construction:

  bound_host  = num_workers / mean(in-window per-sample __getitem__ wall)
                — each loader worker spends at most the window's wall
                producing samples, so nB/W <= workers/mean(wall)
  bound_xfer  = B / max(mean(in-window issue), mean(in-window force))
                — the issuer thread pays issue per batch, the forcer pays
                force per batch; each thread's wall per batch is at least
                its stage time
  bound_cpu   = cores / (in-window attributed CPU per clip), attributed =
                this process (all threads) + the relay tunnel's process
                tree via /proc/<pid>/stat (bench_common.CpuWindow) — NOT
                system-minus-idle, so background container load cannot
                push the bound below reality
  bound_device= solo device-step rate (stable; ~5x above e2e here, never
                binding — kept solo so the e2e window needs no extra sync)

  bound_clips_per_sec = min of the four; e2e_vs_bound = e2e / bound <= ~1
  by construction (mean-estimation noise only). A healthy overlapped
  pipeline sits at 0.85-1.0; lower means overlap is broken or two
  resources each partially bind.

Contention telemetry (VERDICT r4 item 2): bg_busy_frac_pre is the
background busy-CPU fraction sampled over ~1.5 s before the host window;
e2e_bg_busy_frac is background CPU during the e2e window. Both let the
artifact distinguish a slow pipeline from a busy container.

The reference pipeline is decord + PIL/torchvision on many dataloader
workers (ref dataset/kinetics.py, engine_for_slot.py:98-99 non_blocking
copies); here it is the C++ FFmpeg core + the cv2/numpy fast path + an
async host->device prefetcher. This container exposes ONE CPU core, so
host_clips_per_sec is a 1-worker floor — production hosts have dozens of
cores and the host path parallelizes per-sample (DataLoader threads).

Usage: python bench_pipeline.py [--batches N] [--batch_size B] [--input 224]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from bench_common import CpuWindow, await_backend, mark


def make_videos(root: str, n: int = 12, w: int = 320, h: int = 256, frames: int = 90):
    import cv2

    rng = np.random.default_rng(0)
    rows = []
    for i in range(n):
        name = f"clip{i}.mp4"
        vw = cv2.VideoWriter(
            os.path.join(root, name), cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
        )
        base = rng.integers(0, 220, (h, w, 3), np.uint8)
        for t in range(frames):
            f = base.copy()
            x = (t * 3 + i * 17) % (w - 60)
            f[h // 4 : h // 2, x : x + 40] = 255
            vw.write(f)
        vw.release()
        rows.append(f"{name} {i % 4}")
    return rows


class _TimedDataset:
    """Record (end_time, wall) of every __getitem__ so the e2e window can
    compute its in-window host term; appended from loader worker threads
    (list.append is atomic under the GIL)."""

    def __init__(self, ds):
        self.ds = ds
        self.rec = []

    def __len__(self):
        return len(self.ds)

    def set_epoch(self, epoch):
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)

    def __getitem__(self, i):
        t0 = time.perf_counter()
        out = self.ds[i]
        t1 = time.perf_counter()
        self.rec.append((t1, t1 - t0))
        return out


def _in_window(rec, t0, t1):
    return [d for (t, d) in rec if t0 <= t <= t1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--input", type=int, default=224)
    ap.add_argument("--num_workers", type=int, default=max(os.cpu_count() or 1, 1))
    ap.add_argument(
        "--device_normalize", action=argparse.BooleanOptionalAction, default=True
    )
    ap.add_argument("--inflight", type=int, default=2,
                    help="uploads kept in flight by the prefetcher")
    ap.add_argument("--debug_stages", action="store_true",
                    help="dump raw per-batch stage timings to stderr")
    ap.add_argument(
        "--wire", choices=["rgb", "yuv420"], default="yuv420",
        help="clip wire format: yuv420 ships I420 planes (half the uint8 "
        "bytes, device-side unpack; data/yuv.py) for BOTH the train and "
        "(round 5) the val/eval chain; rgb ships raw RGB bytes",
    )
    ap.add_argument(
        "--mode", choices=["train", "eval"], default="train",
        help="train: RandAugment chain + full train step; eval: val "
        "transform chain + deterministic forward with per-batch logits "
        "fetch (the serving/protocol path)",
    )
    args = ap.parse_args()
    eval_mode = args.mode == "eval"
    if args.wire == "yuv420" and not args.device_normalize:
        ap.error("--wire yuv420 requires device normalization")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    # the axon TPU tunnel occasionally drops for minutes; probe it with
    # backoff before the timed sections so a flap shows up as a delay, not
    # a hang past the caller's timeout. Probe budget is deliberately small
    # (ADVICE r4: a 240 s probe could eat the caller's whole window and
    # leave the recovered run no time to finish).
    await_backend(max_wait_s=90.0)
    import jax.numpy as jnp

    from devias_tpu.aug.fame import FAMEConfig
    from devias_tpu.data.datasets import DataConfig, build_dataset
    from devias_tpu.data.loader import DataLoader, device_prefetch
    from devias_tpu.losses import SlotLossConfig
    from devias_tpu.nn import create_model
    from devias_tpu.train import (
        OptimConfig, TrainState, TrainStepConfig, make_optimizer,
        make_slot_train_step,
    )

    B = args.batch_size
    n_clips = args.batches * B
    cores = os.cpu_count() or 1
    cpu = CpuWindow()

    import tempfile

    with tempfile.TemporaryDirectory() as root:
        # enough clips that the measured window spans ~2 epoch boundaries,
        # not 9 — boundary churn (sampler reshuffle, producer restart) is
        # real but must not dominate a steady-state figure
        mark("make_videos")
        rows = make_videos(root, n=72)
        anno = os.path.join(root, "train.csv")
        with open(anno, "w") as f:
            f.write("\n".join(rows))

        cfg = DataConfig(
            data_set="UCF101", anno_path=anno, data_prefix=root,
            num_frames=16, sampling_rate=4, input_size=args.input,
            short_side_size=args.input, nb_classes=4,
            host_normalize=not args.device_normalize,
            wire_format=args.wire,
        )
        ds0, _ = build_dataset(not eval_mode, False, cfg)
        ds = _TimedDataset(ds0)

        def fresh_loader():
            # host-side buffers kept SMALL (prefetch 2 + bridge 1): deep
            # queues fill while the consumer is slow (compile, first
            # transfers) and then serve the measured window from surplus —
            # a drained-queue window reads above the sustainable rate
            # (caught round 5 in eval mode: e2e 25 vs host production 17)
            loader = DataLoader(
                ds, batch_size=B, shuffle=True, drop_last=True,
                num_workers=args.num_workers, prefetch=2,
            )

            def forever():
                epoch = 0
                while True:
                    loader.set_epoch(epoch)
                    yield from loader
                    epoch += 1

            # epoch-crossing host prefetch: the loader's producer thread
            # dies at each epoch end and `yield from` only restarts it on
            # the next pull — without this stage, decode of epoch k+1
            # cannot overlap the transfer of epoch k's last batch (fatal
            # for the small benchmark dataset where epochs are short)
            return device_prefetch(forever(), size=1, transfer=lambda b: b)

        # container contention BEFORE anything of ours runs in the window
        bg_pre = cpu.sample_bg_frac(1.5)

        # --- host-only rate (decode + augment, nothing device-side) ---
        it = fresh_loader()
        sample = next(it)  # warm caches (file index, first decode)
        t0, c0 = time.perf_counter(), cpu.snap()
        seen = 0
        while seen < n_clips:
            b = next(it)
            seen += b["videos"].shape[0]
        host_dt = time.perf_counter() - t0
        mark("host window done")
        host_cpu_d = CpuWindow.delta(c0, cpu.snap())
        cpu_host = host_cpu_d["attr_s"] / n_clips
        # contention DURING the host window itself (bg_busy_frac_pre is a
        # sample taken before it): a below-par host figure must be
        # attributable either to the path or to a busy container
        host_bg_frac = host_cpu_d["bg_s"] / host_cpu_d["wall_s"] / cores
        host_rate = n_clips / host_dt

        # --- native-augment A/B on the AUGMENT STAGE alone (train mode;
        # the val chain doesn't use the native ops): one pre-decoded
        # buffer, timed through train_augment with the C++ core on then
        # off. Running the A/B through the full loader let page-cache
        # warmth favor whichever window ran second (observed inverting
        # the comparison); same-buffer staging isolates exactly what the
        # native core changes (VERDICT r4 item 2).
        aug_rate = aug_rate_no_native = None
        if not eval_mode:
            import random as _random

            import devias_tpu.data.native_augment as na
            from devias_tpu.data import transforms as T

            buf = ds0._load_clip(ds0.entries[0], train=True)

            def time_augment(n=24):
                rng = _random.Random(0)
                t0 = time.perf_counter()
                for _ in range(n):
                    T.train_augment(buf, args.input, rng=rng,
                                    host_normalize=False)
                return n / (time.perf_counter() - t0)

            time_augment(4)  # warm both the buffer path and the lib
            aug_rate = time_augment()
            saved = (na._LIB, na._SEARCHED)
            na._LIB, na._SEARCHED = None, True  # force the numpy/cv2 path
            try:
                time_augment(4)
                aug_rate_no_native = time_augment()
            finally:
                na._LIB, na._SEARCHED = saved
            mark("augment A/B done")
        # stop the host-window loader's threads: a live zombie producer
        # would keep burning decode CPU into the later windows' per-process
        # accounting and its getitem walls would contaminate the e2e
        # window's host-term sample set (a second concurrent worker breaks
        # the Σwall <= workers x W soundness argument)
        it.close()

        # --- model + step (flagship geometry) ---
        model = create_model(
            "slot_vit_base_patch16_224", num_classes=4, num_scene_classes=365,
            num_latents=2, agg_depth=8, agg_weights_tie=True,
            dtype=jnp.bfloat16, fused_attention=True, patch_embed_conv=False,
            input_norm=args.device_normalize,
        )
        x0 = jnp.zeros((B, 16, args.input, args.input, 3), jnp.float32)
        mark("compiling model/step")
        params = jax.jit(model.init)({"params": jax.random.PRNGKey(0)}, x0)["params"]
        if eval_mode:
            # the per-batch protocol step: deterministic forward + logits
            # fetch (eval/protocols.py accumulates logits on host per batch)
            if args.wire == "yuv420":
                from devias_tpu.data.yuv import i420_to_rgb

            @jax.jit
            def eval_fwd(p, v):
                if args.wire == "yuv420":
                    # device-side unpack of the I420 wire batch — lands in
                    # [0,1] unit range, the input_norm model's float format
                    v = i420_to_rgb(v)
                out = model.apply({"params": p}, v, deterministic=True)
                return out["action_logit"], out["scene_logit"]

            # double-buffered logits fetch, mirroring eval/protocols.py::
            # _pipelined — batch i-1's download overlaps batch i's compute
            # (distinct name: `pending` is the transfer window's local)
            inflight_out = [None]

            def run_batch(batch):
                handles = eval_fwd(params, batch["videos"])
                prev, inflight_out[0] = inflight_out[0], handles
                if prev is not None:
                    jax.device_get(prev)

            def drain():
                if inflight_out[0] is not None:
                    jax.device_get(inflight_out[0])
                    inflight_out[0] = None
        else:
            teacher = create_model(
                "vit_base_patch16_224", num_classes=365, use_mean_pooling=False,
                dtype=jnp.bfloat16, fused_attention=True, patch_embed_conv=False,
                input_norm=args.device_normalize,
            )
            tparams = jax.jit(teacher.init)({"params": jax.random.PRNGKey(1)}, x0)["params"]
            tx, lr_fn = make_optimizer(params, OptimConfig(lr=5e-4, total_steps=1000, warmup_steps=10))
            state = TrainState.create(params, tx)
            step = jax.jit(
                make_slot_train_step(
                    model, teacher, tx,
                    SlotLossConfig(num_action_classes=4, num_scene_classes=365),
                    TrainStepConfig(
                        use_fame=True, fame=FAMEConfig(beta=0.5, prob_aug=0.8),
                        device_normalize=args.device_normalize,
                        wire_format=args.wire,
                    ),
                    lr_fn,
                ),
                donate_argnums=(0,),
            )
            metrics = None

            def run_batch(batch):
                nonlocal state, metrics
                state, metrics = step(state, tparams, batch, jax.random.PRNGKey(0))

            def drain():
                jax.device_get(metrics["loss"])

        # --- device-only rate (preloaded synthetic batch) ---
        rng = np.random.default_rng(0)
        if args.wire == "yuv420":
            vids = rng.integers(
                0, 255, size=(B, 16, args.input * 3 // 2, args.input)
            ).astype(np.uint8)
        elif args.device_normalize:
            vids = rng.integers(0, 255, size=(B, 16, args.input, args.input, 3)).astype(np.uint8)
        else:
            vids = rng.normal(size=(B, 16, args.input, args.input, 3)).astype(np.float32)
        pre = {"videos": jnp.asarray(vids), "labels": jnp.asarray(rng.integers(0, 4, size=B))}
        for _ in range(3):
            run_batch(pre)
        drain()
        t0 = time.perf_counter()
        for _ in range(args.batches):
            run_batch(pre)
        drain()
        dev_rate = n_clips / (time.perf_counter() - t0)
        mark("device window done")

        # --- transfer-only rate (solo diagnostic; the BOUND uses the
        # in-window stage times below — solo windows go stale under relay
        # drift) ---
        from devias_tpu.data.loader import make_default_transfer

        issue0, force0 = make_default_transfer(None)
        host_batch = {k: np.asarray(v) for k, v in sample.items()
                      if hasattr(v, "shape")}
        force0(issue0(host_batch))  # warm
        n_xfer = 6
        t0, c0 = time.perf_counter(), cpu.snap()
        pending = []
        for _ in range(n_xfer):
            pending.append(issue0(host_batch))
            if len(pending) >= args.inflight:
                force0(pending.pop(0))
        while pending:
            force0(pending.pop(0))
        solo_xfer_rate = n_xfer * B / (time.perf_counter() - t0)
        mark("transfer window done")
        cpu_xfer = CpuWindow.delta(c0, cpu.snap())["attr_s"] / (n_xfer * B)

        # --- end-to-end: loader -> prefetch -> step, instrumented.
        # issue/force record (end_time, wall) so the bound can use only
        # in-window samples; bytes recorded separately.
        stats = {k: [] for k in
                 ("host_wait", "issue", "force", "bytes", "consumer_wait",
                  "dispatch")}

        def timed_issue(b):
            stats["bytes"].append(
                sum(v.nbytes for v in b.values() if hasattr(v, "nbytes"))
            )
            t0 = time.perf_counter()
            out = issue0(b)
            t1 = time.perf_counter()
            stats["issue"].append((t1, t1 - t0))
            return out

        def timed_force(out):
            t0 = time.perf_counter()
            out = force0(out)
            t1 = time.perf_counter()
            stats["force"].append((t1, t1 - t0))
            return out

        def timed_host(it):
            # wait seen by the transfer thread pulling from the loader
            while True:
                t0 = time.perf_counter()
                try:
                    b = next(it)
                except StopIteration:
                    return
                stats["host_wait"].append(time.perf_counter() - t0)
                yield b

        it = device_prefetch(
            timed_host(fresh_loader()), size=2,
            transfer=(timed_issue, timed_force), inflight=args.inflight,
        )
        first = next(it)  # exclude first-decode warmup from the timed window
        run_batch(first)
        # steady-state window: run n_trim + n_meas batches, drop the first
        # n_trim (they drain pre-filled prefetch queues — loader prefetch +
        # bridge + pending uploads + consumer queue — and would inflate
        # the rate past the host production rate), then EXTEND the window
        # until it is production-balanced: consumption is only a
        # sustainable rate if the loader produced (within one batch) what
        # the window consumed — otherwise the figure is part queue-drain
        # (caught twice in round 5: decode caches make in-window production
        # faster than the cold solo window, so drain hides easily).
        n_trim = 8
        n_meas = max(args.batches, 8)
        n_cap = n_meas + 24  # keep a degraded relay inside the time budget
        ts = []
        w_c0 = cpu.snap()  # re-captured at the window start below

        def produced_since(t_from):
            return sum(1 for (t, _) in ds.rec if t >= t_from) / B

        i = 0
        w_start = None
        while True:
            t0 = time.perf_counter()
            batch = next(it)
            wait = time.perf_counter() - t0
            t0 = time.perf_counter()
            run_batch(batch)
            disp = time.perf_counter() - t0
            if i >= n_trim:
                stats["consumer_wait"].append(wait)
                stats["dispatch"].append(disp)
            ts.append(time.perf_counter())
            if i == n_trim - 1:
                w_c0 = cpu.snap()
                w_start = ts[-1]
            consumed = i + 1 - n_trim
            if consumed >= n_meas and (
                consumed >= n_cap
                or produced_since(w_start) >= consumed - 1
            ):
                break
            i += 1
        n_meas = consumed
        drain()  # drain the last dispatched train step (eval fetches inline)
        w_end = time.perf_counter()
        mark("e2e window done")
        w_cpu = CpuWindow.delta(w_c0, cpu.snap())
        e2e_wall = w_end - w_start
        e2e_rate = n_meas * B / e2e_wall
        produced_batches = produced_since(w_start)
        it.close()  # join the transfer thread before interpreter teardown

    if args.debug_stages:
        import sys

        for k, v in stats.items():
            vals = [x[1] if isinstance(x, tuple) else x for x in v]
            print(f"# {k}: {[round(float(x), 3) for x in vals]}", file=sys.stderr)
        iv = [round(float(b - a), 3) for a, b in zip(ts, ts[1:])]
        print(f"# batch intervals: {iv}", file=sys.stderr)

    med = lambda v: round(float(np.median(v)), 4) if v else None
    mean = lambda v: float(np.mean(v)) if v else 0.0

    # ---- in-window bound terms (see module docstring for soundness) ----
    issue_w = _in_window(stats["issue"], w_start, w_end)
    force_w = _in_window(stats["force"], w_start, w_end)
    host_w = _in_window(ds.rec, w_start, w_end)
    # the Σwall <= workers x W argument needs walls contained in the
    # window; drop samples whose decode started before it (fall back to
    # end-in-window if that empties the list)
    host_w_strict = [d for (t, d) in ds.rec
                     if w_start <= t <= w_end and t - d >= w_start]
    bound_host = (
        args.num_workers / mean(host_w_strict or host_w)
        if host_w else float("inf")
    )
    xfer_stage = max(mean(issue_w), mean(force_w))
    bound_xfer = B / xfer_stage if xfer_stage > 0 else float("inf")
    cpu_per_clip = w_cpu["attr_s"] / (n_meas * B)
    bound_cpu = cores / cpu_per_clip if cpu_per_clip > 0 else float("inf")
    terms = {
        "host": bound_host, "transfer": bound_xfer,
        "cpu": bound_cpu, "device": dev_rate,
    }
    binding = min(terms, key=terms.get)
    bound = terms[binding]

    issue_durs = [d for (_, d) in stats["issue"]]
    force_durs = [d for (_, d) in stats["force"]]
    xfer_s = [a + b for a, b in zip(issue_durs, force_durs)]
    print(
        json.dumps(
            {
                "metric": "devias_pipeline_throughput" if not eval_mode
                else "devias_eval_pipeline_throughput",
                "mode": args.mode,
                "value": round(e2e_rate, 2),
                "unit": "clips/sec/chip",
                # solo diagnostics
                "host_clips_per_sec": round(host_rate, 2),
                "augment_clips_per_sec": round(aug_rate, 2)
                if aug_rate else None,
                "augment_no_native_clips_per_sec": round(aug_rate_no_native, 2)
                if aug_rate_no_native else None,
                "device_clips_per_sec": round(dev_rate, 2),
                "transfer_clips_per_sec": round(solo_xfer_rate, 2),
                "cpu_host_s_per_clip": round(cpu_host, 4),
                "cpu_transfer_s_per_clip": round(cpu_xfer, 4),
                # e2e + contemporaneous bound
                "e2e_clips_per_sec": round(e2e_rate, 2),
                "bound_clips_per_sec": round(bound, 2),
                "e2e_vs_bound": round(e2e_rate / bound, 3),
                "bound_binding": binding,
                "bound_host_clips_per_sec": round(bound_host, 2)
                if np.isfinite(bound_host) else None,
                "bound_transfer_clips_per_sec": round(bound_xfer, 2)
                if np.isfinite(bound_xfer) else None,
                "bound_cpu_clips_per_sec": round(bound_cpu, 2)
                if np.isfinite(bound_cpu) else None,
                # contention telemetry
                "bg_busy_frac_pre": round(bg_pre, 3),
                "host_bg_busy_frac": round(host_bg_frac, 3),
                "e2e_bg_busy_frac": round(
                    w_cpu["bg_s"] / w_cpu["wall_s"] / cores, 3),
                "e2e_attr_cpu_frac": round(
                    w_cpu["attr_s"] / w_cpu["wall_s"] / cores, 3),
                # per-stage medians (diagnostic)
                "stage_host_wait_s": med(stats["host_wait"]),
                "stage_issue_s": med(issue_durs),
                "stage_force_s": med(force_durs),
                "stage_transfer_MBps": round(
                    float(np.median(stats["bytes"]) / 1e6 / np.median(xfer_s)), 1
                ) if xfer_s else None,
                "stage_consumer_wait_s": med(stats["consumer_wait"]),
                "stage_dispatch_s": med(stats["dispatch"]),
                "batch_bytes_mb": round(float(np.median(stats["bytes"])) / 1e6, 2)
                if stats["bytes"] else None,
                "measured_batches": n_meas,
                # production-balance proof: clips the loader PRODUCED
                # inside the window / B. ~= measured_batches means the
                # window consumed what it produced (steady state); much
                # lower means queue drain inflated e2e (the window above
                # extends itself until balanced or capped)
                "e2e_produced_batches": round(produced_batches, 1),
                "inflight": args.inflight,
                "num_workers": args.num_workers,
                "host_cores": cores,
                "wire": args.wire,
            }
        )
    )


if __name__ == "__main__":
    main()
