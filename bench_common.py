"""Shared helpers for the bench entry points (bench.py, bench_pipeline.py,
bench_segformer.py).

Holds the backend-availability probe and the CPU-accounting utilities so
bench_pipeline.py no longer imports one entry-point script from another
(ADVICE r4: the `from bench import _await_backend` coupling re-executed
bench.py's module-level jax config via sys.path[0] script-dir resolution).

CPU accounting is PER-PROCESS, not system-minus-idle: the bound terms in
bench_pipeline.py attribute CPU to (a) this process — /proc/self/stat
covers all its threads: decoder workers, augment, the in-process relay
client serialization — and (b) the relay tunnel's out-of-process tree,
which on this container is the port-relay (`python3 .tpu_init.py`) plus
the vsock shuttle (`/process_api`, pid 1). Measured 2026-08-20 on a
14.4 MB x 8 upload loop: self 0.89 s, process_api 0.62 s, relay 0.12 s,
sum == system busy delta 1.61 s — the three trees account for the whole
pipeline; anything else is background contention and is reported
separately as bg_busy_frac instead of silently inflating a "bound".
"""

from __future__ import annotations

import os
import sys
import time

T0 = time.perf_counter()


def mark(section: str) -> None:
    """Stderr progress stamp: when the relay is degraded a caller timeout
    (bench.py bounds each sub-bench) kills the process mid-run; the stamps
    make the truncated artifact say which section ate the budget."""
    print(f"# bench +{time.perf_counter() - T0:.1f}s {section}",
          file=sys.stderr, flush=True)


def await_backend(max_wait_s: float = 900.0):
    """The axon TPU tunnel occasionally drops for minutes at a time
    (observed 2026-08-18: >1 h outage, 'Unable to initialize backend'
    UNAVAILABLE errors). The driver runs bench.py once at round end; a
    transient flap must not turn into a missing BENCH artifact, so probe
    the backend with exponential backoff before doing real work."""
    import jax

    deadline = time.monotonic() + max_wait_s
    delay = 10.0
    while True:
        try:
            devs = jax.devices()
            # a failed TPU init can leave a cached CPU-only backend set;
            # benchmarking CPU would be a silently bogus artifact
            if all(d.platform == "cpu" for d in devs):
                raise RuntimeError("only CPU devices visible; TPU tunnel down")
            return
        except RuntimeError as e:
            if time.monotonic() > deadline:
                raise
            print(f"# backend unavailable ({e}); retrying in {delay:.0f}s",
                  flush=True)
            try:  # drop any cached failed-init state before the retry
                import jax.extend.backend as _jeb

                _jeb.clear_backends()
            except Exception:
                pass
            time.sleep(delay)
            delay = min(delay * 2, 120.0)


# --------------------------------------------------------------------------
# CPU accounting
# --------------------------------------------------------------------------

def sys_busy_s() -> float:
    """System-wide busy CPU seconds since boot (all processes).
    Diagnostic only — the bound terms use per-process accounting below."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
    except OSError:
        return 0.0
    return (sum(vals) - vals[3] - vals[4]) / 100.0  # minus idle+iowait


def pid_cpu_s(pid) -> float:
    """utime+stime of one process (all its threads), in seconds."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            # comm can contain spaces/parens; split after the closing paren
            parts = f.read().rsplit(") ", 1)[1].split()
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return 0.0


def find_relay_pids() -> list:
    """The TPU relay tunnel's process tree on this container: the port
    relay (`python3 .tpu_init.py`) and the vsock shuttle (pid 1,
    `/process_api`). Upload serialization burns CPU in both; neither is
    visible to this process's time.process_time."""
    pids = []
    try:
        with open("/proc/1/cmdline", "rb") as f:
            if b"process_api" in f.read():
                pids.append(1)
    except OSError:
        pass
    try:
        for entry in os.listdir("/proc"):
            if not entry.isdigit() or entry == "1":
                continue
            try:
                with open(f"/proc/{entry}/cmdline", "rb") as f:
                    if b".tpu_init.py" in f.read():
                        pids.append(int(entry))
            except OSError:
                continue
    except OSError:
        pass
    return pids


class CpuWindow:
    """Per-process CPU accounting over a measurement window.

    attributed = this process (+ the relay tree): the CPU the pipeline
    itself burned. bg = system busy minus attributed: everything else on
    the container (background contention), reported so the artifact can
    explain a slow window instead of folding contention into a bound."""

    def __init__(self):
        self.relay_pids = find_relay_pids()

    def snap(self) -> dict:
        return {
            "t": time.perf_counter(),
            "self": pid_cpu_s("self"),
            "relay": sum(pid_cpu_s(p) for p in self.relay_pids),
            "sys": sys_busy_s(),
        }

    @staticmethod
    def delta(a: dict, b: dict) -> dict:
        wall = b["t"] - a["t"]
        self_s = b["self"] - a["self"]
        relay_s = b["relay"] - a["relay"]
        sys_s = b["sys"] - a["sys"]
        return {
            "wall_s": wall,
            "self_s": self_s,
            "relay_s": relay_s,
            "attr_s": self_s + relay_s,
            "bg_s": max(sys_s - self_s - relay_s, 0.0),
        }

    def sample_bg_frac(self, seconds: float = 1.5) -> float:
        """Background busy-CPU fraction over a quiet sample (nothing of
        ours running): how contended the container is right now."""
        a = self.snap()
        time.sleep(seconds)
        d = self.delta(a, self.snap())
        cores = os.cpu_count() or 1
        return d["bg_s"] / d["wall_s"] / cores if d["wall_s"] > 0 else 0.0
