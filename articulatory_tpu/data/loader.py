"""Host-side data loader: shuffling, batching, collation, prefetch, sharding.

Replaces torch DataLoader + DistributedSampler. Each host process iterates
only its shard of the index space (``shard_id`` / ``num_shards``), the
collater produces fixed-shape numpy batches, and a background thread pool
prefetches ahead of the training loop — the TPU never waits on h5 reads.
"""

from __future__ import annotations

import concurrent.futures
import queue
import threading
from typing import Callable, Iterable, Iterator, Sequence

import numpy as np


class DataLoader:
    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 collate_fn: Callable | None = None, drop_last: bool = False,
                 batch_sampler: Iterable[list[int]] | None = None,
                 num_workers: int = 0, seed: int = 0,
                 shard_id: int = 0, num_shards: int = 1,
                 prefetch: int = 2):
        if batch_sampler is not None and num_shards > 1:
            # A sharded batch_sampler guarantees equal batch COUNTS across
            # hosts but not equal per-step SHAPES: SizeAwareSampler packs
            # variable batch sizes and 'pad' collation pads to the per-batch
            # max length, so ranks would compile different executables and
            # the first cross-host collective deadlocks. The reference never
            # combines them either (its DistributedSampler and batch_sampler
            # paths are exclusive, train.py:1609-1641).
            raise ValueError(
                "batch_sampler is not supported with num_shards > 1: "
                "variable per-batch shapes cannot be made globally uniform "
                "across hosts. Use batch_size + package_mode "
                "window/random_window for multi-host training.")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.collate_fn = collate_fn if collate_fn is not None else _default_collate
        self.drop_last = drop_last
        self.batch_sampler = batch_sampler
        self.num_workers = num_workers
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.prefetch = max(1, prefetch)
        self.epoch = 0
        self._sampler_cache: list[list[int]] | None = None
        self._sampler_cache_epoch: int | None = None

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle per epoch (DistributedSampler.set_epoch parity)."""
        self.epoch = epoch

    def _sampler_batches(self) -> list[list[int]]:
        """Materialize the sampler's batch list once per epoch.

        ``__len__`` and iteration share the cache, so neither perturbs the
        sampler (SizeAwareSampler iteration is idempotent per epoch, but
        caching also avoids re-packing on every ``len()`` call)."""
        if self._sampler_cache_epoch != self.epoch:
            if hasattr(self.batch_sampler, "set_epoch"):
                self.batch_sampler.set_epoch(self.epoch)
            self._sampler_cache = list(self.batch_sampler)
            self._sampler_cache_epoch = self.epoch
        return self._sampler_cache

    def _batches(self) -> Iterator[list[int]]:
        if self.batch_sampler is not None:
            yield from self._sampler_batches()
            return
        n = len(self.dataset)
        indices = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(indices)
        if self.num_shards > 1:
            # wrap-pad so every host sees the SAME number of batches with the
            # SAME sizes (torch DistributedSampler parity). Unequal shards
            # would deadlock multi-host SPMD: one process would enter a
            # collective step the others never reach.
            total = -(-n // self.num_shards) * self.num_shards
            if total > n:
                indices = np.concatenate([indices, indices[: total - n]])
            indices = indices[self.shard_id::self.num_shards]
        for i in range(0, len(indices), self.batch_size):
            batch = indices[i:i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                return
            yield list(batch)

    def __len__(self) -> int:
        if self.batch_sampler is not None:
            return len(self._sampler_batches())
        n = -(-len(self.dataset) // self.num_shards)  # wrap-padded shard size
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _load_batch(self, idxs: list[int]):
        return self.collate_fn([self.dataset[i] for i in idxs])

    def __iter__(self):
        if self.num_workers <= 0:
            for idxs in self._batches():
                yield self._load_batch(idxs)
            return

        # threaded prefetch: overlap h5/npy reads + collation with training
        batch_queue: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # set when the consumer abandons iteration

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    batch_queue.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            from collections import deque

            try:
                with concurrent.futures.ThreadPoolExecutor(
                        self.num_workers) as pool:
                    inflight: deque = deque()
                    for idxs in self._batches():
                        # bound in-flight work so a slow consumer doesn't make
                        # us load the whole epoch into memory
                        while len(inflight) >= self.num_workers + self.prefetch:
                            if not _put(inflight.popleft().result()):
                                return
                        if stop.is_set():
                            return
                        inflight.append(pool.submit(self._load_batch, idxs))
                    while inflight:
                        if not _put(inflight.popleft().result()):
                            return
            except BaseException as e:  # surface I/O errors to the consumer
                _put(_ProducerError(e))
                return
            _put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = batch_queue.get()
                if item is sentinel:
                    break
                if isinstance(item, _ProducerError):
                    raise item.exc
                yield item
        finally:
            # unblock and retire the producer even if the consumer stopped
            # mid-epoch (train_max_steps hit inside an epoch)
            stop.set()
            while True:  # drain so a put-in-progress can finish
                try:
                    batch_queue.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=30)


class _ProducerError:
    """Wrapper delivering a prefetch-thread exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def _default_collate(items: Sequence):
    if isinstance(items[0], np.ndarray):
        return np.stack(items)
    return items
