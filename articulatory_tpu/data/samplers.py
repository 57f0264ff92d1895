"""Batch samplers (reference: articulatory/samplers/pytorch_samplers.py)."""

from __future__ import annotations

import logging
import random
from typing import Iterator, Sequence


class SizeAwareSampler:
    """Packs variable-length utterances into batches up to ``max_len`` total
    samples; drops the last partial batch (matches the reference).

    Iteration is idempotent: the shuffle is derived from ``(seed, epoch)``
    rather than a persistent RNG, so repeated ``__iter__`` calls (e.g. a
    ``len()`` probe on the owning DataLoader) return the identical packing
    until ``set_epoch`` advances it. In multi-host runs identical sampler
    output across ranks is load-bearing — a stateful RNG would desynchronize
    batch packings if any rank iterated an extra time.
    """

    def __init__(self, audio_lens: Sequence[int], max_len: int = 2000,
                 seed: int | None = None):
        self.audio_lens = list(audio_lens)
        self.max_len = max_len
        self.seed = 0 if seed is None else int(seed)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def __iter__(self) -> Iterator[list[int]]:
        rng = random.Random(self.seed * 1_000_003 + self.epoch)
        indices = list(range(len(self.audio_lens)))
        rng.shuffle(indices)
        batch: list[int] = []
        batch_length = 0
        for idx in indices:
            length = self.audio_lens[idx]
            if length > self.max_len:
                logging.warning(
                    f"Warning: example {idx} cannot fit within desired batch length")
            if length + batch_length > self.max_len:
                yield batch
                batch = []
                batch_length = 0
            batch.append(idx)
            batch_length += length
        # dropping last incomplete batch
