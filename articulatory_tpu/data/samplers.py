"""Batch samplers (reference: articulatory/samplers/pytorch_samplers.py)."""

from __future__ import annotations

import logging
import random
from typing import Iterator, Sequence


class SizeAwareSampler:
    """Packs variable-length utterances into batches up to ``max_len`` total
    samples; drops the last partial batch (matches the reference)."""

    def __init__(self, audio_lens: Sequence[int], max_len: int = 2000,
                 seed: int | None = None):
        self.audio_lens = list(audio_lens)
        self.max_len = max_len
        self._random = random.Random(seed)

    def __iter__(self) -> Iterator[list[int]]:
        indices = list(range(len(self.audio_lens)))
        self._random.shuffle(indices)
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
