"""Sequence parallelism: time-axis activation sharding for long-utterance
inference.

The generator is fully convolutional, so sharding the TIME axis of the
input (and requesting time-sharded outputs) makes GSPMD insert the halo
exchanges between neighboring shards — each device holds 1/N of the
activations end to end, which is what bounds memory on very long
full-utterance synthesis. Exactness is GSPMD-guaranteed and pinned by
tests/test_sequence_parallel.py (forward and gradient match the unsharded
run to float noise).

The reference has no SP (SURVEY.md §2.10); its long-utterance strategy is
chunked AR decode, which we also keep (inference.ar_loop). SP is the
non-AR complement: one compiled forward over the whole utterance, sharded
in time.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def time_sharding(mesh: Mesh, ndim: int = 3, data_axis: str = "data",
                  seq_axis: str = "model") -> NamedSharding:
    """(B, T, C...) sharding: batch over the data axis, time over seq axis."""
    return NamedSharding(mesh, P(data_axis, seq_axis, *([None] * (ndim - 2))))


def shard_time(x: jax.Array, mesh: Mesh, data_axis: str = "data",
               seq_axis: str = "model") -> jax.Array:
    """Place a (B, T, C) array with batch+time sharding over ``mesh``."""
    return jax.device_put(x, time_sharding(mesh, x.ndim, data_axis, seq_axis))


def jit_time_sharded(fn, mesh: Mesh, data_axis: str = "data",
                     seq_axis: str = "model"):
    """jit ``fn(params, c) -> y`` with a time-sharded output constraint, so
    the whole network stays sequence-sharded instead of gathering at the end.
    """
    out = time_sharding(mesh, 3, data_axis, seq_axis)
    return jax.jit(fn, out_shardings=out)
