"""Tensor parallelism: channel-sharded parameters over a 2-D (data, model)
mesh.

The reference has no TP (SURVEY.md §2.10 — its only parallelism is data
parallel scaffolding); this is a TPU-native extension. The design is pure
GSPMD: parameters whose trailing (output-channel) axis divides the model-axis
size are sharded on that axis, everything else is replicated, and XLA's SPMD
partitioner inserts the all-gathers/reduce-scatters between column-sharded
convs. No communication code exists here — any sharding is numerically
exact under GSPMD, so the choice below is purely a performance layout:

- conv kernels (K, C_in, C_out): sharded on C_out (column parallel); the
  next layer's kernel is sharded on ITS C_out, so activations are
  all-gathered once per layer over ICI.
- biases / weight-norm ``g`` (per-out-channel): sharded with the kernel.
- optimizer state mirrors the params automatically: optax init uses
  ``zeros_like``, which preserves the donor's sharding.

Scope: the GENERATOR is channel-sharded; the discriminator stays replicated
(data-parallel). The generator holds virtually all serving/training FLOPs,
and XLA's SPMD convolution partitioner currently check-fails on the scale
discriminator's grouped convs' backward pass when channel-sharded
(convolution_handler.cc batch-group divisibility check).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(tp: int = 1, num_devices: int | None = None,
                    data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """(data, model) mesh: dp x tp devices, tp contiguous (same-host ICI)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % tp != 0:
        raise ValueError(f"{n} devices not divisible by tp={tp}")
    arr = np.asarray(devices).reshape(n // tp, tp)
    return Mesh(arr, (data_axis, model_axis))


def tp_spec(shape: tuple, tp_size: int, axis_name: str = "model",
            min_dim: int | None = None) -> P:
    """PartitionSpec sharding the trailing axis when it divides tp_size.

    ``min_dim`` guards against sharding tiny vectors (default: only shard
    axes of at least 2 x tp_size so every shard is non-trivial).
    """
    min_dim = 2 * tp_size if min_dim is None else min_dim
    if len(shape) >= 1 and shape[-1] % tp_size == 0 and shape[-1] >= min_dim:
        return P(*([None] * (len(shape) - 1) + [axis_name]))
    return P()


def shard_tree_tp(tree, mesh: Mesh, axis_name: str = "model",
                  min_dim: int | None = None):
    """Place a params/opt-state pytree with channel sharding over ``mesh``.

    Leaves keep their values; only device layout changes. Optimizer state
    created afterwards via ``tx.init(params)`` inherits the same shardings.
    """
    tp_size = mesh.shape[axis_name]

    def put(x):
        spec = tp_spec(np.shape(x), tp_size, axis_name, min_dim)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
