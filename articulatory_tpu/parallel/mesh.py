"""Device mesh + sharding utilities — the TPU-native replacement for the
reference's NCCL launcher/DistributedSampler stack (launch.py, train.py:
1455-1463, 1609-1615).

Data parallelism is expressed declaratively: parameters/optimizer state are
replicated over the ``data`` axis, batches are sharded on their leading
axis, and XLA's SPMD partitioner inserts the gradient all-reduces over
ICI/DCN. Multi-host setup goes through ``jax.distributed.initialize``; each
host feeds only its shard of the dataset (see data.loader.DataLoader's
shard_id/num_shards).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host rendezvous (replaces distributed/launch.py env-var setup)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(num_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_data_mesh(batch_size: int, axis_name: str = "data") -> Mesh:
    """Data-parallel mesh over as many devices as divide the global batch.

    ``batch_size`` is the *per-process* batch (the reference's semantics: the
    global batch is batch_size x process_count, train.py:1609-1615). In a
    multi-process run the mesh must span every process's devices, so the
    global batch must divide the full device count. Single-process: if the
    batch is not divisible by the device count, use the largest divisor
    (with a warning) rather than failing.
    """
    import logging

    devices = jax.devices()
    if jax.process_count() > 1:
        global_batch = batch_size * jax.process_count()
        if global_batch % len(devices) != 0:
            raise ValueError(
                f"global batch {global_batch} (= {batch_size} x "
                f"{jax.process_count()} processes) must be divisible by the "
                f"{len(devices)}-device mesh")
        return Mesh(np.asarray(devices), (axis_name,))
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n != len(devices):
        logging.warning(
            f"batch_size={batch_size} not divisible by {len(devices)} devices; "
            f"using a {n}-device data mesh.")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every array leaf on its leading (batch) axis over the mesh.

    Single-process: a plain device_put with the batch sharding. Multi-host:
    each process passes its *local* batch (its shard of the index space, as
    produced by the sharded DataLoader) and the leaves are assembled into
    global arrays of size ``local_batch * process_count`` — the multi-host
    analog of DistributedSampler's per-rank batches (reference
    train.py:1609-1615).
    """
    # divisibility is against the data axis only (the mesh may be 2-D with a
    # model axis for tensor parallelism; see parallel/tp.py)
    n = mesh.shape[axis_name]
    nproc = jax.process_count()

    def put(x):
        if isinstance(x, jax.Array) and nproc == 1:
            # already device-resident (device corpus cache): reshard on
            # device — never round-trip through the host (every host->device
            # transfer leaks its staging buffer on the axon relay platform)
            if x.ndim == 0 or x.shape[0] % n != 0:
                return jax.device_put(x, NamedSharding(mesh, P()))
            return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))
        x = np.asarray(x)
        if nproc > 1:
            if x.ndim == 0:
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, P()), x)
            # pad the local batch (repeating the last row) up to this host's
            # share of the data axis, so tail batches still shard. All hosts
            # see identical local batch sizes (wrap-padded DataLoader), so
            # the resulting global shape is consistent. NOTE: duplicated rows
            # carry full weight in mean losses/metrics. Training and dev
            # loaders use drop_last=True so this path never triggers for
            # gradient steps with a divisible batch size; when it does
            # trigger (remainder eval batches, or batch_size not divisible
            # by the per-host device share), the duplicated rows slightly
            # bias the interval averages toward the repeated sample.
            per_host = max(1, n // nproc)
            rem = x.shape[0] % per_host
            if rem:
                x = np.concatenate(
                    [x, np.repeat(x[-1:], per_host - rem, axis=0)])
            global_shape = (x.shape[0] * nproc,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                batch_sharding(mesh, x.ndim, axis_name), x, global_shape)
        if x.ndim == 0 or x.shape[0] % n != 0:
            # replicate scalars and indivisible (e.g. remainder eval) batches
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-host: every process must hold the same host values (deterministic
    init or a loaded checkpoint); assembly goes through
    make_array_from_process_local_data.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
