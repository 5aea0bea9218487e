"""Device mesh construction and sharding rules.

The reference has no multi-device parallelism at all (SURVEY.md §2.6); this layer is
new TPU-native design. The model is ≤0.3B parameters, so the primary strategy is data
parallelism over a 1-D "data" mesh axis with replicated parameters — gradients are
combined by XLA-inserted psums over ICI. A "model" axis is kept in the mesh shape for
tensor-parallel growth; with size 1 it is a no-op."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Optional[Sequence] = None, data_parallel: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    """Builds a (data, model) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    count = len(devices)
    if data_parallel is None:
        data_parallel = count // model_parallel
    if data_parallel * model_parallel != count:
        raise ValueError(
            f"Mesh shape {data_parallel}x{model_parallel} does not match {count} devices"
        )
    grid = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, PartitionSpec(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_batch_pytree(tree, mesh: Mesh):
    """Places every array in a batch pytree with its leading axis sharded on data.

    Single-process: a plain sharded ``device_put``. Multi-host (``jax.process_count()
    > 1``): each process passes its *local* slice of the global batch (local batch =
    global batch / process count, produced by a sampler restricted with
    :func:`process_local_slice`); ``jax.make_array_from_process_local_data``
    assembles the distributed array without any cross-host gather."""
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda array: jax.device_put(array, sharding), tree)
    return jax.tree_util.tree_map(
        lambda array: jax.make_array_from_process_local_data(sharding, np.asarray(array)), tree
    )


def microbatch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for stacked microbatches [accumulation, batch, ...]: the batch
    axis (axis 1) is sharded on data, the accumulation axis is replicated."""
    return NamedSharding(mesh, PartitionSpec(None, DATA_AXIS))


def shard_microbatch_pytree(tree, mesh: Mesh):
    """Places stacked-microbatch arrays ([A, B, ...] leaves) with the batch axis
    sharded on data; multi-host processes pass their local slice of B (see
    :func:`shard_batch_pytree`)."""
    sharding = microbatch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda array: jax.device_put(array, sharding), tree)
    return jax.tree_util.tree_map(
        lambda array: jax.make_array_from_process_local_data(sharding, np.asarray(array)), tree
    )


def process_local_slice(global_batch_size: int) -> slice:
    """This process's contiguous share of a global batch (multi-host data loading:
    every host reads only its own slice; reference has no distributed loading).

    For data-parallel batches only the *partition* matters, not which rows land
    on which device: every example appears exactly once globally, and gradient
    psums are order-invariant."""
    count = jax.process_count()
    if global_batch_size % count:
        raise ValueError(
            f"Global batch size {global_batch_size} is not divisible by {count} processes"
        )
    local = global_batch_size // count
    start = jax.process_index() * local
    return slice(start, start + local)


def replicate_pytree(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda array: jax.device_put(array, sharding), tree)
