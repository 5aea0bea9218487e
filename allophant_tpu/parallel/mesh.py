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
    """Places every array in a batch pytree with its leading axis sharded on data."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda array: jax.device_put(array, sharding), tree)


def replicate_pytree(tree, mesh: Mesh):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda array: jax.device_put(array, sharding), tree)
