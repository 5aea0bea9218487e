"""Parameter sharding rules: tensor parallelism over the "model" mesh axis.

With a model-axis size of 1 everything is effectively replicated (pure DP). With a
larger model axis, the big matmuls (attention projections and FFN) are Megatron-style
sharded: column-parallel into the hidden expansion, row-parallel back out — XLA
inserts the reduce-scatter/all-reduce collectives over ICI."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from allophant_tpu.parallel.mesh import MODEL_AXIS

# Suffix patterns (joined param path -> PartitionSpec factory).
_COLUMN_PARALLEL = ("q_proj", "k_proj", "v_proj", "intermediate_dense", "linear1", "input_projection")
_ROW_PARALLEL = ("out_proj", "output_dense", "linear2")


def param_spec(path: Tuple[str, ...], ndim: int | None = None) -> PartitionSpec:
    """PartitionSpec for a parameter at `path` (tuple of tree keys).

    ``ndim`` (when given) left-pads the spec with replicated axes so stacked
    nn.scan parameters ([L, ...] leaves) shard their trailing matmul dims."""

    def pad(spec: Tuple) -> PartitionSpec:
        if ndim is None or ndim <= len(spec):
            return PartitionSpec(*spec)
        return PartitionSpec(*((None,) * (ndim - len(spec)) + spec))

    if len(path) < 2:
        return PartitionSpec()
    parent = path[-2]
    leaf = path[-1]
    if parent in _COLUMN_PARALLEL:
        if leaf == "kernel":
            return pad((None, MODEL_AXIS))
        if leaf == "bias":
            return pad((MODEL_AXIS,))
    if parent in _ROW_PARALLEL and leaf == "kernel":
        return pad((MODEL_AXIS, None))
    return PartitionSpec()


def _key_name(key) -> str:
    return getattr(key, "key", getattr(key, "name", str(key)))


def tree_param_shardings(tree, mesh: Mesh):
    """NamedSharding pytree matching `tree`, applying `param_spec` per path."""

    def assign(path, value):
        names = tuple(_key_name(key) for key in path)
        return NamedSharding(mesh, param_spec(names, getattr(value, "ndim", None)))

    return jax.tree_util.tree_map_with_path(assign, tree)


def apply_param_shardings(tree, mesh: Mesh):
    """Places parameters onto devices according to the sharding rules."""
    shardings = tree_param_shardings(tree, mesh)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
