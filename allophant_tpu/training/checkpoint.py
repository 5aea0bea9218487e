"""Checkpoint save/restore: a native msgpack format plus a reader for the reference's
torch checkpoints.

The reference stores a single ``torch.save`` file of a marshmallow-serialized
``Checkpoint`` (estimator.py:199-249): config, versions, feature size, sample rate,
attribute graph, epoch, phonetic indexer state (incl. the full feature CSV text),
dataset metadata, ``model_state`` (torch tensors), optimizer states and history. The
five released HF checkpoints are in that format, so ``load_reference_checkpoint``
parses it (torch CPU, weights_only) and ``convert_reference_model_state`` maps the
tensor names onto our flax parameter tree.

The native format is msgpack: JSON-able metadata plus the flax variable tree
serialized with ``flax.serialization`` — a single self-describing file, no pickle."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

import msgpack
import numpy as np
from flax import serialization

import allophant_tpu
from allophant_tpu.config import Config
from allophant_tpu.models.hf_conversion import convert_wav2vec2_state
from allophant_tpu.models.projection import ProjectionPlan
from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture
from allophant_tpu.phonetics.attribute_graph import AttributeGraph
from allophant_tpu.phonetics.features import PhoneticIndexerState


@dataclasses.dataclass
class EpochPosition:
    epoch: int = 0
    global_step: int = 0
    step: int = 0

    def next_step(self) -> None:
        self.global_step += 1
        self.step += 1

    def to_dict(self) -> Dict[str, int]:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, data: Dict[str, Any] | None) -> "EpochPosition":
        if data is None:
            return cls()
        return cls(int(data.get("epoch", 0)), int(data.get("global_step", 0)), int(data.get("step", 0)))

    def __str__(self) -> str:
        return f"Epoch {self.epoch}, Step {self.step} | Global Step: {self.global_step}"


@dataclasses.dataclass
class Checkpoint:
    """Parsed checkpoint contents, independent of on-disk format."""

    config: Config
    feature_size: int
    sample_rate: int
    attribute_graph: AttributeGraph
    epoch: EpochPosition
    phonetic_indexer_state: PhoneticIndexerState
    variables: Optional[Dict] = None  # native flax variables (params + buffers)
    reference_model_state: Optional[Dict[str, np.ndarray]] = None  # torch-name keyed
    optimizer_state: Optional[bytes] = None  # serialized optax state (native only)
    history: List[Any] = dataclasses.field(default_factory=list)
    dataset_meta_data: List[Any] = dataclasses.field(default_factory=list)
    additional: Optional[Dict[str, Any]] = None
    version: str = allophant_tpu.__version__


NATIVE_MAGIC = b"ALLOPHANT_TPU_CKPT1"


def _checkpoint_metadata(checkpoint: Checkpoint) -> Dict[str, Any]:
    return {
        "config": checkpoint.config.dump(),
        "feature_size": checkpoint.feature_size,
        "sample_rate": checkpoint.sample_rate,
        "attribute_graph": checkpoint.attribute_graph.to_dict(),
        "epoch": checkpoint.epoch.to_dict(),
        "phonetic_indexer_state": (
            None
            if checkpoint.phonetic_indexer_state is None
            else checkpoint.phonetic_indexer_state.to_dict()
        ),
        "history": checkpoint.history,
        "dataset_meta_data": checkpoint.dataset_meta_data,
        "additional": checkpoint.additional,
        "version": checkpoint.version,
    }


def save_native(checkpoint: Checkpoint, file_path: str) -> None:
    """Writes the native msgpack checkpoint (metadata JSON + flax variable bytes)."""
    metadata = _checkpoint_metadata(checkpoint)
    payload = {
        "magic": NATIVE_MAGIC,
        "metadata": json.dumps(metadata),
        "variables": serialization.msgpack_serialize(
            serialization.to_state_dict(checkpoint.variables)
        ),
        "optimizer_state": checkpoint.optimizer_state,
    }
    temporary = file_path + ".tmp"
    with open(temporary, "wb") as file:
        file.write(msgpack.packb(payload, use_bin_type=True))
    os.replace(temporary, file_path)


def _is_native(file_path: str) -> bool:
    with open(file_path, "rb") as file:
        head = file.read(64)
    return NATIVE_MAGIC in head


def load_native(file_path: str) -> Checkpoint:
    with open(file_path, "rb") as file:
        payload = msgpack.unpackb(file.read(), raw=False)
    metadata = json.loads(payload["metadata"])
    variables = serialization.msgpack_restore(payload["variables"])
    return Checkpoint(
        config=Config.load(metadata["config"]),
        feature_size=int(metadata["feature_size"]),
        sample_rate=int(metadata["sample_rate"]),
        attribute_graph=AttributeGraph.from_dict(metadata["attribute_graph"]),
        epoch=EpochPosition.from_dict(metadata.get("epoch")),
        phonetic_indexer_state=(
            None
            if metadata.get("phonetic_indexer_state") is None
            else PhoneticIndexerState.from_dict(metadata["phonetic_indexer_state"])
        ),
        variables=variables,
        optimizer_state=payload.get("optimizer_state"),
        history=metadata.get("history", []),
        dataset_meta_data=metadata.get("dataset_meta_data", []),
        additional=metadata.get("additional"),
        version=metadata.get("version", "unknown"),
    )


def load_reference_checkpoint(file_path: str) -> Checkpoint:
    """Loads a reference (torch) checkpoint file: the marshmallow-dumped dict saved by
    the reference's ``Checkpoint.save`` (estimator.py:221-227)."""
    import torch

    data = torch.load(file_path, map_location="cpu", weights_only=True)

    model_state = {
        key: value.numpy() if hasattr(value, "numpy") else np.asarray(value)
        for key, value in data["model_state"].items()
    }

    indexer_state = data["phonetic_indexer_state"]
    return Checkpoint(
        config=Config.load(data["config"]),
        feature_size=int(data["feature_size"]),
        sample_rate=int(data["sample_rate"]),
        attribute_graph=AttributeGraph.from_dict(data["attribute_graph"]),
        epoch=EpochPosition.from_dict(data.get("epoch")),
        phonetic_indexer_state=PhoneticIndexerState.from_dict(indexer_state),
        reference_model_state=model_state,
        history=[],
        dataset_meta_data=data.get("dataset_meta_data", []),
        additional=data.get("additional"),
        version=str(data.get("allophant_version", "reference")),
    )


def load_checkpoint(file_path: str) -> Checkpoint:
    """Dispatches between the native msgpack format, orbax directories and reference
    torch checkpoints. Accepts a local path or a HuggingFace model id (resolving
    ``allophant.pt`` via the local HF cache — this environment has no network
    egress)."""
    if os.path.isdir(file_path) and os.path.isfile(os.path.join(file_path, ORBAX_METADATA_FILE)):
        return load_orbax(file_path)
    if not os.path.isfile(file_path):
        resolved = _resolve_hub_file(file_path)
        if resolved is None:
            raise FileNotFoundError(f"No checkpoint found at {file_path!r}")
        file_path = resolved
    if _is_native(file_path):
        return load_native(file_path)
    return load_reference_checkpoint(file_path)


# ---------------------------------------------------------------------------
# Orbax backend (sharded multi-chip checkpoints)
# ---------------------------------------------------------------------------

ORBAX_METADATA_FILE = "allophant_meta.json"


def save_orbax(checkpoint: Checkpoint, directory: str) -> None:
    """Writes an orbax checkpoint directory: tensor-store variables (sharding-aware,
    written in parallel across hosts on multi-chip topologies) plus the same metadata
    the native format carries. The TPU-native choice for large sharded training
    state; the single-file msgpack format remains the default for portability."""
    import jax
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    # The orbax variable save below is a coordinated multi-process operation,
    # but the metadata/optimizer files and the stale-directory cleanup are
    # plain filesystem writes: only one process may perform them, and every
    # process must wait for the cleanup before entering the coordinated save.
    primary = jax.process_index() == 0
    if primary:
        os.makedirs(directory, exist_ok=True)
        with open(os.path.join(directory, ORBAX_METADATA_FILE), "w", encoding="utf-8") as file:
            json.dump(_checkpoint_metadata(checkpoint), file)
        if checkpoint.optimizer_state is not None:
            with open(os.path.join(directory, "optimizer_state.bin"), "wb") as file:
                file.write(checkpoint.optimizer_state)

    variables_path = os.path.join(directory, "variables")
    if primary and os.path.exists(variables_path):
        import shutil

        shutil.rmtree(variables_path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("allophant_orbax_save_cleanup")

    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(variables_path, serialization.to_state_dict(checkpoint.variables))
    checkpointer.wait_until_finished()


def load_orbax(directory: str) -> Checkpoint:
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    with open(os.path.join(directory, ORBAX_METADATA_FILE), "r", encoding="utf-8") as file:
        metadata = json.load(file)
    checkpointer = ocp.StandardCheckpointer()
    variables = checkpointer.restore(os.path.join(directory, "variables"))
    optimizer_state = None
    optimizer_path = os.path.join(directory, "optimizer_state.bin")
    if os.path.isfile(optimizer_path):
        with open(optimizer_path, "rb") as file:
            optimizer_state = file.read()
    return Checkpoint(
        config=Config.load(metadata["config"]),
        feature_size=int(metadata["feature_size"]),
        sample_rate=int(metadata["sample_rate"]),
        attribute_graph=AttributeGraph.from_dict(metadata["attribute_graph"]),
        epoch=EpochPosition.from_dict(metadata.get("epoch")),
        phonetic_indexer_state=(
            None
            if metadata.get("phonetic_indexer_state") is None
            else PhoneticIndexerState.from_dict(metadata["phonetic_indexer_state"])
        ),
        variables=variables,
        optimizer_state=optimizer_state,
        history=metadata.get("history", []),
        dataset_meta_data=metadata.get("dataset_meta_data", []),
        additional=metadata.get("additional"),
        version=metadata.get("version", "unknown"),
    )


def _resolve_hub_file(model_id: str) -> Optional[str]:
    try:
        from transformers.utils import cached_file

        return cached_file(
            model_id, "allophant.pt", local_files_only=True, _raise_exceptions_for_missing_entries=False
        )
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Reference model_state -> flax params conversion
# ---------------------------------------------------------------------------


def _linear(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": np.ascontiguousarray(state[f"{prefix}.weight"].T),
        "bias": state[f"{prefix}.bias"],
    }


def _layer_norm(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": state[f"{prefix}.weight"], "bias": state[f"{prefix}.bias"]}


def _convert_transformer_acoustic_state(state: Dict[str, np.ndarray], config) -> Dict:
    """Maps the reference's from-scratch ``TransformerAcousticModel.state_dict()``
    (acoustic_model.py:665-759, frontend.py:154-265) onto our
    ``models.transformer.TransformerAcousticModel`` tree.

    Reference naming: ``_acoustic_model._frontend._layer.<i>`` (Linear frontend
    Sequential: optional Dropout, LayerNorm, Linear, LeakyReLU),
    ``_acoustic_model._sequential_frontend._layers.layers.<i>.module`` per
    LengthWrapper (GLU conv under ``._weights``, affine LayerNorm at Sequential
    slot 1 between two Transposes), ``_acoustic_model._transformer.layers.<i>``
    torch encoder layers (packed ``self_attn.in_proj_*``), and
    ``_acoustic_model._final_layer_norm``. Our encoder layers run under
    ``nn.scan``, so per-layer tensors stack into leading-[L] arrays."""
    from allophant_tpu.config import Glu1dConfig, LayerNormConfig, LinearFrontendConfig

    prefix = "_acoustic_model."
    params: Dict[str, Any] = {}
    affine = config.elementwise_affine

    frontend = config.frontend
    if isinstance(frontend, LinearFrontendConfig):
        # Sequential indices shift by one when an input-dropout module leads.
        offset = 1 if frontend.input_dropout > 0 else 0
        if affine:
            params["frontend_norm"] = _layer_norm(state, f"{prefix}_frontend._layer.{offset}")
        params["frontend_linear"] = _linear(state, f"{prefix}_frontend._layer.{offset + 1}")

    if config.sequential_frontend is not None:
        sequential: Dict[str, Any] = {}
        for index, layer in enumerate(config.sequential_frontend.layers):
            base = f"{prefix}_sequential_frontend._layers.layers.{index}.module"
            if isinstance(layer, Glu1dConfig):
                weight = state[f"{base}._weights.weight"]  # torch Conv1d [2C, in, K]
                sequential[f"glu_{index}"] = {
                    "weights": {
                        "kernel": np.ascontiguousarray(weight.transpose(2, 1, 0)),
                        "bias": state[f"{base}._weights.bias"],
                    }
                }
            elif isinstance(layer, LayerNormConfig) and layer.affine:
                sequential[f"norm_{index}"] = _layer_norm(state, f"{base}.1")
        if sequential:
            params["sequential_frontend"] = sequential

    stacked: Dict[str, Dict[str, List[np.ndarray]]] = {}

    def push(module: str, leaf: str, value: np.ndarray) -> None:
        stacked.setdefault(module, {}).setdefault(leaf, []).append(value)

    for index in range(config.transformer.num_layers):
        base = f"{prefix}_transformer.layers.{index}"
        in_proj_weight = state[f"{base}.self_attn.in_proj_weight"]
        in_proj_bias = state[f"{base}.self_attn.in_proj_bias"]
        hidden = in_proj_weight.shape[0] // 3
        for part, name in enumerate(("q_proj", "k_proj", "v_proj")):
            push(name, "kernel", np.ascontiguousarray(
                in_proj_weight[part * hidden : (part + 1) * hidden].T
            ))
            push(name, "bias", in_proj_bias[part * hidden : (part + 1) * hidden])
        out_proj = _linear(state, f"{base}.self_attn.out_proj")
        push("out_proj", "kernel", out_proj["kernel"])
        push("out_proj", "bias", out_proj["bias"])
        for linear_name in ("linear1", "linear2"):
            linear = _linear(state, f"{base}.{linear_name}")
            push(linear_name, "kernel", linear["kernel"])
            push(linear_name, "bias", linear["bias"])
        if affine:
            for norm_name in ("norm1", "norm2"):
                norm = _layer_norm(state, f"{base}.{norm_name}")
                push(norm_name, "scale", norm["scale"])
                push(norm_name, "bias", norm["bias"])

    params["layers"] = {
        module: {leaf: np.stack(values) for leaf, values in leaves.items()}
        for module, leaves in stacked.items()
    }
    if affine:
        params["final_norm"] = _layer_norm(state, f"{prefix}_final_layer_norm")
    return params


def convert_reference_model_state(
    state: Dict[str, np.ndarray],
    plan: ProjectionPlan,
    wav2vec2_architecture: Optional[Wav2Vec2Architecture],
    acoustic_config=None,
) -> Dict:
    """Maps the reference's ``Allophant.state_dict()`` names onto our parameter tree.

    Reference naming (acoustic_model.py:944-1064): ``_acoustic_model._model.<hf>`` for
    the wrapped wav2vec2 (``_acoustic_model._frontend/_transformer/...`` for the
    from-scratch transformer family), ``_projection._layers.<node>._time_distributed_layer``
    for classifier layers, ``...._composition_layer._attribute_embeddings.weight`` and
    ``...._allophone_layer._allophone_matrices``."""
    from allophant_tpu.config import TransformerAcousticModelConfig

    params: Dict[str, Any] = {}

    if wav2vec2_architecture is not None:
        params["acoustic_model"] = convert_wav2vec2_state(
            state, wav2vec2_architecture, prefix="_acoustic_model._model."
        )
    elif isinstance(acoustic_config, TransformerAcousticModelConfig):
        params["acoustic_model"] = _convert_transformer_acoustic_state(state, acoustic_config)
    else:
        raise NotImplementedError(
            "Reference checkpoints with this acoustic model type are not supported"
            f" (got {type(acoustic_config).__name__})"
        )

    projection: Dict[str, Any] = {}
    for node in plan.nodes:
        base = f"_projection._layers.{node.name}._time_distributed_layer"
        if node.attention is not None:
            # torch nn.MultiheadAttention packs q/k/v into in_proj_weight [3E, E].
            in_proj_weight = state[f"{base}.attention.in_proj_weight"]
            in_proj_bias = state[f"{base}.attention.in_proj_bias"]
            hidden = in_proj_weight.shape[0] // 3
            attention = {}
            for index, name in enumerate(("q_proj", "k_proj", "v_proj")):
                attention[name] = {
                    "kernel": np.ascontiguousarray(
                        in_proj_weight[index * hidden : (index + 1) * hidden].T
                    ),
                    "bias": in_proj_bias[index * hidden : (index + 1) * hidden],
                }
            attention["out_proj"] = _linear(state, f"{base}.attention.out_proj")
            projection[f"classifiers_{node.name}"] = {
                "input_projection": _linear(state, f"{base}.input_projection"),
                "layer_norm": _layer_norm(state, f"{base}.layer_norm"),
                **attention,
            }
        else:
            projection[f"classifiers_{node.name}"] = _linear(state, base)

        if node.has_composition:
            projection["composition"] = {
                "attribute_embeddings": state[
                    f"_projection._layers.{node.name}._composition_layer._attribute_embeddings.weight"
                ]
            }
        if node.has_allophone:
            projection["allophone"] = {
                "allophone_matrices": state[
                    f"_projection._layers.{node.name}._allophone_layer._allophone_matrices"
                ]
            }

    params["projection"] = projection
    return params
