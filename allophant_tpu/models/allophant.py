"""Top-level Allophant model: acoustic encoder + hierarchical classifier head.

Counterpart of /root/reference/allophant/network/acoustic_model.py:908-1064. The model
is a flax module; construction happens host-side (graph sort, projection plan, static
allophone/composition tables) and produces a module plus a set of numpy buffers that
are injected into the variable tree after ``init`` (``inject_static_data``)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

from allophant_tpu.config import (
    Architecture,
    PhonemeLayerType,
    ProjectionEntryConfig,
    TransformerAcousticModelConfig,
    Wav2Vec2PretrainedConfig,
)
from allophant_tpu.models.projection import (
    BUFFERS,
    HierarchicalProjection,
    ProjectionPlan,
    build_projection_plan,
)
from allophant_tpu.models.transformer import TransformerAcousticModel
from allophant_tpu.models.wav2vec2 import (
    REMAT_SAVE_NAMES_BASE,
    Wav2Vec2Architecture,
    Wav2Vec2Model,
    matmul_precision_scope,
)
from allophant_tpu.phonetics.attribute_graph import AttributeGraph
from allophant_tpu.phonetics.features import PhoneticAttributeIndexer


from flax import struct


@struct.dataclass
class Predictions:
    """Per-task output logits (or log-probabilities) plus output frame counts.

    Outputs are batch-first [B, T, C] (the torch reference is time-first; its public
    decode flow transposes, which we preserve at the Estimator surface). Registered as
    a pytree so it can cross jit boundaries."""

    outputs: Dict[str, jnp.ndarray]
    lengths: jnp.ndarray

    def __len__(self) -> int:
        return len(self.lengths)

    def task_count(self) -> int:
        return len(self.outputs)


def needs_intermediate_taps(plan) -> bool:
    """Whether any classifier consumes an "OUTPUT_<i>" intermediate encoder tap.

    When False (the default config: every head depends on the final "OUTPUT"),
    the wav2vec2 encoder skips stacking per-layer outputs — the [L, B, T, D]
    hidden-states buffer (3.2 GB at batch 128 on the flagship) never touches
    HBM in either the forward or the scan backward."""
    return any(
        name != ProjectionEntryConfig.OUTPUT_DEPENDENCY for name in plan.output_dependencies
    )


def highest_specific_output_layer(graph: AttributeGraph) -> Optional[int]:
    """Exclusive index of the highest "OUTPUT_<i>" tap, or None if only the final
    output is used (reference :932-941) — lets us drop unused encoder layers."""
    indices = []
    for node in graph:
        for dependency in node.dependencies:
            match = ProjectionEntryConfig.OUTPUT_PATTERN.match(dependency)
            if match is not None and match.group(1) is not None:
                indices.append(int(match.group(1)))
    return max(indices) + 1 if indices else None


class AllophantModel(nn.Module):
    """Acoustic model + hierarchical projection. ``acoustic_config`` selects between
    the wav2vec2 encoder and the from-scratch transformer."""

    acoustic_config: Any  # Wav2Vec2Architecture | TransformerAcousticModelConfig
    feature_size: int
    plan: ProjectionPlan
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # Residual set for rematerialized training (see wav2vec2.REMAT_SAVE_NAMES_*).
    remat_save_names: tuple = REMAT_SAVE_NAMES_BASE
    # Whole-run-frozen prefix of the wav2vec2 chain (see Wav2Vec2Model.frozen_prefix);
    # derived from the freeze flags by build_model, ignored by other acoustic models.
    frozen_prefix: int = 0
    # Compute dtype of the classifier head (projection); None = same as ``dtype``.
    # Mixed serving precision ("mixed" in Estimator.restore) sets dtype=bf16 with
    # head_dtype=f32: the encoder matmuls ride the fast MXU path while the
    # decision-relevant tail — classifier logits, composition/allophone matmuls,
    # log_softmax — runs in full f32 (hidden states are cast once at the boundary).
    head_dtype: Optional[jnp.dtype] = None
    # f32 matmul pass count (see wav2vec2.matmul_precision_scope); applies to
    # whichever of encoder/head computes in f32.
    f32_matmul_precision: str = "highest"

    def setup(self):
        if isinstance(self.acoustic_config, Wav2Vec2Architecture):
            self.acoustic_model = Wav2Vec2Model(
                self.acoustic_config,
                self.dtype,
                remat=self.remat,
                remat_save_names=self.remat_save_names,
                frozen_prefix=self.frozen_prefix,
                collect_all=needs_intermediate_taps(self.plan),
                f32_matmul_precision=self.f32_matmul_precision,
            )
        elif isinstance(self.acoustic_config, TransformerAcousticModelConfig):
            self.acoustic_model = TransformerAcousticModel(
                self.acoustic_config, self.feature_size, self.dtype
            )
        else:
            raise ValueError(f"Unsupported acoustic model config: {type(self.acoustic_config)}")
        self.projection = HierarchicalProjection(self.plan, self.resolved_head_dtype)

    @property
    def resolved_head_dtype(self) -> jnp.dtype:
        return self.dtype if self.head_dtype is None else self.head_dtype

    def __call__(
        self,
        audio_features,
        lengths,
        language_ids,
        target_feature_indices=None,
        predict: bool = False,
        deterministic: bool = True,
    ) -> Predictions:
        # f32 models trace at Precision.HIGHEST (see matmul_precision_scope);
        # the nested scope in Wav2Vec2Model covers the standalone-encoder path.
        # With a distinct head dtype the encoder and the projection each get the
        # precision scope their own dtype asks for.
        head_dtype = self.resolved_head_dtype
        with matmul_precision_scope(self.dtype, self.f32_matmul_precision):
            hidden_states, frame_lengths = self.acoustic_model(audio_features, lengths, deterministic)
        if head_dtype != self.dtype:
            hidden_states = [states.astype(head_dtype) for states in hidden_states]
        with matmul_precision_scope(head_dtype, self.f32_matmul_precision):
            outputs = self.projection(
                hidden_states, frame_lengths, language_ids, target_feature_indices, predict, deterministic
            )
        return Predictions(outputs, frame_lengths)

    def downsampled_lengths(self, lengths):
        if isinstance(self.acoustic_config, Wav2Vec2Architecture):
            return self.acoustic_config.downsampled_lengths(lengths)
        return self.acoustic_model.downsampled_lengths(lengths)

    def l2_penalty(self):
        return self.projection.l2_penalty()

    def map_allophones(self, phone_logits, language_ids):
        return self.projection.map_allophones(phone_logits, language_ids)

    @staticmethod
    def log_probabilities(outputs):
        return jax.nn.log_softmax(outputs, axis=-1)

    @property
    def classes(self) -> List[str]:
        return [node.name for node in self.plan.nodes]


@dataclasses.dataclass
class BuiltModel:
    """A constructed model plus the static numpy data its buffers need."""

    model: AllophantModel
    static_data: Dict[str, np.ndarray]
    d_model: int
    output_size: int

    def init(self, rng, sample_batch_size: int = 1, sample_length: int = 1600) -> Dict:
        """Initializes parameters with a tiny dummy batch and injects static buffers."""
        audio = jnp.zeros(
            (sample_batch_size, sample_length)
            if isinstance(self.model.acoustic_config, Wav2Vec2Architecture)
            else (sample_batch_size, sample_length, self.model.feature_size)
        )
        lengths = jnp.full((sample_batch_size,), sample_length, dtype=jnp.int32)
        language_ids = jnp.zeros((sample_batch_size,), dtype=jnp.int32)
        variables = self.model.init(rng, audio, lengths, language_ids)
        return inject_static_data(variables, self.static_data)


def inject_static_data(variables: Dict, static_data: Dict[str, np.ndarray]) -> Dict:
    """Writes the plan's numpy tables into the variable tree: the composition feature
    table, and the allophone matrices (as both the parameter's initial value and the
    frozen initialization buffer) plus gather indices."""
    variables = unfreeze(variables)
    buffers = variables.get(BUFFERS, {})
    projection_buffers = buffers.setdefault("projection", {})

    if "composition_feature_table" in static_data:
        projection_buffers["composition_feature_table"] = jnp.asarray(
            static_data["composition_feature_table"]
        )
    if "allophone_matrices" in static_data:
        allophone_buffers = projection_buffers.setdefault("allophone", {})
        allophone_buffers["initialization"] = jnp.asarray(static_data["allophone_matrices"])
        allophone_buffers["gather_indices"] = jnp.asarray(static_data["allophone_gather"])
        variables["params"]["projection"]["allophone"]["allophone_matrices"] = jnp.asarray(
            static_data["allophone_matrices"]
        )
    variables[BUFFERS] = buffers
    return variables


def build_model(
    architecture: Architecture,
    feature_size: int,
    sample_rate: int,
    attribute_graph: AttributeGraph,
    attribute_indexer: Optional[PhoneticAttributeIndexer] = None,
    wav2vec2_architecture: Optional[Wav2Vec2Architecture] = None,
    dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
    remat_save_names: tuple = REMAT_SAVE_NAMES_BASE,
    head_dtype: Optional[jnp.dtype] = None,
    f32_matmul_precision: str = "highest",
) -> BuiltModel:
    """Builds the Allophant model from an architecture config (reference :988-1025).

    For ``wav2vec2-pretrained`` configs the encoder architecture defaults to
    XLS-R-300m (facebook/wav2vec2-xls-r-300m) unless ``wav2vec2_architecture`` is
    given — released checkpoints embed all encoder weights, so no hub access is
    required for inference."""
    layer_config = architecture.acoustic_model

    if isinstance(layer_config, Wav2Vec2PretrainedConfig):
        arch = wav2vec2_architecture if wav2vec2_architecture is not None else Wav2Vec2Architecture()
        expected_rate = 16_000
        if sample_rate != expected_rate:
            raise ValueError(
                "Audio resampling config and the sampling rate required by Wav2Vec2 do not"
                f" match. Expected {expected_rate}Hz, got {sample_rate}Hz"
            )
        # Drop encoder layers above the highest required intermediate tap.
        arch = arch.truncated(highest_specific_output_layer(attribute_graph))
        acoustic_config: Any = arch
        d_model = arch.hidden_size
        output_size = arch.hidden_size
    elif isinstance(layer_config, TransformerAcousticModelConfig):
        probe = TransformerAcousticModel(layer_config, feature_size)
        acoustic_config = layer_config
        d_model = probe.d_model
        output_size = probe.output_size
    else:
        raise ValueError(f"Unsupported model type: {type(layer_config)}")

    if attribute_indexer is not None and architecture.projection.phoneme_layer != PhonemeLayerType.SHARED:
        language_allophones = attribute_indexer.language_allophones
    else:
        language_allophones = None

    plan, static_data = build_projection_plan(
        output_size,
        attribute_graph,
        architecture.loss.BLANK_OFFSET,
        architecture.projection,
        language_allophones,
        attribute_indexer,
    )

    model = AllophantModel(
        acoustic_config,
        feature_size,
        plan,
        dtype,
        remat,
        remat_save_names=remat_save_names,
        frozen_prefix=whole_run_frozen_prefix(layer_config),
        head_dtype=head_dtype,
        f32_matmul_precision=f32_matmul_precision,
    )
    return BuiltModel(model, static_data, d_model, output_size)


def whole_run_frozen_prefix(layer_config) -> int:
    """Longest prefix of (feature_extractor, feature_projection, encoder) that stays
    frozen for the entire run: the freeze flag is set and no unfreeze schedule ever
    thaws it (reference freeze flags + UnfreezeSchedule, acoustic_model.py:856-905).

    Gradients into this prefix are structurally zero, so the model can insert
    stop_gradient at the prefix boundary and XLA deletes the corresponding backward
    computation — notably the conv-extractor backward over raw audio under the
    default ``freeze_feature_encoder = true``. Groups thawed by a schedule (or
    trainable ones) must keep their backward: their gradients are masked dynamically
    by ``apply_freeze_plan`` instead."""
    if not isinstance(layer_config, Wav2Vec2PretrainedConfig):
        return 0
    prefix = 0
    for _subtree, frozen, thaw_steps in layer_config.freeze_groups():
        if frozen and thaw_steps is None:
            prefix += 1
        else:
            break
    return prefix


def attribute_graph_from_config(config, attribute_indexer: PhoneticAttributeIndexer) -> AttributeGraph:
    """Builds the attribute graph from classifier configs + indexer sizes (reference
    estimator.py:271-281)."""
    from allophant_tpu.phonetics.attribute_graph import AttributeNode, TimeLayerConfig

    nodes = []
    for entry in config.nn.projection.classes:
        time_layer = None
        if entry.time_layer is not None:
            time_layer = TimeLayerConfig(entry.time_layer.num_heads, entry.time_layer.positional_embeddings)
        nodes.append(
            AttributeNode(
                entry.name,
                attribute_indexer.size(entry.name),
                time_layer,
                list(entry.dependencies),
            )
        )
    return AttributeGraph(nodes)
