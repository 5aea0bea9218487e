"""Hierarchical multi-task classifier head: attribute classifiers over an attribute
dependency graph, with optional embedding-composition and allophone layers.

TPU-native counterpart of /root/reference/allophant/network/acoustic_model.py:90-550.
Semantics preserved exactly (they define checkpoint compatibility and decoding):

- One classifier per attribute node, built in reverse-topological graph order; each
  consumes the concatenation of its dependencies' softmaxed posteriors (optionally with
  blank logits stripped) and/or raw acoustic-model taps ("OUTPUT"/"OUTPUT_<i>").
- ``EmbeddingCompositionLayer``: phone logits are dot products with phone embeddings
  composed as sums of attribute-category embeddings (scaled by 1/sqrt(E)), over either
  the training feature table or a caller-supplied inventory matrix — the zero-shot
  mechanism (reference :180-234).
- ``AllophoneMapping``: per-language phone->phoneme matrices initialized from allophone
  data with a blank identity diagonal; training forward multiplies phone logits by the
  language matrix, masks non-allophones and max-pools over phones; an L2 penalty pulls
  the matrices toward their initialization (reference :90-177).

TPU redesign: the reference materializes a [T, S, P] product per *utterance* in a
Python loop (reference :142-159). Here the allophone max-pool is a batched gather over
precomputed per-language allophone index lists ([L, P, K] with K = max allophones per
phoneme), which is O(B*T*P*K) instead of O(B*T*S*P) and contains no host loop."""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from allophant_tpu.config import (
    EmbeddingCompositionConfig,
    PhonemeLayerType,
    ProjectionConfig,
    ProjectionEntryConfig,
)
from allophant_tpu.ops import masking
from allophant_tpu.phonetics.attribute_graph import AttributeGraph, AttributeNode
from allophant_tpu.phonetics.features import LanguageAllophoneMappings, PhoneticAttributeIndexer

BUFFERS = "buffers"


def sinusoidal_positions(length: int, size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sinusoidal position embeddings with interleaved sin/cos over *paired* dims,
    matching the reference's stacked-component construction (acoustic_model.py:34-69)."""
    component = np.exp(np.arange(0, size, 2, dtype=np.float32) * -(math.log(10000) / size))
    bases = np.stack([component] * 2, 1).reshape(-1)
    positions = np.arange(length, dtype=np.float32)[:, None] * bases[None, :]
    positions[:, 0::2] = np.sin(positions[:, 0::2])
    positions[:, 1::2] = np.cos(positions[:, 1::2])
    return jnp.asarray(positions, dtype=dtype)


class EmbeddingCompositionLayer(nn.Module):
    """Compositional phone embeddings (Li et al., 2021): each phone's embedding is the
    sum of its attribute-category embeddings; logits are scaled dot products.

    ``feature_indices`` is a raw [P, F] dense feature matrix (category ids per
    feature); per-feature offsets (with the blank occupying row 0) are added here."""

    embedding_size: int
    num_embeddings: int  # total categories + 1 blank row
    category_offsets: Tuple[int, ...]  # per-feature offsets (blank occupies row 0)
    unused_categories: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, feature_indices):
        offsets = jnp.asarray(self.category_offsets, dtype=jnp.int32)[None, :]
        feature_indices = jnp.asarray(feature_indices, dtype=jnp.int32) + offsets

        def init_embeddings(key):
            # torch nn.EmbeddingBag default init: N(0, 1); unused categories zeroed
            # (reference :208-212).
            import jax

            table = jax.random.normal(key, (self.num_embeddings, self.embedding_size), jnp.float32)
            if len(self.unused_categories):
                table = table.at[jnp.asarray(self.unused_categories, dtype=jnp.int32)].set(0.0)
            return table

        embeddings = self.param("attribute_embeddings", init_embeddings)
        embeddings = embeddings.astype(self.dtype)
        # Composed phone embeddings: sum of per-feature category embeddings [P, E];
        # the blank class uses embedding row 0 alone.
        composed = embeddings[feature_indices].sum(axis=1)
        composed = jnp.concatenate((embeddings[0][None, :], composed), axis=0)
        scale = 1.0 / math.sqrt(self.embedding_size)
        return (inputs @ composed.T) * scale


def build_allophone_arrays(
    language_allophones: LanguageAllophoneMappings, blank_offset: int, phoneme_count: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Builds the dense [L, S, P] allophone matrix (1 at allophone positions, blank
    identity diagonal) and the padded gather table [L, P, K] of shared-phone indices
    (-1 padding) used by the fused max-pool."""
    num_languages = len(language_allophones.languages)
    shared_count = len(language_allophones.shared_phones) + blank_offset
    total_phonemes = phoneme_count + blank_offset

    matrix = np.zeros((num_languages, shared_count, total_phonemes), dtype=np.float32)
    max_allophones = 1
    for mapping in language_allophones.allophones.values():
        for allophones in mapping.values():
            max_allophones = max(max_allophones, len(allophones))

    gather = np.full((num_languages, total_phonemes, max_allophones + blank_offset), -1, dtype=np.int32)
    for dense_index, (language_index, mapping) in enumerate(language_allophones.allophones.items()):
        for blank in range(blank_offset):
            matrix[dense_index, blank, blank] = 1.0
            gather[dense_index, blank, 0] = blank
        for phoneme, allophones in mapping.items():
            for position, allophone in enumerate(allophones):
                matrix[dense_index, allophone + blank_offset, phoneme + blank_offset] = 1.0
                gather[dense_index, phoneme + blank_offset, position] = allophone + blank_offset
    return matrix, gather


class AllophoneMapping(nn.Module):
    """Allosaurus-style allophone layer. Parameters: dense [L, S, P] matrices
    (initialized from allophone data by the model assembly); the initialization (for
    the L2 pull) and the gather table are non-trained buffers injected after init."""

    num_languages: int
    shared_count: int  # incl. blank
    phoneme_count: int  # incl. blank
    max_gather: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        shape = (self.num_languages, self.shared_count, self.phoneme_count)
        # Real values (allophone pattern / gather lists) are injected post-init by the
        # model assembly from the plan's static data.
        self.allophone_matrices = self.param("allophone_matrices", lambda key: jnp.zeros(shape, jnp.float32))
        self.initialization = self.variable(BUFFERS, "initialization", lambda: jnp.zeros(shape, jnp.float32))
        self.gather_indices = self.variable(
            BUFFERS,
            "gather_indices",
            lambda: jnp.full((self.num_languages, self.phoneme_count, self.max_gather), -1, jnp.int32),
        )

    def __call__(self, phone_logits, language_ids, predict: bool = False) -> Dict[str, jnp.ndarray]:
        if predict:
            # Language IDs of other corpora are meaningless: pass raw phone logits
            # through as both tasks (reference :161-167).
            return {
                ProjectionEntryConfig.PHONE: phone_logits,
                ProjectionEntryConfig.PHONEME_LAYER: phone_logits,
            }
        return {ProjectionEntryConfig.PHONEME_LAYER: self.map_allophones(phone_logits, language_ids)}

    def map_allophones(self, phone_logits, language_ids):
        """[B, T, S] phone logits -> [B, T, P] phoneme logits: for each phoneme, the
        max over its allophones of logit * matrix_weight; non-allophones contribute
        -inf (zero probability after softmax)."""
        matrices = self.allophone_matrices
        gather = self.gather_indices.value
        batch_gather = gather[language_ids]  # [B, P, K]
        valid = batch_gather >= 0
        safe_indices = jnp.where(valid, batch_gather, 0)

        # Gather logits at allophone positions: [B, T, P, K]
        gathered_logits = jnp.take_along_axis(
            phone_logits[:, :, None, :], safe_indices[:, None, :, :], axis=-1
        )
        # Gather the learned matrix weights at the same positions: [B, P, K]
        batch_matrices = matrices[language_ids]  # [B, S, P]
        weights = jnp.take_along_axis(
            jnp.swapaxes(batch_matrices, 1, 2), safe_indices, axis=-1
        )  # [B, P, K]
        products = gathered_logits * weights[:, None, :, :].astype(gathered_logits.dtype)
        # Large negative instead of float32-min: identical zero probability after
        # softmax, but keeps CTC losses finite (no inf/nan gradients under jax).
        products = jnp.where(valid[:, None, :, :], products, -1e9)
        return products.max(axis=-1)

    def l2_penalty(self):
        """Sum over languages of per-language Frobenius norms of (W - W0)
        (reference :169-177). Uses the double-where safe-sqrt so the gradient at
        W == W0 is 0 (torch's norm subgradient) instead of NaN."""
        deltas = self.allophone_matrices - self.initialization.value
        squared = (deltas**2).sum(axis=(1, 2))
        positive = squared > 0
        safe = jnp.where(positive, squared, 1.0)
        return jnp.where(positive, jnp.sqrt(safe), 0.0).sum()


class ProjectingMultiheadAttention(nn.Module):
    """Linear projection -> LayerNorm -> optional sinusoidal positions -> MHA
    (reference :237-268)."""

    hidden_dimensions: int
    num_heads: int
    add_positional_embeddings: bool = False
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, lengths, deterministic: bool = True):
        hidden = nn.Dense(self.hidden_dimensions, dtype=self.dtype, name="input_projection")(inputs)
        hidden = nn.LayerNorm(name="layer_norm", dtype=self.dtype)(hidden)
        if self.add_positional_embeddings:
            hidden = hidden + sinusoidal_positions(hidden.shape[1], self.hidden_dimensions, hidden.dtype)[None]

        heads = self.num_heads
        head_dim = self.hidden_dimensions // heads
        batch, time, _ = hidden.shape

        def project(name):
            return nn.Dense(self.hidden_dimensions, dtype=self.dtype, name=name)(hidden).reshape(
                batch, time, heads, head_dim
            )

        query = project("q_proj") * head_dim**-0.5
        key = project("k_proj")
        value = project("v_proj")
        logits = jnp.einsum("bthd,bshd->bhts", query, key)
        pad_mask = masking.mask_sequence(lengths, time)
        logits = jnp.where(pad_mask[:, None, None, :], logits, -1e9)
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(hidden.dtype)
        context = jnp.einsum("bhts,bshd->bthd", weights, value).reshape(batch, time, self.hidden_dimensions)
        output = nn.Dense(self.hidden_dimensions, dtype=self.dtype, name="out_proj")(context)
        return nn.Dropout(self.dropout_rate)(output, deterministic=deterministic)


@dataclasses.dataclass(frozen=True)
class DependencyPlan:
    name: str
    size: int  # with blank offset applied when applicable
    is_output_tap: bool


@dataclasses.dataclass(frozen=True)
class NodePlan:
    name: str
    input_size: int
    projection_size: int  # output size of the time-distributed layer
    output_size: int  # classifier output size (with blank)
    dependencies: Tuple[DependencyPlan, ...]
    attention: Optional[Tuple[int, bool]] = None  # (num_heads, positional_embeddings)
    has_composition: bool = False
    has_allophone: bool = False


@dataclasses.dataclass(frozen=True)
class ProjectionPlan:
    """Static, hashable plan of the hierarchical projection, derived host-side from the
    attribute graph + config (mirrors reference HierarchicalProjection.__init__)."""

    nodes: Tuple[NodePlan, ...]
    blank_offset: int
    dependency_blanks: bool
    acoustic_model_dropout: float
    output_dependencies: Tuple[str, ...]
    # (embedding_size, num_embeddings, category_offsets, unused_category_rows,
    #  training_feature_table_shape)
    composition: Optional[
        Tuple[int, int, Tuple[int, ...], Tuple[int, ...], Tuple[int, int]]
    ] = None
    allophone_shape: Optional[Tuple[int, int, int, int]] = None  # (L, S, P, K)


def build_projection_plan(
    output_features: int,
    attribute_graph: AttributeGraph,
    blank_offset: int,
    projection_config: ProjectionConfig,
    language_allophones: Optional[LanguageAllophoneMappings],
    attribute_indexer: Optional[PhoneticAttributeIndexer],
) -> Tuple[ProjectionPlan, Dict[str, np.ndarray]]:
    """Builds the static plan plus the numpy buffer/static data (composition feature
    table, allophone matrices and gather indices)."""
    config = projection_config
    uses_allophones = (
        language_allophones is not None and config.phoneme_layer != PhonemeLayerType.SHARED
    )
    composition_config: Optional[EmbeddingCompositionConfig] = config.embedding_composition

    dependency_names = set(attribute_graph.names())
    if len(dependency_names) < len(attribute_graph):
        raise ValueError("Dependencies contain duplicate keys")
    if any(ProjectionEntryConfig.OUTPUT_PATTERN.match(name) for name in dependency_names):
        raise ValueError(f"{ProjectionEntryConfig.OUTPUT_DEPENDENCY!r} is a reserved keyword")

    static_data: Dict[str, np.ndarray] = {}
    nodes: List[NodePlan] = []
    required_output_layers = set()
    composition_plan = None
    allophone_shape = None

    for node in attribute_graph.sort():
        input_size = 0
        dependencies = []
        for target in node.dependencies:
            attribute_node = attribute_graph.get(target)
            if attribute_node is None:
                # Acoustic model taps are pseudo-nodes — but only names matching
                # OUTPUT/OUTPUT_<i>; anything else is a typo that would otherwise
                # surface as an opaque KeyError at apply time (the reference
                # validates the same way, acoustic_model.py:362-380).
                if not ProjectionEntryConfig.OUTPUT_PATTERN.match(target):
                    raise ValueError(
                        f"Unknown dependency {target!r} of classifier {node.name!r}:"
                        " not a classifier name or an acoustic-model output tap"
                        f" ({ProjectionEntryConfig.OUTPUT_DEPENDENCY!r}/"
                        f"{ProjectionEntryConfig.OUTPUT_DEPENDENCY!r}_<layer>)"
                    )
                dependencies.append(DependencyPlan(target, output_features, True))
                input_size += output_features
                required_output_layers.add(target)
                continue
            size = attribute_node.size + (blank_offset if config.dependency_blanks else 0)
            dependencies.append(DependencyPlan(attribute_node.name, size, False))
            input_size += size
        if not dependencies:
            raise ValueError("Each class projection requires a dependency")

        is_phoneme_layer = node.name == ProjectionEntryConfig.PHONEME_LAYER
        node_uses_allophones = uses_allophones and is_phoneme_layer

        if node_uses_allophones:
            # Phone inventory (plus blank) is the classifier output; phonemes come out
            # of the allophone pooling.
            output_size = len(language_allophones.shared_phones) + blank_offset
        else:
            output_size = node.size + blank_offset

        if is_phoneme_layer and composition_config is not None:
            projection_size = composition_config.embedding_size
        else:
            projection_size = output_size

        has_composition = is_phoneme_layer and composition_config is not None
        if has_composition:
            if attribute_indexer is None:
                raise ValueError(
                    "Model configuration using attribute embedding composition requires"
                    " an attribute indexer but got `None`"
                )
            if not node_uses_allophones:
                training_attributes = attribute_indexer.full_attributes.subset(
                    attribute_indexer.phonemes.tolist(),
                    list(attribute_indexer.composition_features),
                )
            else:
                if attribute_indexer.allophone_data is None:
                    raise ValueError(
                        "Model configuration using attribute embedding composition and an"
                        " allophone layer requires allophone data in the attribute indexer"
                    )
                training_attributes = attribute_indexer.allophone_data.shared_phone_indexer

            if output_size != len(training_attributes) + 1:
                raise ValueError(
                    f"Length of attributes with blanks ({len(training_attributes) + 1}) need to"
                    f" match the number of phones in the allophone mapping ({output_size})"
                )

            dense_table = training_attributes.dense_feature_table.astype(np.int64)
            # Category counts per feature (+1 blank row at the front), offsets cumsum.
            num_categories = np.concatenate(([0], dense_table.max(axis=0))) + 1
            category_offsets = num_categories.cumsum()[:-1]
            # Unused category rows are zeroed at init (reference :197-212).
            unused = [False]
            for column in range(dense_table.shape[1]):
                counts = np.bincount(dense_table[:, column], minlength=int(num_categories[column + 1]))
                unused.extend(counts == 0)
            unused_rows = np.where(np.asarray(unused))[0]

            composition_plan = (
                composition_config.embedding_size,
                int(num_categories.sum()),
                tuple(int(offset) for offset in category_offsets),
                tuple(int(row) for row in unused_rows),
                (int(dense_table.shape[0]), int(dense_table.shape[1])),
            )
            static_data["composition_feature_table"] = dense_table.astype(np.int32)

        if node_uses_allophones:
            matrix, gather = build_allophone_arrays(language_allophones, blank_offset, node.size)
            static_data["allophone_matrices"] = matrix
            static_data["allophone_gather"] = gather
            allophone_shape = (matrix.shape[0], matrix.shape[1], matrix.shape[2], gather.shape[2])

        attention = None
        if node.time_layer_config is not None:
            attention = (node.time_layer_config.num_heads, node.time_layer_config.positional_embeddings)

        nodes.append(
            NodePlan(
                node.name,
                input_size,
                projection_size,
                output_size,
                tuple(dependencies),
                attention,
                has_composition,
                node_uses_allophones,
            )
        )

    if not required_output_layers:
        raise ValueError(
            f"At least one of the input layers requires {ProjectionEntryConfig.OUTPUT_DEPENDENCY!r}"
            " as a dependency"
        )

    plan = ProjectionPlan(
        tuple(nodes),
        blank_offset,
        config.dependency_blanks,
        config.acoustic_model_dropout,
        tuple(sorted(required_output_layers)),
        composition_plan,
        allophone_shape,
    )
    return plan, static_data


class HierarchicalProjection(nn.Module):
    """Executes a :class:`ProjectionPlan` over acoustic-model hidden states."""

    plan: ProjectionPlan
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        # Classifier submodules keyed by node name. flax derives parameter paths from
        # the attribute path ("classifiers_<name>"), which is deterministic given the
        # topological plan order.
        classifiers = {}
        composition = None
        allophone = None
        for node in self.plan.nodes:
            if node.attention is not None:
                classifiers[node.name] = ProjectingMultiheadAttention(
                    node.projection_size,
                    node.attention[0],
                    node.attention[1],
                    self.plan.acoustic_model_dropout,
                    self.dtype,
                )
            else:
                classifiers[node.name] = nn.Dense(node.projection_size, dtype=self.dtype)
            if node.has_composition:
                embedding_size, num_embeddings, offsets, unused, _ = self.plan.composition
                composition = EmbeddingCompositionLayer(
                    embedding_size, num_embeddings, offsets, unused, self.dtype
                )
            if node.has_allophone:
                languages, shared, phonemes, max_gather = self.plan.allophone_shape
                allophone = AllophoneMapping(languages, shared, phonemes, max_gather, self.dtype)
        self.classifiers = classifiers
        self.composition = composition
        self.allophone = allophone
        if self.plan.composition is not None:
            # Training-time dense feature table; the placeholder has the real shape so
            # init-time forwards trace correctly (values injected post-init).
            table_shape = self.plan.composition[4]
            self.composition_feature_table = self.variable(
                BUFFERS, "composition_feature_table", lambda: jnp.zeros(table_shape, jnp.int32)
            )
        if self.plan.acoustic_model_dropout > 0:
            self.acoustic_dropout = nn.Dropout(self.plan.acoustic_model_dropout)

    def __call__(
        self,
        inputs: Sequence[jnp.ndarray],
        input_lengths,
        language_ids,
        target_feature_indices=None,
        predict: bool = False,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        plan = self.plan
        outputs: Dict[str, jnp.ndarray] = {
            f"{ProjectionEntryConfig.OUTPUT_DEPENDENCY}_{index}": tap for index, tap in enumerate(inputs)
        }
        outputs[ProjectionEntryConfig.OUTPUT_DEPENDENCY] = inputs[-1]

        if plan.acoustic_model_dropout > 0:
            for dependency in plan.output_dependencies:
                outputs[dependency] = self.acoustic_dropout(
                    outputs[dependency], deterministic=deterministic
                )

        projection_outputs: Dict[str, jnp.ndarray] = {}
        for node in plan.nodes:
            if len(node.dependencies) == 1 and node.dependencies[0].is_output_tap:
                dependency_outputs = outputs[node.dependencies[0].name]
            else:
                parts = []
                for dependency in node.dependencies:
                    value = outputs[dependency.name]
                    if dependency.is_output_tap:
                        parts.append(value)
                    else:
                        if not plan.dependency_blanks:
                            value = value[..., plan.blank_offset :]
                        parts.append(nn.softmax(value, axis=-1))
                dependency_outputs = jnp.concatenate(parts, axis=-1)

            layer = self.classifiers[node.name]
            if isinstance(layer, ProjectingMultiheadAttention):
                hidden = layer(dependency_outputs, input_lengths, deterministic)
            else:
                hidden = layer(dependency_outputs)

            if node.has_composition:
                table = (
                    target_feature_indices
                    if target_feature_indices is not None
                    else self.composition_feature_table.value
                )
                hidden = self.composition(hidden, table)

            if node.has_allophone:
                result = self.allophone(hidden, language_ids, predict)
                projection_outputs.update(result)
                outputs.update(result)
            else:
                projection_outputs[node.name] = hidden
                outputs[node.name] = hidden

        return projection_outputs

    def l2_penalty(self):
        if self.allophone is None:
            return None
        return self.allophone.l2_penalty()

    def map_allophones(self, phone_logits, language_ids):
        if self.allophone is None:
            raise ValueError("Can't map phones to allophones with a model without an allophone layer")
        return self.allophone.map_allophones(phone_logits, language_ids)
