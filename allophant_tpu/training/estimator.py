"""Estimator: the public train/predict/save/restore surface.

Counterpart of /root/reference/allophant/estimator.py:931-1126. Library usage mirrors
the reference README flow:

    estimator, indexer = Estimator.restore("path/to/allophant.pt")
    inventory = indexer.phoneme_inventory(["es", "it"])
    predictions = estimator.predict(Batch(audio, lengths, 0),
                                    indexer.composition_feature_matrix(inventory))
    # predictions.outputs[name]: time-first [T, B, C] log-probs (reference layout)

TPU specifics: ``predict`` pads batches into static shape buckets (powers-of-two-ish
audio lengths) and caches one jit-compiled function per (bucket shape, inventory
shape, flags) so repeated calls hit the XLA compilation cache."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from allophant_tpu.config import Config, PhonemeLayerType, Wav2Vec2PretrainedConfig
from allophant_tpu.data.batch import Batch
from allophant_tpu.models.allophant import (
    BuiltModel,
    Predictions,
    attribute_graph_from_config,
    build_model,
    inject_static_data,
)
from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture
from allophant_tpu.phonetics.attribute_graph import AttributeGraph
from allophant_tpu.phonetics.features import PhoneticAttributeIndexer, PhoneticIndexerState
from allophant_tpu.training import checkpoint as checkpoint_module
from allophant_tpu.training.checkpoint import Checkpoint, EpochPosition


def _bucket_length(length: int, minimum: int = 1024) -> int:
    """Rounds a sequence length up to a bucket to bound jit recompiles: powers of two
    below 64k samples, then multiples of 32k (2 s at 16 kHz)."""
    length = max(length, minimum)
    if length <= 65_536:
        return 1 << (length - 1).bit_length()
    step = 32_768
    return ((length + step - 1) // step) * step


def _pack_audio_for_upload(audio: np.ndarray) -> np.ndarray:
    """Halves the host->device audio transfer when it is lossless to do so.

    Raw 16-bit sources reach the model as float32 ``i / 32768`` (data/audio.py:55),
    so the serving path re-packs them to int16 on the host and dequantizes on
    device — exact, because int16->f32 conversion is exact and 2^-15 is a
    power-of-two scale. On high-latency serving links the waveform upload is
    the dominant per-batch cost (batch 128 x 10 s = 82 MB as f32, 41 MB as
    int16). Anything not exactly int16-representable (resampled audio, float
    WAV sources, feature-frontend inputs) uploads unchanged.
    """
    if audio.ndim != 2 or audio.dtype != np.float32:
        return audio
    scaled = audio * 32768.0
    packed = scaled.astype(np.int16)
    if np.array_equal(scaled, packed):
        return packed
    return audio


def _unpack_audio_on_device(audio):
    """Inverse of `_pack_audio_for_upload`, traced inside the serving jits."""
    if audio.dtype == jnp.int16:
        return audio.astype(jnp.float32) * (1.0 / 32768.0)
    return audio


def infer_wav2vec2_architecture(model_state: Dict[str, np.ndarray]) -> Wav2Vec2Architecture:
    """Infers the encoder architecture from a reference checkpoint's state dict
    (hidden size, depth, conv stack, norm mode) — checkpoints store only the HF model
    id, and this environment has no hub access."""
    prefix = "_acoustic_model._model."
    layer_ids = set()
    conv_ids = set()
    for key in model_state:
        if key.startswith(prefix + "encoder.layers."):
            layer_ids.add(int(key[len(prefix + "encoder.layers.") :].split(".")[0]))
        if key.startswith(prefix + "feature_extractor.conv_layers."):
            conv_ids.add(int(key[len(prefix + "feature_extractor.conv_layers.") :].split(".")[0]))

    num_layers = max(layer_ids) + 1
    num_convs = max(conv_ids) + 1
    hidden_size = model_state[prefix + "encoder.layers.0.attention.q_proj.weight"].shape[0]
    intermediate = model_state[prefix + "encoder.layers.0.feed_forward.intermediate_dense.weight"].shape[0]
    conv_dim = tuple(
        model_state[prefix + f"feature_extractor.conv_layers.{i}.conv.weight"].shape[0]
        for i in range(num_convs)
    )
    conv_kernel = tuple(
        model_state[prefix + f"feature_extractor.conv_layers.{i}.conv.weight"].shape[2]
        for i in range(num_convs)
    )
    layer_norm_mode = (
        "layer" if prefix + "feature_extractor.conv_layers.1.layer_norm.weight" in model_state else "group"
    )
    # Pre-norm ("stable") vs post-norm encoders have IDENTICAL parameter key
    # sets in HF wav2vec2 — the difference is norm placement, not names — so
    # the flag cannot be read off the keys. Every released wav2vec2-family
    # config couples the two: group-norm extractor (base) <=> post-norm
    # encoder, per-layer-norm extractor (large/XLS-R) <=> pre-norm encoder.
    stable = layer_norm_mode == "layer"
    defaults = Wav2Vec2Architecture()
    # The positional-conv kernel width and group count are recoverable from the
    # (weight-normed) conv weight: torch Conv1d weight is
    # [out, in/groups, kernel_size].
    pos_prefix = prefix + "encoder.pos_conv_embed.conv"
    pos_weight = None
    for suffix in (".parametrizations.weight.original1", ".weight_v", ".weight"):
        if pos_prefix + suffix in model_state:
            pos_weight = model_state[pos_prefix + suffix]
            break
    if pos_weight is not None:
        num_pos = int(pos_weight.shape[2])
        pos_groups = max(1, int(hidden_size) // int(pos_weight.shape[1]))
    else:
        num_pos = defaults.num_conv_pos_embeddings
        pos_groups = defaults.num_conv_pos_embedding_groups
    base = Wav2Vec2Architecture(
        hidden_size=int(hidden_size),
        num_hidden_layers=int(num_layers),
        num_attention_heads=max(1, int(hidden_size) // 64),
        intermediate_size=int(intermediate),
        conv_dim=conv_dim,
        conv_kernel=conv_kernel,
        conv_stride=defaults.conv_stride[:num_convs],
        conv_bias=prefix + "feature_extractor.conv_layers.0.conv.bias" in model_state,
        feat_extract_norm=layer_norm_mode,
        do_stable_layer_norm=stable,
        num_conv_pos_embeddings=num_pos,
        num_conv_pos_embedding_groups=pos_groups,
    )
    return base


#: Serving precision presets: name -> (dtype, head_dtype, f32_matmul_precision).
#: "float32" is the shipped default (full f32, HIGHEST matmuls — matches the
#: reference's f32 inference, acoustic_model.py:1027-1052). "mixed" runs the
#: encoder in bf16 with the decision-relevant tail (classifier logits,
#: composition/allophone matmuls, log_softmax) in f32. "float32_high" keeps f32
#: activations but lowers matmuls to the 3-pass bf16 lowering. Decision-level
#: safety of the fast presets is measured by ``tools/parity_check.py decisions``.
PRECISION_PRESETS = {
    "float32": (jnp.float32, None, "highest"),
    "float32_high": (jnp.float32, None, "high"),
    "mixed": (jnp.bfloat16, jnp.float32, "highest"),
    "bfloat16": (jnp.bfloat16, None, "highest"),
}

#: The serving preset ``Estimator.restore`` ships when the caller specifies
#: neither ``precision`` nor ``dtype``. "mixed" runs encoder matmuls in bf16
#: with the decision-relevant tail (classifier logits, composition/allophone
#: matmuls, log_softmax) in f32 — the TPU translation of the precision class
#: the reference itself serves in: its package enables TF32 matmul truncation
#: globally on import (reference network/__init__.py:1-6), so reference
#: inference was never full-precision f32 either. Measured on one v5e chip:
#: 3,383 audio-s/s single-head (identical to bf16's 3,390) vs 1,126 for
#: float32_high and far less for full f32 (which cannot finish a bench pass).
#: Decision-level safety on trained logits (parity_check.py decisions
#: --train-steps 150): 0.063% argmax flips; label-PER delta vs the f32 decode
#: is recorded in README.md. ``precision="float32_high"`` restores
#: decision-exact serving (0.000% flips, trained and random) one flag away;
#: ``"float32"`` is the bit-level debugging preset.
DEFAULT_SERVING_PRECISION = "mixed"


def resolve_precision(precision: str):
    try:
        return PRECISION_PRESETS[precision]
    except KeyError:
        raise ValueError(
            f"Unknown precision preset {precision!r} (expected one of {sorted(PRECISION_PRESETS)})"
        ) from None


@dataclasses.dataclass
class Estimator:
    """Model + variables + config wrapper supporting prediction, checkpointing and
    (with a DatasetManager) training."""

    config: Config
    feature_size: int
    sample_rate: int
    attribute_graph: AttributeGraph
    built: BuiltModel
    variables: Dict
    history: List[Any] = dataclasses.field(default_factory=list)
    epoch: EpochPosition = dataclasses.field(default_factory=EpochPosition)
    dataset_meta_data: List[Any] = dataclasses.field(default_factory=list)
    # Serialized optimizer + early-stopping state from a restored checkpoint
    # (``TrainingRun.serialized_training_state`` format); consumed by ``train``.
    training_state: Optional[bytes] = None

    def __post_init__(self):
        self._predict_cache: Dict[Any, Any] = {}
        self._mesh = None

    # ------------------------------------------------------------------
    # Multi-chip inference
    # ------------------------------------------------------------------

    def use_data_parallel(self, mesh=None) -> "Estimator":
        """Shards prediction batches over the ``data`` axis of a device mesh
        (defaults to a 1-D mesh over all local devices). Parameters are replicated;
        XLA partitions the whole forward pass. Batch sizes must divide the data-axis
        size — the bucketed batcher's power-of-two padding guarantees this for
        device counts that are powers of two."""
        if mesh is None:
            from allophant_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(jax.devices(), model_parallel=1)
        self._mesh = mesh
        self._predict_cache.clear()
        return self

    @property
    def model(self):
        return self.built.model

    @property
    def classes(self) -> List[str]:
        return self.model.classes

    @classmethod
    def from_config(
        cls,
        config: Config,
        feature_size: int,
        sample_rate: int,
        attribute_graph: AttributeGraph,
        attribute_indexer: Optional[PhoneticAttributeIndexer] = None,
        wav2vec2_architecture: Optional[Wav2Vec2Architecture] = None,
        load_pretrained_weights: bool = True,
        seed: int = 0,
        dtype=None,
        remat: bool = False,
        precision: Optional[str] = None,
    ) -> "Estimator":
        head_dtype = None
        f32_matmul_precision = "highest"
        if precision is not None:
            dtype, head_dtype, f32_matmul_precision = resolve_precision(precision)
        elif dtype is None:
            # The config's AMP flag (reference config.py:830, torch.cuda.amp in
            # estimator.py:803-806) maps to the "mixed" preset on TPU: bf16
            # matmul regions with the loss-relevant tail (logits, log_softmax,
            # CTC) in f32 — autocast's own policy keeps softmax/loss in f32 too.
            dtype, head_dtype, f32_matmul_precision = resolve_precision(
                "mixed" if config.nn.mixed_precision else "float32"
            )
        built = build_model(
            config.nn,
            feature_size,
            sample_rate,
            attribute_graph,
            attribute_indexer,
            wav2vec2_architecture,
            dtype=dtype,
            remat=remat,
            head_dtype=head_dtype,
            f32_matmul_precision=f32_matmul_precision,
        )
        variables = built.init(jax.random.PRNGKey(seed))
        if load_pretrained_weights and isinstance(config.nn.acoustic_model, Wav2Vec2PretrainedConfig):
            pretrained = _try_load_pretrained_encoder(config.nn.acoustic_model.model_id, built)
            if pretrained is not None:
                variables["params"]["acoustic_model"] = pretrained
        return cls(config, feature_size, sample_rate, attribute_graph, built, variables)

    # ------------------------------------------------------------------
    # Prediction
    # ------------------------------------------------------------------

    def _padded(self, batch: Batch) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        audio = np.asarray(batch.audio_features)
        target = _bucket_length(audio.shape[1])
        if audio.shape[1] < target:
            widths = [(0, 0), (0, target - audio.shape[1])] + [(0, 0)] * (audio.ndim - 2)
            audio = np.pad(audio, widths)
        return audio, np.asarray(batch.lengths), np.asarray(batch.language_ids)

    def _predict_fn(self, feature_shape, log_probabilities: bool, time_major: bool = True):
        key = (feature_shape, log_probabilities, time_major)
        cached = self._predict_cache.get(key)
        if cached is not None:
            return cached

        model = self.model

        def run_impl(variables, audio, lengths, language_ids, target_feature_indices=None):
            audio = _unpack_audio_on_device(audio)
            predictions = model.apply(
                variables, audio, lengths, language_ids, target_feature_indices, predict=True
            )
            outputs = predictions.outputs
            if log_probabilities:
                outputs = {name: jax.nn.log_softmax(value, axis=-1) for name, value in outputs.items()}
            if time_major:
                # Time-first layout for reference API parity. Serving callers
                # that decode batch-first (the predict CLI) pass
                # ``time_major=False`` and skip BOTH transposes — at batch 128
                # the phoneme/phone tracks alone are ~200 MB each per relayout.
                outputs = {name: jnp.transpose(value, (1, 0, 2)) for name, value in outputs.items()}
            return Predictions(outputs, predictions.lengths)

        if self._mesh is None:
            run = jax.jit(run_impl)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            from allophant_tpu.parallel.mesh import DATA_AXIS

            mesh = self._mesh
            replicated = NamedSharding(mesh, PartitionSpec())
            batch_sharded = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            shardings = (replicated, batch_sharded, batch_sharded, batch_sharded)
            if feature_shape is not None:
                shardings = shardings + (replicated,)
            run = jax.jit(run_impl, in_shardings=shardings)

        self._predict_cache[key] = run
        return run

    def _decoded_fn(self, feature_shape, heads: Tuple[str, ...], with_allophone_map: bool):
        """One fused device program: forward + every head's greedy CTC decode +
        the packed uint16 drain grid. The serving CLI's generic path dispatches
        ~80 separate device programs per batch (one forward, per-head decodes,
        collect-time packing ops); on high-latency links each program execution
        costs ~20-30 ms of round trip, which dominates the batch. Fusing keeps
        it to ONE program plus one grid transfer."""
        key = ("decoded", feature_shape, heads, with_allophone_map)
        cached = self._predict_cache.get(key)
        if cached is not None:
            return cached

        model = self.model

        def run_impl(variables, audio, lengths, language_ids, target_feature_indices=None):
            from allophant_tpu.ops.decode import greedy_decode_logits

            audio = _unpack_audio_on_device(audio)
            predictions = model.apply(
                variables, audio, lengths, language_ids, target_feature_indices, predict=True
            )
            outputs = dict(predictions.outputs)
            if with_allophone_map:
                from allophant_tpu.config import ProjectionEntryConfig

                # Map LOG-PROBS, not raw logits: the allophone max-pool
                # multiplies by learned per-allophone weights, so its argmax is
                # NOT invariant to the per-frame log_softmax shift (the generic
                # path and the reference both map log-probs —
                # reference estimator.py:1035-1046 + run.py:755-760).
                outputs[ProjectionEntryConfig.PHONEME_LAYER] = model.apply(
                    variables,
                    jax.nn.log_softmax(
                        outputs[ProjectionEntryConfig.PHONE].astype(jnp.float32), axis=-1
                    ),
                    language_ids,
                    method="map_allophones",
                )
            lanes = []
            for name in heads:
                # Per-head greedy argmax IS invariant to log_softmax (a
                # per-frame monotone shift), so plain heads decode raw logits.
                tokens, _timesteps, counts, _scores = greedy_decode_logits(
                    outputs[name], predictions.lengths
                )
                lanes.append(
                    jnp.concatenate(
                        [counts[:, None], jnp.maximum(tokens, 0)], axis=1
                    ).astype(jnp.uint16)
                )
            return jnp.stack(lanes), predictions.lengths

        if self._mesh is None:
            run = jax.jit(run_impl)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            from allophant_tpu.parallel.mesh import DATA_AXIS

            mesh = self._mesh
            replicated = NamedSharding(mesh, PartitionSpec())
            batch_sharded = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            shardings = (replicated, batch_sharded, batch_sharded, batch_sharded)
            if feature_shape is not None:
                shardings = shardings + (replicated,)
            run = jax.jit(run_impl, in_shardings=shardings)

        self._predict_cache[key] = run
        return run

    def _beam_decoded_fn(
        self, feature_shape, heads: Tuple[str, ...], with_allophone_map: bool,
        beam_width: int,
    ):
        """One fused device program for beam-mode serving: forward + per-head
        log_softmax + the device beam search + device backtrace for EVERY head,
        returning stacked grids. The generic path dispatches ~2 device programs
        per head (search + backtrace) plus collect-time stacking — ~80 program
        executions per batch for the reference-semantics ``predict -b`` over
        all 38 heads; on high-latency links each round trip costs ~20-30 ms.
        Fused: ONE program, and the whole wave drains in two transfers."""
        key = ("beam_decoded", feature_shape, heads, with_allophone_map, beam_width)
        cached = self._predict_cache.get(key)
        if cached is not None:
            return cached

        model = self.model

        def run_impl(variables, audio, lengths, language_ids, target_feature_indices=None):
            from allophant_tpu.ops.decode import backtrace_beams_device, beam_search_device

            audio = _unpack_audio_on_device(audio)
            predictions = model.apply(
                variables, audio, lengths, language_ids, target_feature_indices, predict=True
            )
            # Beam scores are reported in the JSONL n-best records, so every
            # head decodes LOG-PROBS like the generic predict path
            # (log_probabilities=True) — rankings are shift-invariant but the
            # reported scores are not.
            outputs = {
                name: jax.nn.log_softmax(value.astype(jnp.float32), axis=-1)
                for name, value in predictions.outputs.items()
            }
            if with_allophone_map:
                from allophant_tpu.config import ProjectionEntryConfig

                outputs[ProjectionEntryConfig.PHONEME_LAYER] = model.apply(
                    variables,
                    outputs[ProjectionEntryConfig.PHONE],
                    language_ids,
                    method="map_allophones",
                )
            collected_stack = []
            score_stack = []
            for name in heads:
                parents, emitted, scores = beam_search_device(
                    outputs[name], predictions.lengths, beam_width, 0
                )
                collected = backtrace_beams_device(parents, emitted, predictions.lengths)
                collected_stack.append(collected.astype(jnp.int16))
                score_stack.append(scores)
            return (
                jnp.stack(collected_stack),
                jnp.stack(score_stack),
                predictions.lengths,
            )

        if self._mesh is None:
            run = jax.jit(run_impl)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            from allophant_tpu.parallel.mesh import DATA_AXIS

            mesh = self._mesh
            replicated = NamedSharding(mesh, PartitionSpec())
            batch_sharded = NamedSharding(mesh, PartitionSpec(DATA_AXIS))
            shardings = (replicated, batch_sharded, batch_sharded, batch_sharded)
            if feature_shape is not None:
                shardings = shardings + (replicated,)
            run = jax.jit(run_impl, in_shardings=shardings)
        self._predict_cache[key] = run
        return run

    def predict_beam_decoded(
        self,
        batch: Batch,
        target_feature_indices: Optional[np.ndarray] = None,
        heads: Tuple[str, ...] = (),
        beam_width: int = 4,
        map_allophones: bool = False,
    ):
        """Fused beam serving step: returns DEVICE arrays ``(collected, scores,
        lengths)`` where ``collected`` is int16 [H, T, B, K] (token emitted at
        step t by beam k of row b for head ``heads[h]``, -1 = none — the
        :func:`backtrace_beams_device` layout) and ``scores`` is f32 [H, B, K].
        Arrays stay on device so callers can pipeline; two ``np.asarray`` calls
        drain the whole wave."""
        audio, lengths, language_ids = self._padded(batch)
        feature_shape = None
        if target_feature_indices is not None:
            target_feature_indices = jnp.asarray(np.asarray(target_feature_indices))
            feature_shape = tuple(target_feature_indices.shape)
        run = self._beam_decoded_fn(feature_shape, tuple(heads), map_allophones, beam_width)
        audio, lengths, language_ids = (
            jnp.asarray(_pack_audio_for_upload(audio)),
            jnp.asarray(lengths),
            jnp.asarray(language_ids),
        )
        if target_feature_indices is None:
            return run(self.variables, audio, lengths, language_ids)
        return run(self.variables, audio, lengths, language_ids, target_feature_indices)

    def predict_decoded(
        self,
        batch: Batch,
        target_feature_indices: Optional[np.ndarray] = None,
        heads: Tuple[str, ...] = (),
        map_allophones: bool = False,
    ):
        """Fused greedy serving step: returns (grid, lengths) DEVICE arrays
        where ``grid`` is uint16 [H, B, T'+1] — per head ``heads[h]``, row b:
        column 0 the decoded token count, columns 1.. the blank-free collapsed
        token ids. Arrays stay on device so callers can pipeline batches; one
        ``np.asarray(grid)`` drains the whole wave."""
        audio, lengths, language_ids = self._padded(batch)
        feature_shape = None
        if target_feature_indices is not None:
            target_feature_indices = jnp.asarray(np.asarray(target_feature_indices))
            feature_shape = tuple(target_feature_indices.shape)
        run = self._decoded_fn(feature_shape, tuple(heads), map_allophones)
        audio, lengths, language_ids = (
            jnp.asarray(_pack_audio_for_upload(audio)),
            jnp.asarray(lengths),
            jnp.asarray(language_ids),
        )
        if target_feature_indices is None:
            return run(self.variables, audio, lengths, language_ids)
        return run(self.variables, audio, lengths, language_ids, target_feature_indices)

    def predict(
        self,
        batch: Batch,
        target_feature_indices: Optional[np.ndarray] = None,
        log_probabilities: bool = True,
        time_major: bool = True,
    ) -> Predictions:
        """Inference over a batch; outputs are time-first [T, B, C] per task, matching
        the reference decode flow (``outputs[name].transpose(1, 0)`` before decoding).
        ``time_major=False`` returns batch-first outputs (the serving layout the
        device decoders consume directly)."""
        audio, lengths, language_ids = self._padded(batch)
        feature_shape = None
        if target_feature_indices is not None:
            target_feature_indices = jnp.asarray(np.asarray(target_feature_indices))
            feature_shape = tuple(target_feature_indices.shape)
        run = self._predict_fn(feature_shape, log_probabilities, time_major)
        audio, lengths, language_ids = (
            jnp.asarray(_pack_audio_for_upload(audio)),
            jnp.asarray(lengths),
            jnp.asarray(language_ids),
        )
        if target_feature_indices is None:
            return run(self.variables, audio, lengths, language_ids)
        return run(self.variables, audio, lengths, language_ids, target_feature_indices)

    def map_allophones(self, phone_logits, language_ids, time_major: bool = True):
        """Maps raw phone log-probs to per-language phoneme log-probs (time-first in,
        time-first out by default, matching the reference predict flow;
        ``time_major=False`` takes and returns batch-first serving layout)."""
        phone_logits = jnp.asarray(phone_logits)
        batch_first = (
            jnp.transpose(phone_logits, (1, 0, 2)) if time_major else phone_logits
        )
        mapped = self.model.apply(
            self.variables, batch_first, jnp.asarray(language_ids), method="map_allophones"
        )
        return jnp.transpose(mapped, (1, 0, 2)) if time_major else mapped

    def downsampled_lengths(self, lengths):
        if isinstance(self.built.model.acoustic_config, Wav2Vec2Architecture):
            return self.built.model.acoustic_config.downsampled_lengths(np.asarray(lengths))
        return self.model.apply(self.variables, np.asarray(lengths), method="downsampled_lengths")

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------

    def train(
        self,
        dataset_manager,
        tensorboard_dir: Optional[str] = None,
        skip_batches: int = 0,
        show_progress: bool = False,
    ):
        """Returns a `TrainingRun` — an iterable yielding `(TrainingStatus,
        EpochStatistics)` per validation point (reference estimator.py:1001-1033).
        Variables are updated in place so callers can checkpoint between yields.
        A restored checkpoint's optimizer/early-stopping state (``training_state``)
        is resumed so Adam moments and the warmup schedule continue exactly
        (reference estimator.py:190-194). ``skip_batches`` skips already-consumed
        batches of the current epoch; pass ``self.epoch.step`` to resume mid-epoch."""
        from allophant_tpu.training.run import TrainingRun

        return TrainingRun(
            self, dataset_manager, tensorboard_dir, skip_batches, self.training_state,
            show_progress,
        )

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------

    def save(
        self,
        file_path: str,
        optimizer_state: Optional[bytes] = None,
        phonetic_indexer_state: Optional[PhoneticIndexerState] = None,
        additional_parameters: Optional[Dict[str, Any]] = None,
    ) -> None:
        checkpoint_module.save_native(
            Checkpoint(
                config=self.config,
                feature_size=self.feature_size,
                sample_rate=self.sample_rate,
                attribute_graph=self.attribute_graph,
                epoch=self.epoch,
                phonetic_indexer_state=phonetic_indexer_state,
                variables=self.variables,
                optimizer_state=optimizer_state,
                history=self.history,
                dataset_meta_data=self.dataset_meta_data,
                additional=additional_parameters,
            ),
            file_path,
        )

    @classmethod
    def restore(
        cls,
        checkpoint: Checkpoint | str,
        dtype=None,
        wav2vec2_architecture: Optional[Wav2Vec2Architecture] = None,
        remat: bool = False,
        precision: Optional[str] = None,
        **_kwargs,
    ) -> Tuple["Estimator", PhoneticAttributeIndexer]:
        """Restores from a native or reference checkpoint (path, HF model id from the
        local cache, or parsed ``Checkpoint``); returns the estimator and the phonetic
        indexer rebuilt from the embedded state (reference estimator.py:1085-1126).

        ``precision`` selects a serving preset (see :data:`PRECISION_PRESETS`);
        with neither ``precision`` nor ``dtype`` given, the shipped default is
        :data:`DEFAULT_SERVING_PRECISION` ("mixed" — see its rationale there).
        Pass ``precision="float32_high"`` for decision-exact serving or
        ``"float32"`` for bit-level reference-exact numerics; an explicit
        ``dtype`` keeps the old single-dtype behavior.

        Reference-API compatibility: the second positional argument may be a torch
        device string ("cpu"/"cuda"/...) — JAX manages placement, so it is accepted
        and ignored rather than treated as a dtype."""
        if isinstance(dtype, str):
            dtype = None
        if dtype is None and precision is None:
            precision = DEFAULT_SERVING_PRECISION
        if not isinstance(checkpoint, Checkpoint):
            checkpoint = checkpoint_module.load_checkpoint(checkpoint)

        indexer = PhoneticAttributeIndexer.from_config(
            checkpoint.config, state_dict=checkpoint.phonetic_indexer_state
        )

        if wav2vec2_architecture is None and isinstance(
            checkpoint.config.nn.acoustic_model, Wav2Vec2PretrainedConfig
        ):
            if checkpoint.reference_model_state is not None:
                wav2vec2_architecture = infer_wav2vec2_architecture(checkpoint.reference_model_state)

        estimator = cls.from_config(
            checkpoint.config,
            checkpoint.feature_size,
            checkpoint.sample_rate,
            checkpoint.attribute_graph,
            indexer,
            wav2vec2_architecture,
            load_pretrained_weights=False,
            dtype=dtype,
            remat=remat,
            precision=precision,
        )
        if checkpoint.variables is not None:
            # Native checkpoint: variables restored wholesale onto the initialized
            # structure (shape-checked by flax serialization).
            from flax import serialization

            estimator.variables = serialization.from_state_dict(
                estimator.variables, checkpoint.variables
            )
        elif checkpoint.reference_model_state is not None:
            params = checkpoint_module.convert_reference_model_state(
                checkpoint.reference_model_state,
                estimator.built.model.plan,
                wav2vec2_architecture,
                acoustic_config=checkpoint.config.nn.acoustic_model,
            )
            _check_tree_shapes(estimator.variables["params"], params)
            estimator.variables["params"] = jax.tree_util.tree_map(jnp.asarray, params)

        # Commit the restored weights to the device ONCE. Checkpoint loading
        # leaves numpy leaves in the tree, and jit re-transfers numpy arguments
        # on EVERY call — on the tunneled TPU backend that re-uploads the full
        # ~1.3 GB parameter set per predict batch (~20 s/batch, measured; the
        # profile showed jit input transfer dominating the serving loop).
        estimator.variables = jax.tree_util.tree_map(jnp.asarray, estimator.variables)

        estimator.epoch = checkpoint.epoch
        estimator.history = checkpoint.history
        estimator.training_state = checkpoint.optimizer_state
        return estimator, indexer


def _check_tree_shapes(expected: Dict, actual: Dict, path: str = "") -> None:
    expected_flat = {
        "/".join(map(str, key)): value.shape
        for key, value in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    actual_flat = {
        "/".join(map(str, key)): np.asarray(value).shape
        for key, value in jax.tree_util.tree_flatten_with_path(actual)[0]
    }
    missing = set(expected_flat) - set(actual_flat)
    extra = set(actual_flat) - set(expected_flat)
    if missing or extra:
        raise ValueError(f"Checkpoint parameter mismatch. Missing: {sorted(missing)[:8]}; extra: {sorted(extra)[:8]}")
    for key, shape in expected_flat.items():
        if actual_flat[key] != shape:
            raise ValueError(f"Shape mismatch for {key}: checkpoint {actual_flat[key]} vs model {shape}")


def _try_load_pretrained_encoder(model_id: str, built: BuiltModel) -> Optional[Dict]:
    """Loads HF wav2vec2 encoder weights from the local cache if available (no
    network egress in this environment); returns None on any failure."""
    try:
        import torch
        from transformers import Wav2Vec2Model as TorchWav2Vec2

        from allophant_tpu.models.hf_conversion import convert_wav2vec2_state

        model = TorchWav2Vec2.from_pretrained(model_id, local_files_only=True)
        state = {key: value.numpy() for key, value in model.state_dict().items()}
        return convert_wav2vec2_state(state, built.model.acoustic_config)
    except Exception:
        return None
