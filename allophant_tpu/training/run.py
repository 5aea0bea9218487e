"""High-level training runtime: dataset manager, epoch/step loop, validation, early
stopping, unfreeze schedule, profiling and metrics.

Counterpart of the reference's `Estimator.train` / `TrainingRun` / `DatasetManager` /
`EarlyStopping` (reference estimator.py:108-132, 287-402, 486-928) recast for
XLA: the inner loop is one jit-compiled SPMD train step over stacked microbatches
(`allophant_tpu.training.train_step`), batches are statically bucketed so the jit
cache stays small, and accumulation groups are stacked on a leading axis instead of
drained from a Python list. Yields `(TrainingStatus, EpochStatistics)` per
validation point exactly like the reference's generator-of-epochs API."""

from __future__ import annotations

import dataclasses
import math
import time
from enum import Enum
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from allophant_tpu.config import BatchingMode, Config, ProfilingConfig
from allophant_tpu.data.batch import LabeledBatch
from allophant_tpu.data.batching import Batcher
from allophant_tpu.data.dataset import (
    BatchType,
    PhonemeDataset,
    PhoneticallySegmentedDataset,
    SamplesProcessor,
    TranscribedDataset,
)
from allophant_tpu.data.speech_corpus import MultilingualCorpus, MultilingualSplits
from allophant_tpu.phonetics.attribute_graph import AttributeGraph
from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
from allophant_tpu.training.train_step import (
    FreezePlan,
    build_freeze_plan,
    build_loss_plan,
    create_optimizer,
    make_eval_step,
    make_train_step,
)
from allophant_tpu.utils import progress_bar


class TrainingStatus(Enum):
    """Yielded alongside statistics by `TrainingRun` (reference estimator.py:884-928)."""

    STEP = "step"
    EPOCH = "epoch"
    IMPROVED = "improved"
    EARLY_STOPPED = "early_stopped"
    FINISHED = "finished"
    # Graceful preemption: `TrainingRun.request_stop` was called (e.g. from a
    # SIGTERM handler); the loop finished the in-flight step, synced all state
    # back to the estimator and stopped without running validation. Callers
    # should checkpoint unconditionally on this status — the run resumes
    # exactly (optimizer moments, schedule counter, mid-epoch batch position).
    INTERRUPTED = "interrupted"


@dataclasses.dataclass
class EarlyStopping:
    """Patience-based early stopping on validation loss (reference estimator.py:108-132)."""

    patience: Optional[int] = None
    best_loss: float = math.inf
    stagnation: int = 0

    def update(self, validation_loss: float) -> bool:
        """Records a validation result; returns True if it improved on the best."""
        if validation_loss < self.best_loss:
            self.best_loss = validation_loss
            self.stagnation = 0
            return True
        self.stagnation += 1
        return False

    @property
    def should_stop(self) -> bool:
        # Stop as soon as stagnation REACHES patience (reference
        # estimator.py:132 compares ==); `>` would train one extra stagnant
        # validation window.
        return self.patience is not None and self.stagnation >= self.patience

    def state_dict(self) -> Dict[str, Any]:
        return {"best_loss": self.best_loss, "stagnation": self.stagnation}

    def load_state_dict(self, state: Dict[str, Any]) -> None:
        self.best_loss = state["best_loss"]
        self.stagnation = state["stagnation"]


@dataclasses.dataclass
class EpochStatistics:
    """Per-validation-point statistics with wall-clock deltas (reference
    estimator.py:170-187)."""

    epoch: int
    global_step: int
    train_loss: float
    classifier_losses: Dict[str, float]
    validation_loss: Optional[float] = None
    validation_classifier_losses: Optional[Dict[str, float]] = None
    learning_rate: Optional[float] = None
    gradient_norm: Optional[float] = None
    batch_count: int = 0
    utterance_count: int = 0
    duration_seconds: float = 0.0

    def __str__(self) -> str:
        parts = [
            f"epoch {self.epoch} step {self.global_step}:",
            f"train loss {self.train_loss:.4f}",
        ]
        if self.validation_loss is not None:
            parts.append(f"validation loss {self.validation_loss:.4f}")
        if self.learning_rate is not None:
            parts.append(f"lr {self.learning_rate:.3e}")
        parts.append(f"({self.batch_count} batches, {self.duration_seconds:.1f}s)")
        return " ".join(parts)


class _MeanAccumulator:
    """Accumulates label-count-normalized loss sums over batches."""

    def __init__(self) -> None:
        self.loss_sum = 0.0
        self.label_count = 0.0
        self.head_sums: Dict[str, float] = {}

    def add(self, metrics: Dict[str, Any]) -> None:
        self.loss_sum += float(metrics["loss_sum"] if "loss_sum" in metrics else metrics["loss"])
        self.label_count += float(metrics["label_count"])
        for name, value in metrics.items():
            if name in ("loss_sum", "loss", "label_count", "mean_loss", "grad_norm"):
                continue
            self.head_sums[name] = self.head_sums.get(name, 0.0) + float(value)

    @property
    def mean_loss(self) -> float:
        return self.loss_sum / max(self.label_count, 1.0)

    def head_means(self) -> Dict[str, float]:
        scale = max(self.label_count, 1.0)
        return {name: value / scale for name, value in self.head_sums.items()}


# ---------------------------------------------------------------------------
# Dataset manager
# ---------------------------------------------------------------------------


# Audio-sample bucket for training shapes: lengths round up to multiples of 2 s at
# 16 kHz so the jit cache sees ~15 shapes for <=30 s utterances instead of hundreds.
# Only used when the acoustic model downsamples raw audio (wav2vec2's conv stack);
# models that consume the input at frame rate bucket by FRAME_LENGTH_MULTIPLE.
TRAIN_LENGTH_MULTIPLE = 32_000
FRAME_LENGTH_MULTIPLE = 128
# Label-length bucket (CTC target axis).
TRAIN_LABEL_MULTIPLE = 32


def default_length_multiple(config: Config) -> int:
    """Length bucket by acoustic model: second-scale sample buckets for the
    heavily-downsampling wav2vec2 conv frontend, frame-scale buckets otherwise
    (the from-scratch transformer attends at input rate)."""
    from allophant_tpu.config import Wav2Vec2Config, Wav2Vec2PretrainedConfig

    if isinstance(config.nn.acoustic_model, (Wav2Vec2Config, Wav2Vec2PretrainedConfig)):
        return TRAIN_LENGTH_MULTIPLE
    return FRAME_LENGTH_MULTIPLE


@dataclasses.dataclass
class DatasetManager:
    """Couples config + corpus splits + the samples processor; builds training and
    validation batchers and the attribute graph (reference estimator.py:287-402)."""

    config: Config
    splits: MultilingualSplits
    processor: SamplesProcessor
    train_dataset: PhonemeDataset
    validation_dataset: Optional[PhonemeDataset]
    train_lengths: Optional[np.ndarray] = None
    validation_lengths: Optional[np.ndarray] = None
    length_multiple: int = TRAIN_LENGTH_MULTIPLE
    label_multiple: int = TRAIN_LABEL_MULTIPLE
    # None -> single prefetch thread; N >= 1 -> N batch-building worker processes
    # (reference DataLoader workers, batching.py:302-311); 0 -> synchronous.
    data_workers: Optional[int] = None

    @property
    def attribute_indexer(self) -> PhoneticAttributeIndexer:
        return self.processor.attribute_indexer

    @property
    def feature_size(self) -> int:
        return self.processor.feature_size

    @property
    def split_batch_size(self) -> int:
        """Per-microbatch size: the configured batch budget divided by the
        accumulation factor (reference estimator.py:252-256)."""
        architecture = self.config.nn
        split = architecture.batch_size // max(architecture.accumulation_factor, 1)
        return max(split, 1)

    def attribute_graph(self) -> AttributeGraph:
        from allophant_tpu.models.allophant import attribute_graph_from_config

        return attribute_graph_from_config(self.config, self.attribute_indexer)

    def _batcher(self) -> Batcher:
        architecture = self.config.nn
        return Batcher(
            self.split_batch_size,
            architecture.batching_mode,
            architecture.language_oversampling_factor,
            data_workers=self.data_workers,
            length_multiple=self.length_multiple,
            label_multiple=self.label_multiple,
        )

    def training_batches(
        self,
        seed: Optional[int] = None,
        skip_batches: int = 0,
        process_shard=None,
        shard_multiple: int = 1,
    ):
        return self._batcher().batches(
            self.train_dataset,
            self.train_lengths,
            shuffle=True,
            seed=self.config.nn.seed if seed is None else seed,
            skip_batches=skip_batches,
            process_shard=process_shard,
            shard_multiple=shard_multiple,
        )

    def validation_batches(self):
        if self.validation_dataset is None:
            return iter(())
        batcher = Batcher(
            self.split_batch_size,
            self.config.nn.batching_mode,
            data_workers=self.data_workers,
            length_multiple=self.length_multiple,
            label_multiple=self.label_multiple,
        )
        return batcher.batches(self.validation_dataset, self.validation_lengths)

    @classmethod
    def from_config(
        cls,
        config: Config,
        splits: MultilingualSplits,
        attribute_indexer: PhoneticAttributeIndexer,
        sample_rate: int = 16_000,
        train_features=None,
        validation_features=None,
        train_lengths: Optional[np.ndarray] = None,
        validation_lengths: Optional[np.ndarray] = None,
        length_multiple: int | None = None,
        label_multiple: int = TRAIN_LABEL_MULTIPLE,
        data_workers: Optional[int] = None,
    ) -> "DatasetManager":
        processor = SamplesProcessor.from_config(config, sample_rate, attribute_indexer)

        def build(corpus: MultilingualCorpus, features, inventories=None):
            if not len(corpus):
                return None
            if corpus.UTTERANCE_TYPE == "phonetically-segmented":
                return PhoneticallySegmentedDataset(
                    BatchType.INDEXED, corpus, processor, 1, features, inventories
                )
            return TranscribedDataset(
                BatchType.INDEXED, corpus, processor, 1, features, inventories
            )

        train_dataset = build(splits.train, train_features)
        if train_dataset is None:
            raise ValueError("Training split is empty")
        # Dev labels are filtered to the training vocabulary so CTC targets stay in
        # range (reference estimator.py:322-330).
        train_phonemes = set(attribute_indexer.attributes.phonemes)
        dev_inventories = {
            splits.dev.language_id(language): train_phonemes for language in splits.dev.languages
        } or None
        validation_dataset = build(splits.dev, validation_features, dev_inventories)

        if length_multiple is None:
            length_multiple = default_length_multiple(config)

        if train_lengths is None:
            train_lengths = _maybe_lengths(splits.train)
        if validation_lengths is None and validation_dataset is not None:
            validation_lengths = _maybe_lengths(splits.dev)

        return cls(
            config,
            splits,
            processor,
            train_dataset,
            validation_dataset,
            train_lengths,
            validation_lengths,
            length_multiple,
            label_multiple,
            data_workers,
        )


def _maybe_lengths(corpus: MultilingualCorpus) -> Optional[np.ndarray]:
    """Per-utterance frame lengths if the corpus can provide them cheaply (audio
    header probing), required for frame-budget batching."""
    reader = getattr(corpus, "read_lengths", None)
    if reader is None:
        return None
    try:
        lengths: List[int] = []
        for _language, generator in reader():
            lengths.extend(generator)
        return np.asarray(lengths, dtype=np.int64)
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Microbatch stacking
# ---------------------------------------------------------------------------


def batch_to_arrays(batch: LabeledBatch) -> Dict[str, np.ndarray]:
    """Flattens a labeled batch into the dict layout the train step consumes.

    Filler rows (batch padding for even sharding) are marked by length 0; they
    become zero ``row_weights`` so they contribute nothing to any loss, and their
    lengths are clamped to 1 to keep the masking math valid."""
    lengths = np.asarray(batch.lengths, dtype=np.int32)
    arrays: Dict[str, np.ndarray] = {
        "audio": np.asarray(batch.audio_features, dtype=np.float32),
        "lengths": np.maximum(lengths, 1),
        "language_ids": np.asarray(batch.language_ids, dtype=np.int32),
        "row_weights": (lengths > 0).astype(np.float32),
    }
    for name, labels in batch.attribute_indices.items():
        arrays[f"labels_{name}"] = np.asarray(labels, dtype=np.int32)
        arrays[f"label_lengths_{name}"] = np.asarray(batch.label_lengths[name], dtype=np.int32)
    return arrays


def stack_microbatches(batches: List[LabeledBatch]) -> Dict[str, np.ndarray]:
    """Stacks an accumulation group on a leading axis, padding members to the group
    maximum along batch/time/label axes (bucketing makes shapes mostly equal)."""
    dicts = [batch_to_arrays(batch) for batch in batches]
    keys = dicts[0].keys()
    stacked: Dict[str, np.ndarray] = {}
    for key in keys:
        arrays = [entry[key] for entry in dicts]
        target_shape = tuple(
            max(array.shape[axis] for array in arrays) for axis in range(arrays[0].ndim)
        )
        padded = []
        for array in arrays:
            if array.shape != target_shape:
                widths = [(0, target - size) for size, target in zip(array.shape, target_shape)]
                array = np.pad(array, widths)
            padded.append(array)
        stacked[key] = np.stack(padded)
    # Rows created by batch-axis padding arrive with zeros everywhere: their
    # row_weights stay 0 (np.pad) so they carry no loss, and their lengths are
    # clamped so downstream masking math stays valid.
    stacked["lengths"] = np.maximum(stacked["lengths"], 1)
    return stacked


def _group(iterator: Iterator, size: int, drop_last: bool) -> Iterator[List]:
    group: List = []
    for item in iterator:
        group.append(item)
        if len(group) == size:
            yield group
            group = []
    if group and not drop_last:
        yield group


# ---------------------------------------------------------------------------
# Profiling
# ---------------------------------------------------------------------------


class _StackSampler:
    """Sampling profiler for the main thread: collapsed-stack output compatible
    with flamegraph.pl / speedscope (the analogue of the reference's
    ``export_stacks(path, "self_cpu_time_total")``, estimator.py:405-418)."""

    def __init__(self, interval_seconds: float = 0.005) -> None:
        import threading

        self._interval = interval_seconds
        self._counts: Dict[str, int] = {}
        self._stop_event = threading.Event()
        self._target = threading.main_thread().ident
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        import sys

        while not self._stop_event.wait(self._interval):
            frame = sys._current_frames().get(self._target)
            if frame is None:
                continue
            stack = []
            while frame is not None:
                code = frame.f_code
                stack.append(f"{code.co_name} ({code.co_filename}:{frame.f_lineno})")
                frame = frame.f_back
            key = ";".join(reversed(stack))
            self._counts[key] = self._counts.get(key, 0) + 1

    def write(self, path: str) -> None:
        self._stop_event.set()
        self._thread.join(timeout=1.0)
        with open(path, "w", encoding="utf-8") as file:
            for stack, count in sorted(self._counts.items()):
                file.write(f"{stack} {count}\n")


class StepProfiler:
    """Profiling over a step window (reference estimator.py:405-418, 829-842 used
    torch.profiler with wait=1/warmup=2/active=N): a jax.profiler device trace
    into ``tensorboard_dir`` (or ``<flame_graph_path_gpu>.trace`` — device
    timelines replace CUDA stack export on TPU), plus a sampled host-CPU
    flame graph in collapsed-stack format at ``flame_graph_path_cpu``."""

    WAIT_STEPS = 3

    def __init__(self, config: Optional[ProfilingConfig]) -> None:
        self._config = config
        self._active = False
        self._sampler: Optional[_StackSampler] = None
        self._trace_dir = None
        enabled = config is not None and (
            config.tensorboard_dir or config.flame_graph_path_cpu or config.flame_graph_path_gpu
        )
        self._done = not enabled

    def step(self, global_step: int) -> None:
        if self._done:
            return
        if not self._active and global_step >= self.WAIT_STEPS:
            trace_dir = self._config.tensorboard_dir
            if trace_dir is None and self._config.flame_graph_path_gpu:
                trace_dir = self._config.flame_graph_path_gpu + ".trace"
            if trace_dir:
                jax.profiler.start_trace(trace_dir)
            self._trace_dir = trace_dir
            if self._config.flame_graph_path_cpu:
                self._sampler = _StackSampler()
            self._active = True
            self._stop_at = global_step + max(self._config.active_steps, 1)
        elif self._active and global_step >= self._stop_at:
            self.stop()

    def stop(self) -> None:
        if self._active:
            if self._trace_dir:
                jax.profiler.stop_trace()
            if self._sampler is not None:
                self._sampler.write(self._config.flame_graph_path_cpu)
                self._sampler = None
            self._active = False
        self._done = True


class MetricsLogger:
    """Optional TensorBoard logging (reference estimator.py:521-565)."""

    def __init__(self, log_dir: Optional[str]) -> None:
        self._writer = None
        if log_dir:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir)

    def log_step(self, step: int, metrics: Dict[str, float], prefix: str = "training") -> None:
        if self._writer is None:
            return
        for name, value in metrics.items():
            self._writer.add_scalar(f"{prefix}/{name}", value, step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


# ---------------------------------------------------------------------------
# Training run
# ---------------------------------------------------------------------------


def _unpack_training_state(data: bytes) -> Dict[str, Any]:
    """Decodes the bundled training state written by
    ``TrainingRun.serialized_training_state``. Raw flax-serialized optax bytes
    (no msgpack envelope with a ``format`` key) are accepted for forward
    compatibility with externally produced checkpoints."""
    import msgpack

    try:
        decoded = msgpack.unpackb(data, raw=False)
    except Exception:
        return {"optimizer": data}
    if isinstance(decoded, dict) and "format" in decoded:
        return decoded
    return {"optimizer": data}


class TrainingRun:
    """Iterable training loop yielding `(TrainingStatus, EpochStatistics)` at every
    validation point (each `step_size` updates if configured, else per epoch), with
    a trailing `(FINISHED | EARLY_STOPPED, stats)` (reference estimator.py:800-928).

    Mutates the estimator's variables in place after every yield so callers can
    checkpoint between epochs exactly like the reference CLI does."""

    def __init__(
        self,
        estimator,
        dataset_manager: DatasetManager,
        tensorboard_dir: Optional[str] = None,
        skip_batches: int = 0,
        training_state: Optional[bytes] = None,
        show_progress: bool = False,
    ) -> None:
        self._show_progress = show_progress
        self._estimator = estimator
        self._manager = dataset_manager
        self._config = estimator.config
        architecture = self._config.nn
        self._accumulation = max(architecture.accumulation_factor, 1)
        self._skip_batches = skip_batches

        model = estimator.built.model
        d_model = _model_size(estimator)
        self._optimizer = create_optimizer(architecture, d_model)
        loss_plan = build_loss_plan(architecture, model.plan.allophone_shape is not None)
        freeze_plan = build_freeze_plan(architecture.acoustic_model)
        # Data-parallel training over every visible chip: microbatches shard
        # their batch axis over a 1-D "data" mesh and XLA inserts the gradient
        # psums over ICI/DCN. Multi-host pods use process-sharded loading: each
        # process draws the same deterministic batch sequence but materializes
        # audio only for its contiguous row slice
        # (Batcher._generate_process_slices), and
        # `jax.make_array_from_process_local_data` assembles the global batch.
        # Single-host row divisibility is checked per step (frame-budget
        # batching yields variable sizes); multi-host batches are padded to the
        # device count up front with zero-weight filler rows.
        self._mesh = None
        self._multi_host = jax.process_count() > 1
        if jax.device_count() > 1:
            from allophant_tpu.parallel.mesh import create_mesh

            self._mesh = create_mesh(model_parallel=1)
        self._train_step = jax.jit(
            make_train_step(model, self._optimizer, loss_plan, freeze_plan), donate_argnums=(0, 1)
        )
        self._eval_step = jax.jit(make_eval_step(model, loss_plan))
        self._lr_schedule = (
            architecture.lr_schedule.schedule(d_model) if architecture.lr_schedule else None
        )

        self.early_stopping = EarlyStopping(architecture.early_stopping_patience)
        self.global_step = int(estimator.epoch.global_step or 0)
        self._profiler = StepProfiler(self._config.profiling)
        self._metrics = MetricsLogger(tensorboard_dir)
        self.optimizer_state = None
        self._stop_requested = False
        # Serialized optax state from a restored checkpoint: deserialized lazily in
        # __iter__ once the optimizer template exists (reference training resumes
        # Adam moments and the warmup schedule counter, estimator.py:190-194).
        self._restored_optimizer_bytes: Optional[bytes] = None
        if training_state is not None:
            restored = _unpack_training_state(training_state)
            self._restored_optimizer_bytes = restored.get("optimizer")
            early_stopping_state = restored.get("early_stopping")
            if early_stopping_state is not None:
                self.early_stopping.load_state_dict(early_stopping_state)

    def request_stop(self) -> None:
        """Asks the loop to stop at the next step boundary (async-signal safe:
        only sets a flag). The generator then yields one final
        ``(INTERRUPTED, statistics)`` — with every piece of resumable state
        synced to the estimator — and returns. On multi-host topologies the
        decision is process 0's, broadcast at each step so every process stops
        after the same update and collectives never desynchronize."""
        self._stop_requested = True

    def serialized_training_state(self) -> Optional[bytes]:
        """Bundles the live optax state and early-stopping progress for
        checkpointing; pass the result to ``Estimator.save(optimizer_state=...)``.
        Returns None before the first optimizer update."""
        import msgpack
        from flax import serialization

        if self.optimizer_state is None and self._restored_optimizer_bytes is None:
            return None
        if self.optimizer_state is not None:
            optimizer_bytes = serialization.to_bytes(
                jax.tree_util.tree_map(np.asarray, self.optimizer_state)
            )
        else:
            optimizer_bytes = self._restored_optimizer_bytes
        return msgpack.packb(
            {
                "format": 1,
                "optimizer": optimizer_bytes,
                "early_stopping": self.early_stopping.state_dict(),
            },
            use_bin_type=True,
        )

    def _variables(self) -> Tuple[Dict, Dict]:
        variables = dict(self._estimator.variables)
        params = variables.pop("params")
        return params, variables

    def _sync_back(self, params) -> None:
        self._estimator.variables = {**self._estimator.variables, "params": params}

    def _validate(self, params, other_variables) -> Optional[_MeanAccumulator]:
        if self._manager.validation_dataset is None:
            return None
        accumulator = _MeanAccumulator()
        batches = progress_bar(
            self._manager.validation_batches(),
            enabled=self._show_progress,
            desc="validation",
            unit="batch",
            leave=False,
        )
        for batch in batches:
            metrics = self._eval_step(params, other_variables, batch_to_arrays(batch))
            # Stacked transfer (see the training loop): one fetch per batch, not
            # one per metric scalar.
            metric_names = list(metrics)
            values = np.asarray(jnp.stack([metrics[name] for name in metric_names]))
            accumulator.add({name: float(value) for name, value in zip(metric_names, values)})
        return accumulator

    def __iter__(self) -> Iterator[Tuple[TrainingStatus, EpochStatistics]]:
        architecture = self._config.nn
        params, other_variables = self._variables()
        opt_state = self.optimizer_state
        if opt_state is None:
            opt_state = self._optimizer.init(params)
            if self._restored_optimizer_bytes is not None:
                from flax import serialization

                try:
                    opt_state = serialization.from_bytes(opt_state, self._restored_optimizer_bytes)
                except (KeyError, ValueError) as error:
                    raise ValueError(
                        "Checkpoint optimizer state does not match the configured"
                        " optimizer; resume with the same optimizer/schedule config"
                        f" ({error})"
                    ) from error
        if self._mesh is not None:
            from allophant_tpu.parallel.mesh import replicate_pytree

            params = replicate_pytree(params, self._mesh)
            opt_state = replicate_pytree(opt_state, self._mesh)
            other_variables = replicate_pytree(other_variables, self._mesh)
        # Dropout bits come from the "rbg" PRNG (XLA RngBitGenerator): the default
        # threefry impl costs ~110 ms/step at the flagship shape (three dropouts per
        # layer over [B, T, 4D] tiles, generated again inside the rematerialized
        # backward), measured 447 -> 335 ms/step on one v5e chip. Parameter
        # initialization keeps the default threefry impl (estimator.py) for
        # checkpoint reproducibility; dropout patterns only need statistical quality.
        rng = jax.random.key(architecture.seed or 0, impl="rbg")
        step_size = architecture.step_size
        maximum_iterations = architecture.maximum_iterations

        epoch = int(self._estimator.epoch.epoch or 0)
        # Mid-epoch resume skips batches only in the epoch the checkpoint was
        # taken in; the comparison must use a snapshot (epoch.epoch is updated
        # at the end of every epoch, so comparing against it live would re-skip
        # the first batches of every later epoch too).
        resume_epoch = epoch
        stopped = False
        final_status = TrainingStatus.FINISHED

        try:
            while not stopped and (maximum_iterations is None or epoch < maximum_iterations):
                epoch_started = time.perf_counter()
                window = _MeanAccumulator()
                window_batches = 0
                window_utterances = 0
                last_grad_norm = None
                skip = self._skip_batches if epoch == resume_epoch else 0
                self._epoch_batches = skip

                process_shard = None
                shard_multiple = 1
                if self._multi_host:
                    process_shard = (jax.process_index(), jax.process_count())
                    shard_multiple = jax.device_count() // jax.process_count()
                groups = _group(
                    self._manager.training_batches(
                        seed=(architecture.seed or 0) + epoch,
                        skip_batches=skip,
                        process_shard=process_shard,
                        shard_multiple=shard_multiple,
                    ),
                    self._accumulation,
                    drop_last=True,
                )
                progress = progress_bar(
                    enabled=self._show_progress, desc=f"epoch {epoch}", unit="step"
                )
                for group in groups:
                    microbatches = stack_microbatches(group)
                    # Frame-budget batching yields variable batch sizes; on a
                    # single host, shard only steps whose batch axis divides the
                    # mesh (otherwise the step runs replicated — correct, just
                    # not parallel). Multi-host batches are pre-padded to shard
                    # evenly and always go through the distributed assembly.
                    batch_rows = next(iter(microbatches.values())).shape[1]
                    if self._multi_host:
                        batch_rows *= jax.process_count()
                    if self._mesh is not None and batch_rows % self._mesh.devices.size == 0:
                        from allophant_tpu.parallel.mesh import shard_microbatch_pytree

                        microbatches = shard_microbatch_pytree(microbatches, self._mesh)
                    elif self._multi_host:
                        raise RuntimeError(
                            "Multi-host step with a batch that does not divide the mesh;"
                            " this should be prevented by shard_multiple padding"
                        )
                    rng, step_rng = jax.random.split(rng)
                    params, opt_state, metrics = self._train_step(
                        params,
                        opt_state,
                        other_variables,
                        microbatches,
                        step_rng,
                        jnp.asarray(self.global_step, jnp.int32),
                    )
                    self.global_step += 1
                    # One stacked transfer instead of one blocking float() per
                    # metric: the dict now carries per-head loss sums (~40
                    # scalars), and per-leaf fetches pay the full device-link
                    # latency each on high-latency links.
                    metric_names = list(metrics)
                    values = np.asarray(jnp.stack([metrics[name] for name in metric_names]))
                    host_metrics = {
                        name: float(value) for name, value in zip(metric_names, values)
                    }
                    window.add(host_metrics)
                    last_grad_norm = host_metrics.get("grad_norm")
                    window_batches += len(group)
                    window_utterances += sum(len(batch) for batch in group)
                    self._epoch_batches += len(group)
                    progress.update(1)
                    progress.set_postfix(
                        step=self.global_step,
                        loss=f"{host_metrics['mean_loss']:.4f}",
                        refresh=False,
                    )
                    self._profiler.step(self.global_step)
                    self._metrics.log_step(
                        self.global_step,
                        {
                            "loss": host_metrics["mean_loss"],
                            "gradient_norm": host_metrics["grad_norm"],
                            **(
                                {"learning_rate": float(self._lr_schedule(self.global_step - 1))}
                                if self._lr_schedule
                                else {}
                            ),
                        },
                    )

                    stop_now = self._stop_requested
                    if self._multi_host:
                        # All processes must agree on the stop step or their
                        # collectives desynchronize; preemption signals every
                        # process, but delivery timing can differ by a step.
                        # Process 0 decides; the per-step scalar broadcast is
                        # negligible next to the loop's synchronous metric fetch.
                        from jax.experimental import multihost_utils

                        stop_now = bool(
                            multihost_utils.broadcast_one_to_all(
                                np.asarray(self._stop_requested)
                            )
                        )
                    if stop_now:
                        progress.close()
                        status, statistics, _ = self._validation_point(
                            params, other_variables, opt_state, epoch, window,
                            window_batches, window_utterances, last_grad_norm,
                            epoch_started, TrainingStatus.INTERRUPTED, validate=False,
                        )
                        yield status, statistics
                        return

                    if step_size is not None and self.global_step % step_size == 0:
                        progress.close()
                        status, statistics, stopped = self._validation_point(
                            params, other_variables, opt_state, epoch, window,
                            window_batches, window_utterances, last_grad_norm, epoch_started,
                            TrainingStatus.STEP,
                        )
                        yield status, statistics
                        if stopped:
                            final_status = TrainingStatus.EARLY_STOPPED
                            break
                        progress = progress_bar(
                            enabled=self._show_progress, desc=f"epoch {epoch}", unit="step"
                        )
                        window = _MeanAccumulator()
                        window_batches = 0
                        window_utterances = 0
                        epoch_started = time.perf_counter()

                progress.close()
                if stopped:
                    break
                epoch += 1
                self._estimator.epoch.epoch = epoch
                # A finished epoch leaves no batches to skip on resume.
                self._epoch_batches = 0
                self._estimator.epoch.step = 0
                if step_size is None:
                    status, statistics, stopped = self._validation_point(
                        params, other_variables, opt_state, epoch, window,
                        window_batches, window_utterances, last_grad_norm, epoch_started,
                        TrainingStatus.EPOCH,
                    )
                    yield status, statistics
                    if stopped:
                        final_status = TrainingStatus.EARLY_STOPPED
                        break
        finally:
            # Runs on normal completion too (before the yield below), so the
            # estimator state is synced on every exit path.
            self._profiler.stop()
            self._metrics.close()
            self._sync_back(params)
            self.optimizer_state = opt_state

        yield final_status, EpochStatistics(
            epoch, self.global_step, 0.0, {}, validation_loss=self.early_stopping.best_loss
        )

    def _validation_point(
        self,
        params,
        other_variables,
        opt_state,
        epoch: int,
        window: _MeanAccumulator,
        window_batches: int,
        window_utterances: int,
        last_grad_norm: Optional[float],
        window_started: float,
        base_status: TrainingStatus,
        validate: bool = True,
    ) -> Tuple[TrainingStatus, EpochStatistics, bool]:
        # Interrupt points (graceful preemption) sync state without paying for a
        # validation pass — the preemption grace window may be seconds.
        validation = self._validate(params, other_variables) if validate else None
        validation_loss = None if validation is None else validation.mean_loss
        improved = validation_loss is not None and self.early_stopping.update(validation_loss)
        if validation_loss is not None:
            self._metrics.log_step(
                self.global_step, {"loss": validation_loss}, prefix="validation"
            )

        statistics = EpochStatistics(
            epoch=epoch,
            global_step=self.global_step,
            train_loss=window.mean_loss,
            classifier_losses=window.head_means(),
            validation_loss=validation_loss,
            validation_classifier_losses=None if validation is None else validation.head_means(),
            learning_rate=(
                float(self._lr_schedule(self.global_step - 1)) if self._lr_schedule else None
            ),
            gradient_norm=last_grad_norm,
            batch_count=window_batches,
            utterance_count=window_utterances,
            duration_seconds=time.perf_counter() - window_started,
        )
        # Expose current state for checkpointing callbacks between yields.
        self._sync_back(params)
        self.optimizer_state = opt_state
        self._estimator.epoch.global_step = self.global_step
        # Batches consumed in the current epoch: lets a restored run resume
        # mid-epoch by skipping them (the reference ships SkipBatchSampler but
        # never wires it, batching.py:142-159).
        self._estimator.epoch.step = getattr(self, "_epoch_batches", 0)
        self._estimator.history.append(dataclasses.asdict(statistics))

        status = TrainingStatus.IMPROVED if improved else base_status
        return status, statistics, self.early_stopping.should_stop


def _model_size(estimator) -> int:
    """Warmup-schedule d_model (reference `WarmupInfo`, config.py:78-88)."""
    model = estimator.built.model
    config = model.acoustic_config
    hidden_size = getattr(config, "hidden_size", None)
    if hidden_size:
        return int(hidden_size)
    from allophant_tpu.models.transformer import TransformerAcousticModel

    return int(TransformerAcousticModel(config, model.feature_size).d_model)
