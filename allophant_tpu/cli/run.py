"""``allophant`` CLI: train / generate-config / predict / evaluate / edits / export.

Counterpart of /root/reference/allophant/run.py:831-1105 with the same subcommand
surface and flags. Training and inference run through the TPU-native estimator; the
``--cpu`` flag maps to forcing the JAX CPU backend rather than torch device
selection."""

from __future__ import annotations

import json
import logging
import os
import shutil
import sys
import tomllib
from argparse import ArgumentParser, FileType, Namespace
from enum import Enum
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence, Set, Tuple

import numpy as np

MAIN_LOGGER = logging.getLogger("allophant_tpu")

BEST_CHECKPOINT = "best.ckpt"
# Written on graceful preemption (SIGTERM/SIGINT during training): the full
# resumable state at the interrupted step, independent of the best model.
INTERRUPTED_CHECKPOINT = "interrupted.ckpt"


class TrainingLanguageMode(Enum):
    INCLUDE = "include"
    EXCLUDE = "exclude"
    ONLY = "only"


def _load_config_file(config_path: Optional[str], json_data: Optional[str]):
    from allophant_tpu.config import Config
    from allophant_tpu.package_data import DEFAULT_CONFIG_PATH

    if json_data is not None:
        return Config.load(json.loads(json_data))
    if config_path is None:
        return Config.from_toml(DEFAULT_CONFIG_PATH)
    with open(config_path, "rb") as file:
        return Config.load(tomllib.load(file))


def _force_cpu(arguments: Namespace) -> None:
    if getattr(arguments, "cpu", False):
        os.environ.setdefault("JAX_PLATFORMS", "cpu")


# ---------------------------------------------------------------------------
# generate-config
# ---------------------------------------------------------------------------


def generate_config(arguments: Namespace) -> None:
    """Emits the commented default config template (reference run.py:70-75)."""
    from allophant_tpu.package_data import DEFAULT_CONFIG_PATH

    if arguments.config_path is None:
        with open(DEFAULT_CONFIG_PATH, "r", encoding="utf-8") as file:
            sys.stdout.write(file.read())
    else:
        shutil.copyfile(DEFAULT_CONFIG_PATH, arguments.config_path)


# ---------------------------------------------------------------------------
# train
# ---------------------------------------------------------------------------


def _checkpoint_name(epoch: int) -> str:
    return f"epoch-{epoch}.ckpt"


def _interrupted_checkpoint_path(save_path: str) -> str:
    """Sibling path the preemption checkpoint is written to: `interrupted.ckpt`
    inside a --save-all directory, `<file>.interrupted` next to a single file."""
    if os.path.isdir(save_path):
        return os.path.join(save_path, INTERRUPTED_CHECKPOINT)
    return save_path + ".interrupted"


def _prefer_interrupted_checkpoint(candidate: str, save_path: str) -> str:
    """Resumes from the preemption checkpoint when it is the newest state.

    A later regular save (new best model / epoch checkpoint) supersedes an
    older interrupted file, so the choice is by modification time."""
    interrupted = _interrupted_checkpoint_path(save_path)
    if not os.path.exists(interrupted):
        return candidate
    if not os.path.exists(candidate):
        return interrupted
    return interrupted if os.path.getmtime(interrupted) >= os.path.getmtime(candidate) else candidate


def train_network(arguments: Namespace) -> None:
    """Train loop driver: restore-or-build, iterate `Estimator.train`, checkpoint on
    improvement (reference run.py:145-273)."""
    _force_cpu(arguments)
    from allophant_tpu.data import corpus_loading
    from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
    from allophant_tpu.training import DatasetManager, Estimator, TrainingStatus
    from allophant_tpu.training import checkpoint as checkpoint_module

    restore_path = arguments.save_path if arguments.restore else None
    checkpoint = None
    if restore_path is not None:
        candidate = (
            os.path.join(restore_path, BEST_CHECKPOINT)
            if os.path.isdir(restore_path)
            else restore_path
        )
        candidate = _prefer_interrupted_checkpoint(candidate, restore_path)
        checkpoint = checkpoint_module.load_checkpoint(candidate)
        if arguments.config is not None or arguments.config_json_data is not None:
            # Explicit config on resume overrides the checkpoint's embedded one
            # (e.g. to extend maximum_iterations); the architecture must stay
            # compatible with the stored parameters.
            checkpoint.config = _load_config_file(arguments.config, arguments.config_json_data)
        config = checkpoint.config
    else:
        config = _load_config_file(arguments.config, arguments.config_json_data)

    corpus = corpus_loading.load_corpus(
        arguments.dataset_path,
        arguments.dataset_type,
        config.preprocessing.resample,
        config.data.languages,
        config.data.validation_limits,
        config.data.only_primary_script,
        not arguments.no_progress,
    )

    train_features = validation_features = None
    train_lengths = validation_lengths = None
    if arguments.features is not None or arguments.lengths is not None:
        languages = {"train": corpus.train.languages, "dev": corpus.dev.languages}
        processed = corpus_loading.preprocessed_features_or_lengths(
            arguments.features or arguments.lengths,
            languages,
            lengths_only=arguments.features is None,
        )
        train_lengths = processed["train"].lengths
        validation_lengths = processed["dev"].lengths
        if arguments.features is not None:
            train_features = processed["train"].features
            validation_features = processed["dev"].features

    if arguments.no_validation:
        corpus.dev = corpus.dev.__class__.empty()

    if checkpoint is not None:
        MAIN_LOGGER.info("Restoring from %s", restore_path)
        # Rematerialize encoder activations: the XLS-R flagship's training step
        # does not fit HBM otherwise (the saved attention/FFN residuals alone
        # exceed 16 GB at practical batch sizes).
        # Training precision follows the config's AMP flag (reference
        # config.py:830): bf16 matmul regions + f32 loss tail when on, full
        # f32 when off — not the serving default.
        estimator, attribute_indexer = Estimator.restore(
            checkpoint,
            remat=True,
            precision="mixed" if config.nn.mixed_precision else "float32",
        )
    else:
        attribute_table = arguments.attribute_path.read() if arguments.attribute_path else None
        attribute_indexer = PhoneticAttributeIndexer.from_config(
            config, attribute_table, corpus.train.language_id_inventories()
        )
        if arguments.save_all and arguments.save_path is not None:
            os.makedirs(arguments.save_path, exist_ok=True)
        estimator = None

    manager = DatasetManager.from_config(
        config,
        corpus,
        attribute_indexer,
        config.preprocessing.resample or 16_000,
        train_features,
        validation_features,
        train_lengths,
        validation_lengths,
        data_workers=arguments.data_workers,
    )
    if estimator is None:
        estimator = Estimator.from_config(
            config,
            manager.feature_size,
            config.preprocessing.resample or 16_000,
            manager.attribute_graph(),
            attribute_indexer,
            remat=True,
        )

    tensorboard_directory = arguments.tensorboard_directory
    if tensorboard_directory == "":
        tensorboard_directory = os.path.join("runs", "allophant")

    skip_batches = arguments.skip_batches
    if skip_batches < 0:
        # Auto-resume: skip the batches the checkpoint's current epoch already
        # consumed (recorded at every validation point).
        skip_batches = int(estimator.epoch.step or 0) if arguments.restore else 0

    import jax

    run = estimator.train(
        manager,
        tensorboard_directory,
        skip_batches=skip_batches,
        show_progress=not arguments.no_progress and jax.process_index() == 0,
    )

    # Graceful preemption: SIGTERM/SIGINT ask the loop to stop at the next step
    # boundary, after which the INTERRUPTED branch below checkpoints the full
    # resumable state (TPU preemption notices deliver SIGTERM with a grace
    # window). A second signal restores the default handler, so it kills the
    # process the usual way if the final step or save hangs.
    import signal

    original_handlers = {}

    def _graceful_stop(signum, frame):
        run.request_stop()
        signal.signal(signum, original_handlers[signum])
        MAIN_LOGGER.warning(
            "Received %s: stopping after the in-flight step and checkpointing"
            " (send again to force exit)",
            signal.Signals(signum).name,
        )

    for signum in (signal.SIGTERM, signal.SIGINT):
        original_handlers[signum] = signal.signal(signum, _graceful_stop)
    try:
        for status, statistics in run:
            MAIN_LOGGER.info("%s", statistics)
            if not arguments.no_progress:
                print(statistics, flush=True)
            # On multi-host topologies only the first process writes checkpoints
            # (all processes hold identical replicated state).
            if arguments.save_path is not None and jax.process_index() == 0 and status not in (
                TrainingStatus.FINISHED,
                TrainingStatus.EARLY_STOPPED,
            ):
                indexer_state = manager.processor.indexer_state()
                training_state = run.serialized_training_state()
                if status == TrainingStatus.INTERRUPTED:
                    interrupted_path = _interrupted_checkpoint_path(arguments.save_path)
                    estimator.save(
                        interrupted_path,
                        optimizer_state=training_state,
                        phonetic_indexer_state=indexer_state,
                    )
                    print(f"Training interrupted; state saved to {interrupted_path}", flush=True)
                elif arguments.save_all:
                    epoch_path = os.path.join(
                        arguments.save_path, _checkpoint_name(statistics.epoch)
                    )
                    estimator.save(
                        epoch_path,
                        optimizer_state=training_state,
                        phonetic_indexer_state=indexer_state,
                    )
                    if status == TrainingStatus.IMPROVED:
                        shutil.copy2(epoch_path, os.path.join(arguments.save_path, BEST_CHECKPOINT))
                elif status == TrainingStatus.IMPROVED:
                    estimator.save(
                        arguments.save_path,
                        optimizer_state=training_state,
                        phonetic_indexer_state=indexer_state,
                    )
            if status == TrainingStatus.EARLY_STOPPED and not arguments.no_progress:
                print("Training stopped early", flush=True)
    finally:
        for signum, handler in original_handlers.items():
            # Leave the default handler in place if the first signal already
            # restored it mid-loop.
            if signal.getsignal(signum) is _graceful_stop:
                signal.signal(signum, handler)


# ---------------------------------------------------------------------------
# predict
# ---------------------------------------------------------------------------


def _dataset_from_data(data, config, indexer):
    from allophant_tpu.data.dataset import (
        BatchType,
        PhoneticallySegmentedDataset,
        SamplesProcessor,
        TranscribedDataset,
    )

    processor = SamplesProcessor.from_config(
        config, data.audio_info.sample_rate or config.preprocessing.resample or 16_000, indexer
    )
    if data.UTTERANCE_TYPE == "phonetically-segmented":
        return PhoneticallySegmentedDataset(BatchType.RAW, data, processor)
    return TranscribedDataset(BatchType.RAW, data, processor)


def _filter_split_raw_batches_by_language(batch_generator, data, excluded_languages: Set[str]):
    for original_batch in batch_generator:
        for language_id, batch in original_batch.split_by_language():
            language_code = data.language(language_id)
            if language_code in excluded_languages:
                continue
            yield batch, [language_code] * len(batch)


def predict(arguments: Namespace) -> None:
    """Batch inference -> JSONL predictions (reference run.py:571-822)."""
    _force_cpu(arguments)
    import jax.numpy as jnp

    from allophant_tpu import predictions
    from allophant_tpu.config import BatchingMode, PhonemeLayerType, ProjectionEntryConfig
    from allophant_tpu.data import corpus_loading
    from allophant_tpu.data.batching import Batcher
    from allophant_tpu.ops.decode import GreedyCTCDecoder
    from allophant_tpu.evaluation_runner import _fix_inventories, _missing_mappings
    from allophant_tpu.phonetics import language_codes
    from allophant_tpu.predictions import (
        FeatureDecoder,
        JsonlWriter,
        PredictionMetaData,
        UtterancePrediction,
    )
    from allophant_tpu.training import Estimator
    from allophant_tpu.utils import progress_bar

    n_candidates = arguments.n_best
    if n_candidates > arguments.ctc_beam:
        raise ValueError(f"n_best {n_candidates} larger than the beam size {arguments.ctc_beam}")

    # --precision picks a serving preset; --bf16 is the legacy spelling of
    # --precision bfloat16. Default (None) = the shipped DEFAULT_SERVING_PRECISION.
    precision = getattr(arguments, "precision", None)
    if arguments.bf16:
        precision = "bfloat16"
    inference_estimator, attribute_indexer = Estimator.restore(
        arguments.model_path, precision=precision
    )
    config = inference_estimator.config

    is_allophone_model = config.nn.projection.phoneme_layer == PhonemeLayerType.ALLOPHONES
    if arguments.language_phonemes and not is_allophone_model:
        raise ValueError(
            "--language-phonemes can only be used with models that use an allophone layer."
            f" The restored checkpoint layer type is {config.nn.projection.phoneme_layer}"
        )

    feature_names = list(attribute_indexer.feature_names)
    is_composition_model = config.nn.projection.embedding_composition is not None

    map_allophones = False
    composition_output_name = ProjectionEntryConfig.PHONEME_LAYER
    phone_indexer = None
    if is_allophone_model:
        if attribute_indexer.allophone_data is None:
            raise ValueError("Allophone data is missing from the attribute indexer")
        phone_indexer = attribute_indexer.allophone_data.shared_phone_indexer
        feature_names.append(ProjectionEntryConfig.PHONE)
        composition_output_name = ProjectionEntryConfig.PHONE
        if arguments.language_phonemes:
            map_allophones = True
        else:
            feature_names.remove(ProjectionEntryConfig.PHONEME_LAYER)

    if arguments.feature_subset is not None:
        if not set(arguments.feature_subset).issubset(set(feature_names)):
            raise ValueError(
                f"The provided feature subset {sorted(arguments.feature_subset)} "
                f"is not a subset of {sorted(feature_names)}"
            )
        feature_names = arguments.feature_subset

    MAIN_LOGGER.info("Predicting with attributes: %s", feature_names)

    batching_mode = config.nn.batching_mode if arguments.batch_mode is None else BatchingMode(arguments.batch_mode)
    batch_size = arguments.batch_size
    if batch_size is None:
        batch_size = max(config.nn.batch_size // max(config.nn.accumulation_factor, 1), 1)
    batcher = Batcher(batch_size, batching_mode, data_workers=arguments.data_workers)

    mode = TrainingLanguageMode(arguments.training_languages)
    corpus_languages = config.data.languages if mode == TrainingLanguageMode.ONLY else None
    exclude_known = mode == TrainingLanguageMode.EXCLUDE

    test_data = corpus_loading.load_corpus(
        arguments.dataset_path,
        arguments.dataset_type,
        config.preprocessing.resample,
        corpus_languages,
        only_primary_script=config.data.only_primary_script,
        progress_bar=not arguments.no_progress,
    ).test

    test_languages = list(test_data.languages)
    excluded_languages: Set[str] = set()
    if exclude_known:
        known = {language_codes.standardize_to_iso6393(code) for code in config.data.languages}
        kept = []
        for language in test_languages:
            if language in known:
                excluded_languages.add(language)
            else:
                kept.append(language)
        test_languages = kept
        MAIN_LOGGER.info("Excluding languages: %s", excluded_languages)

    if batching_mode == BatchingMode.FRAMES or arguments.lengths is not None:
        if arguments.lengths is not None:
            test_data_lengths = corpus_loading.preprocessed_features_or_lengths(
                arguments.lengths, {"test": test_data.languages}
            )["test"].lengths
        else:
            test_data_lengths = _corpus_lengths(test_data)
    else:
        test_data_lengths = None

    dataset = _dataset_from_data(test_data, config, attribute_indexer)
    model_output_start_offset = config.nn.loss.BLANK_OFFSET

    ctc_decoders = predictions.feature_decoders(
        attribute_indexer, arguments.ctc_beam, feature_names, n_candidates
    )

    per_language_decoders = None
    if is_composition_model:
        attributes = attribute_indexer.composition_features
        if arguments.dataset_type == "common-voice":
            training_inventories = test_data.load_inventories_for("train")
            language_inventories = {
                language: sorted(
                    set(test_data.inventory(language)) | set(training_inventories[language])
                )
                for language in test_languages
            }
        else:
            language_inventories = {
                language: test_data.inventory(language) for language in test_languages
            }
        if arguments.fix_unicode:
            language_inventories = _fix_inventories(
                language_inventories, _missing_mappings(attribute_indexer, language_inventories)
            )
        per_language_decoders = {
            language: FeatureDecoder(
                attribute_indexer.full_attributes.subset(inventory, attributes),
                arguments.ctc_beam,
                n_candidates,
            )
            for language, inventory in language_inventories.items()
        }

    batch_generator = batcher.batches(dataset, test_data_lengths)
    if per_language_decoders is not None or excluded_languages:
        batch_generator = _filter_split_raw_batches_by_language(
            batch_generator, test_data, excluded_languages
        )
    else:
        batch_generator = (
            (batch, [test_data.language(int(language_id)) for language_id in batch.language_ids])
            for batch in batch_generator
        )

    ipa_layers = {ProjectionEntryConfig.PHONEME_LAYER, ProjectionEntryConfig.PHONE}
    output = arguments.output
    with JsonlWriter(
        output,
        PredictionMetaData(
            str(vars(arguments)),
            arguments.dataset_type,
            test_languages,
            config.nn.projection.feature_set,
            attribute_indexer.state(),
            feature_names,
            {language: test_data.inventory(language) for language in test_languages},
        ),
        use_gzip=arguments.compress,
    ) as writer:
        processed = 0
        progress = progress_bar(
            enabled=not arguments.no_progress, desc="predict", unit="utt"
        )
        def launch(batch, language_batch):
            """Device work only — model forward plus every head's decode
            dispatch, with NO host synchronization (async dispatch). The host
            transfer and JSONL assembly happen in ``finish``, one batch later:
            the device computes batch i+1 while the host drains and writes
            batch i (the reference's loop fully serializes the two,
            run.py:742-822).

            Greedy serving (ctc_beam 1, the published-numbers configuration)
            runs the FUSED path: forward + every head's decode + the packed
            drain grid in one device program (estimator.predict_decoded) —
            one program execution and one transfer per batch instead of ~80
            (high-latency links price each program round trip at ~20-30 ms)."""
            language_decoder = None
            feature_matrix = None
            if per_language_decoders is not None:
                language_decoder = per_language_decoders[language_batch[0]]
                ctc_decoders[composition_output_name] = language_decoder.decoder
                feature_matrix = language_decoder.feature_matrix

            decoders_snapshot = dict(ctc_decoders)
            if all(
                isinstance(decoder, GreedyCTCDecoder)
                for decoder in decoders_snapshot.values()
            ):
                heads = tuple(sorted(decoders_snapshot))
                grid, _lengths = inference_estimator.predict_decoded(
                    batch,
                    feature_matrix,
                    heads=heads,
                    map_allophones=map_allophones,
                )
                return batch, language_batch, language_decoder, heads, ("fused", grid)

            from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

            beam_widths = {
                decoder._beam_width
                for decoder in decoders_snapshot.values()
                if isinstance(decoder, DeviceBeamCTCDecoder)
            }
            if len(beam_widths) == 1 and all(
                isinstance(decoder, DeviceBeamCTCDecoder)
                for decoder in decoders_snapshot.values()
            ):
                # All-beam serving (`predict -b N`): one fused program runs the
                # forward + every head's beam search + backtrace on device.
                heads = tuple(sorted(decoders_snapshot))
                fused = inference_estimator.predict_beam_decoded(
                    batch,
                    feature_matrix,
                    heads=heads,
                    beam_width=beam_widths.pop(),
                    map_allophones=map_allophones,
                )
                return (
                    batch,
                    language_batch,
                    language_decoder,
                    (heads, decoders_snapshot),
                    ("fused_beam",) + tuple(fused),
                )

            if feature_matrix is not None:
                model_outputs = inference_estimator.predict(
                    batch, feature_matrix, time_major=False
                )
            else:
                model_outputs = inference_estimator.predict(batch, time_major=False)

            # Outputs stay on device in batch-first serving layout — decoders
            # consume it directly, so no [T, B, C] relayouts run at all (the
            # reference transposes every head's emissions AND ships them to the
            # host first, run.py:742-806; the time-first relayout of the two
            # ~770-class tracks alone moves ~400 MB per batch).
            outputs = dict(model_outputs.outputs)
            if map_allophones:
                outputs[ProjectionEntryConfig.PHONEME_LAYER] = inference_estimator.map_allophones(
                    outputs[ProjectionEntryConfig.PHONE], batch.language_ids, time_major=False
                )
            batch_size_now = len(batch)
            # Lengths stay on device too — np.asarray here would block the
            # host on the forward and collapse the pipeline.
            output_lengths = jnp.asarray(model_outputs.lengths)[:batch_size_now]

            dispatched = {}
            for name, decoder in decoders_snapshot.items():
                emissions = jnp.asarray(outputs[name])[:batch_size_now]
                dispatched[name] = decoder.dispatch(emissions, output_lengths)
            return batch, language_batch, language_decoder, decoders_snapshot, dispatched

        def token_values(name, tokens, language_decoder):
            """Decoded token ids -> IPA / feature value strings (reference
            run.py:778-806: IPA layers offset by the blank, attribute layers by
            the model output start offset)."""
            if name in ipa_layers:
                indices = tokens - 1  # blank offset
                if language_decoder is not None:
                    return list(language_decoder.attributes.phoneme(indices))
                if name == ProjectionEntryConfig.PHONE:
                    return list(phone_indexer.phoneme(indices))
                return list(attribute_indexer.phoneme(indices))
            return attribute_indexer.feature_values(name, tokens - model_output_start_offset)

        def finish(state):
            nonlocal processed
            batch, language_batch, language_decoder, decoders_now, dispatched = state
            batch_size_now = len(batch)
            prediction_batches: Dict[str, List[List[List[str]]]] = {}
            if isinstance(dispatched, tuple) and dispatched[0] == "fused":
                # Fused greedy path: ONE grid transfer for the whole wave.
                heads = decoders_now  # tuple of head names in grid order
                grid = np.asarray(dispatched[1])
                for head_index, name in enumerate(heads):
                    lane = grid[head_index]
                    counts = lane[:, 0]
                    tokens = lane[:, 1:]
                    prediction_batches[name] = [
                        [
                            token_values(
                                name,
                                tokens[row, : counts[row]].astype(np.int64),
                                language_decoder,
                            )
                        ]
                        for row in range(batch_size_now)
                    ]
            elif isinstance(dispatched, tuple) and dispatched[0] == "fused_beam":
                # Fused beam path: every head's search + backtrace ran in ONE
                # device program (estimator.predict_beam_decoded); the whole
                # wave drains in two transfers here.
                heads, decoders_now = decoders_now
                collected = np.asarray(dispatched[1]).astype(np.int64)
                scores = np.asarray(dispatched[2])
                greedy_collected: Dict[str, Any] = {}
                beam_collected = {
                    name: decoders_now[name]._assemble(
                        collected[head_index], scores[head_index]
                    )
                    for head_index, name in enumerate(heads)
                }
            else:
                # Generic path (mixed greedy/beam heads): greedy heads drain
                # together through one packed fetch; beam heads drain together
                # through a stacked grid fetch (two transfers for the beam wave).
                from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

                greedy_collected = GreedyCTCDecoder.collect_many(
                    {
                        name: dispatched[name]
                        for name, decoder in decoders_now.items()
                        if isinstance(decoder, GreedyCTCDecoder)
                    },
                    # Serving drain: token values only (JSONL records carry no
                    # timesteps).
                    with_timesteps=False,
                )
                beam_decoders = {
                    name: decoder
                    for name, decoder in decoders_now.items()
                    if isinstance(decoder, DeviceBeamCTCDecoder)
                }
                beam_collected = DeviceBeamCTCDecoder.collect_many(
                    {name: dispatched[name] for name in beam_decoders}, beam_decoders
                )
            if not prediction_batches:
                for name, decoder in decoders_now.items():
                    if name in greedy_collected:
                        beam_results = greedy_collected[name]
                    elif name in beam_collected:
                        beam_results = beam_collected[name]
                    else:
                        beam_results = decoder.collect(dispatched[name])
                    prediction_batch = []
                    for result in range(len(beam_results)):
                        candidates = []
                        for beam_index in range(min(n_candidates, len(beam_results[result]))):
                            tokens = np.asarray(
                                beam_results[result][beam_index].tokens, dtype=np.int64
                            )
                            candidates.append(token_values(name, tokens, language_decoder))
                        prediction_batch.append(candidates)
                    prediction_batches[name] = prediction_batch

            label_batches = batch.raw_labels
            for index in range(batch_size_now):
                labels = [engine_labels[index] for engine_labels in label_batches]
                writer.write(
                    UtterancePrediction(
                        language_batch[index],
                        batch.utterance_ids[index],
                        {name: rows[index] for name, rows in prediction_batches.items()},
                        labels,
                    )
                )
            processed += batch_size_now
            progress.update(batch_size_now)

        # One-batch-deep software pipeline: launch batch i+1's device work
        # before finishing (draining + writing) batch i.
        # ALLOPHANT_PREDICT_TIMING=1 prints per-batch wall times + audio
        # seconds to stderr (steady-state RTF measurement of the production
        # loop; tools/bench_predict_cli.py parses these lines).
        import time

        timing = os.environ.get("ALLOPHANT_PREDICT_TIMING") == "1"
        last_mark = time.perf_counter()

        def mark(audio_seconds: float) -> None:
            # Format parsed by tools/bench_predict_cli.py — keep in sync.
            nonlocal last_mark
            if not timing:
                return
            now = time.perf_counter()
            print(
                f"[predict-timing] batch {audio_seconds:.1f} audio-s in"
                f" {now - last_mark:.3f}s",
                file=sys.stderr, flush=True,
            )
            last_mark = now

        pending = None
        pending_audio = 0.0
        for batch, language_batch in batch_generator:
            state = launch(batch, language_batch)
            if pending is not None:
                finish(pending)
                mark(pending_audio)
            pending = state
            pending_audio = float(np.asarray(batch.lengths).sum()) / (
                config.preprocessing.resample or 16_000
            )
        if pending is not None:
            finish(pending)
            mark(pending_audio)
        progress.close()


def _corpus_lengths(corpus) -> Optional[np.ndarray]:
    reader = getattr(corpus, "read_lengths", None)
    if reader is None:
        return None
    lengths: List[int] = []
    for _language, generator in reader():
        lengths.extend(generator)
    return np.asarray(lengths, dtype=np.int64)


# ---------------------------------------------------------------------------
# evaluate / edits
# ---------------------------------------------------------------------------


def evaluate(arguments: Namespace) -> None:
    """Prediction file -> per-language/classifier error rates (reference run.py:469-499)."""
    from allophant_tpu.evaluation_runner import compute_edit_statistics, summarize_edit_statistics
    from allophant_tpu.predictions import PredictionReader

    with PredictionReader(arguments.prediction_path, arguments.decompress) as reader:
        statistics = compute_edit_statistics(
            reader,
            map_phonemes=not arguments.no_remap,
            fix_unicode=arguments.fix_unicode,
            split_complex=arguments.split_complex,
            scorer="host" if arguments.host_scorer else "device",
            show_progress=not arguments.no_progress,
        )
        results = summarize_edit_statistics(
            statistics, reader.metadata.classifiers, str(vars(arguments))
        )

    if arguments.output is not None:
        with arguments.output as file:
            if arguments.json:
                file.write(results.dumps())
            else:
                file.write(str(results))
    elif arguments.json:
        print(results.dumps())
    else:
        print(results)


def edits(arguments: Namespace) -> None:
    """Prediction file -> per-utterance alignment operations (reference run.py:502-528)."""
    from allophant_tpu.evaluation_runner import compute_edits
    from allophant_tpu.predictions import JsonlWriter, PredictionReader

    with PredictionReader(arguments.prediction_path, arguments.decompress) as reader:
        with JsonlWriter(arguments.output, reader.metadata, use_gzip=arguments.compress) as writer:
            for utterance_edits in compute_edits(
                reader,
                map_phonemes=not arguments.no_remap,
                fix_unicode=arguments.fix_unicode,
                split_complex=arguments.split_complex,
            ):
                writer.write(utterance_edits)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------


def make_parser() -> ArgumentParser:
    import allophant_tpu

    needs_config_parser = ArgumentParser(add_help=False)
    needs_config_parser.add_argument(
        "-c", "--config", default=None,
        help="Path to a configuration file in toml format (generate one with generate-config)",
    )
    needs_config_parser.add_argument(
        "-j", "--config-json-data", default=None,
        help="Inline JSON configuration overriding -c/--config",
    )

    progress_parser = ArgumentParser(add_help=False)
    progress_parser.add_argument(
        "--no-progress", action="store_true", help="Disables progress printing"
    )

    fix_inventory_parser = ArgumentParser(add_help=False)
    fix_inventory_parser.add_argument(
        "--fix-unicode", action="store_true",
        help="Attempts resolving phonemes by performing unicode normalization",
    )

    dataset_processing_parser = ArgumentParser(add_help=False)
    dataset_processing_parser.add_argument(
        "dataset_path", help="Path to a corpus containing phonetically transcribed utterances"
    )
    dataset_processing_parser.add_argument(
        "-w", "--data-workers", type=int, default=None,
        help="Batch-building worker processes (decode/resample/labels/padding run"
        " GIL-free, like the reference's DataLoader workers). Default: a single"
        " prefetch thread; 0 disables prefetching entirely",
    )
    dataset_processing_parser.add_argument(
        "--cpu", action="store_true", help="Forces the JAX CPU backend instead of TPU"
    )

    parser = ArgumentParser(description="Trains and evaluates universal phoneme recognizer models")
    parser.add_argument(
        "-v", "--version", action="version", version=f"%(prog)s {allophant_tpu.__version__}"
    )
    subparsers = parser.add_subparsers(dest="mode")
    subparsers.required = True

    train_parser = subparsers.add_parser(
        "train",
        parents=[needs_config_parser, dataset_processing_parser, progress_parser],
        help="Trains a universal phoneme recognizer model",
    )
    train_parser.add_argument(
        "-a", "--attribute-path", type=FileType("r", encoding="utf-8"),
        help="Path to a (processed) feature table",
    )
    train_parser.add_argument(
        "-t", "--dataset-type", choices=["common-voice"], default="common-voice",
        help="Type of the dataset",
    )
    train_parser.add_argument(
        "-s", "--save-path",
        help="Path the best model is saved to, or a checkpoint directory with --save-all",
    )
    train_parser.add_argument(
        "-r", "--restore", action="store_true",
        help="Restores the model from --save-path instead of initializing a new model",
    )
    train_parser.add_argument(
        "-n", "--no-validation", action="store_true",
        help="Disables validation during training",
    )
    train_parser.add_argument(
        "-d", "--save-all", action="store_true",
        help="Saves all checkpoints in a directory; the best is copied to best.ckpt",
    )
    train_parser.add_argument(
        "-b", "--tensorboard", nargs="?", const="", action="store",
        dest="tensorboard_directory", help="Enables tensorboard summary writing",
    )
    train_parser.add_argument(
        "--detect-anomaly", action="store_true",
        help="Enables jax debug_nans to trace NaNs during training",
    )
    train_parser.add_argument(
        "--skip-batches", type=int, default=-1,
        help="Batches of the current epoch to skip when resuming (-1 resumes"
        " from the checkpoint's recorded position with --restore; 0 disables)",
    )
    preprocessed_group = train_parser.add_mutually_exclusive_group()
    preprocessed_group.add_argument(
        "-f", "--features",
        help="Path to precomputed features generated via the data 'preprocess' command",
    )
    preprocessed_group.add_argument(
        "-l", "--lengths",
        help="Precomputed per-utterance feature lengths (data 'save-lengths' command)",
    )

    config_parser = subparsers.add_parser(
        "generate-config", help="Generates a configuration file from a default template"
    )
    config_parser.add_argument(
        "config_path", nargs="?", default=None,
        help="Path for the new config file (stdout if omitted)",
    )

    error_analysis_parser = ArgumentParser(add_help=False)
    error_analysis_parser.add_argument(
        "prediction_path", help="Path to a file containing labeled predictions from `predict`"
    )
    error_analysis_parser.add_argument(
        "-d", "--decompress", default=None, action="store_true",
        help="Forces gzip decompression of the input",
    )
    error_analysis_parser.add_argument(
        "--no-remap", action="store_true",
        help="Disables train-to-target phoneme remapping before computing edit statistics",
    )
    error_analysis_parser.add_argument(
        "-s", "--split-complex", action="store_true",
        help="Splits complex segments in predictions and references before comparison",
    )
    error_analysis_parser.add_argument(
        "--host-scorer", action="store_true",
        help="Scores with the per-utterance native engine instead of the batched device DP",
    )

    evaluate_parser = subparsers.add_parser(
        "evaluate",
        help="Evaluates a trained model on a supported dataset",
        parents=[progress_parser, fix_inventory_parser, error_analysis_parser],
    )
    evaluate_parser.add_argument(
        "-j", "--json", action="store_true", help="Outputs evaluation results in json format"
    )
    evaluate_parser.add_argument(
        "-o", "--output", type=FileType("x", encoding="utf-8"),
        help="Writes evaluation outputs to the given file",
    )

    compressed_output_parser = ArgumentParser(add_help=False)
    compressed_output_parser.add_argument(
        "-o", "--output", default=None, help="Writes output to the given file (stdout by default)"
    )
    compressed_output_parser.add_argument(
        "-c", "--compress", action="store_true", default=None,
        help="Uses gzip compression for outputs",
    )

    subparsers.add_parser(
        "edits",
        help="Computes the lowest cost Levenshtein edit operations for detailed analysis",
        parents=[progress_parser, fix_inventory_parser, error_analysis_parser, compressed_output_parser],
    )

    predict_parser = subparsers.add_parser(
        "predict",
        parents=[dataset_processing_parser, progress_parser, fix_inventory_parser, compressed_output_parser],
        help="Transcribes a corpus into a predictions file",
    )
    predict_parser.add_argument(
        "--training-languages",
        choices=[mode.value for mode in TrainingLanguageMode],
        default=TrainingLanguageMode.INCLUDE.value,
        help="Only evaluate on, include, or exclude languages the model was trained on",
    )
    predict_parser.add_argument(
        "model_path", help="Model id or path to the model checkpoint for transcribing the data"
    )
    predict_parser.add_argument(
        "-t", "--dataset-type", choices=["common-voice", "ucla-phonetic"],
        default="ucla-phonetic", help="Type of the evaluation dataset",
    )
    predict_parser.add_argument(
        "-l", "--lengths",
        help="Precomputed feature lengths (required for utterance batching only)",
    )
    predict_parser.add_argument(
        "-s", "--batch-size", type=int, default=None, help="Batch size used for evaluation"
    )
    predict_parser.add_argument(
        "-m", "--batch-mode", choices=["frames", "utterances"], default=None,
        help="Type of batching",
    )
    predict_parser.add_argument(
        "-f", "--feature-subset", type=lambda codes: codes.split(","),
        help="Comma separated subset of features (including phoneme) to evaluate on",
    )
    predict_parser.add_argument(
        "-b", "--ctc-beam", type=int, default=1, help="Beam size used during beam decoding"
    )
    predict_parser.add_argument(
        "-n", "--n-best", type=int, default=1,
        help="Uses the best result from the n highest scoring beams",
    )
    predict_parser.add_argument(
        "--language-phonemes", action="store_true", default=None,
        help="For allophone models, outputs language-specific phoneme classifiers",
    )
    predict_parser.add_argument(
        "--precision",
        choices=["float32", "float32_high", "mixed", "bfloat16"],
        default=None,
        help="Serving precision preset (default: 'mixed' — bf16 encoder, f32"
        " decision tail; ~3x faster than float32_high on TPU)."
        " 'float32_high' is decision-exact; 'float32' is the bit-level"
        " reference-parity preset; see README for the measured bounds",
    )
    predict_parser.add_argument(
        "--bf16", action="store_true",
        help="Legacy alias for --precision bfloat16",
    )

    export_parser = subparsers.add_parser(
        "export",
        help="AOT-exports the transcription step (weights baked in) as a serialized"
        " StableHLO artifact for serving hosts without Python model code",
    )
    export_parser.add_argument("model_path", help="Model id or checkpoint path to export")
    export_parser.add_argument("output", help="Output artifact path")
    export_parser.add_argument(
        "-s", "--batch-size", type=int, default=8, help="Static serving batch size"
    )
    export_parser.add_argument(
        "-d", "--seconds", type=float, default=10.0,
        help="Static audio length per utterance in seconds (at 16 kHz)",
    )
    export_parser.add_argument(
        "--decode", default="greedy",
        help="'greedy' (on-device CTC tokens per head), 'log_probs' (per-head"
        " log-probs), or 'beam[width]' (greedy attributes + device prefix beam"
        " on the phoneme track, e.g. 'beam4')",
    )
    export_parser.add_argument(
        "--bf16", action="store_true", help="Export the bfloat16 compute path"
    )
    export_parser.add_argument(
        "--platforms", type=lambda values: values.split(","), default=None,
        help="Comma-separated lowering platforms (e.g. tpu,cpu); defaults to this host's backend",
    )
    export_parser.add_argument(
        "--cpu", action="store_true", help="Forces the JAX CPU backend instead of TPU"
    )

    return parser


def export_model(arguments: Namespace) -> None:
    from allophant_tpu import serving
    from allophant_tpu.training import Estimator

    estimator, _indexer = Estimator.restore(
        arguments.model_path,
        precision="bfloat16" if arguments.bf16 else None,
    )
    exported = serving.export_transcriber(
        estimator,
        arguments.batch_size,
        int(16_000 * arguments.seconds),
        decode=arguments.decode,
        platforms=arguments.platforms,
    )
    serving.save_transcriber(exported, arguments.output)
    print(
        f"Exported {arguments.model_path} at batch {arguments.batch_size} x"
        f" {arguments.seconds:g}s ({arguments.decode}) to {arguments.output}"
    )


def main(args: Sequence[str] | None = None) -> None:
    # Persistent XLA compilation cache: the flagship training step takes
    # minutes to compile cold; cached recompiles are near-instant. Honors an
    # existing JAX_COMPILATION_CACHE_DIR / explicit jax.config setting.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "allophant_tpu_xla")
    )
    if args is None:
        args = sys.argv[1:]
    arguments = make_parser().parse_args(args)
    if arguments.mode == "generate-config":
        generate_config(arguments)
    elif arguments.mode == "train":
        if arguments.detect_anomaly:
            import jax

            jax.config.update("jax_debug_nans", True)
        train_network(arguments)
    elif arguments.mode == "evaluate":
        evaluate(arguments)
    elif arguments.mode == "predict":
        predict(arguments)
    elif arguments.mode == "edits":
        edits(arguments)
    elif arguments.mode == "export":
        if arguments.cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        export_model(arguments)
    else:
        raise ValueError(f"Unsupported action: {arguments.mode}")


if __name__ == "__main__":
    main()
