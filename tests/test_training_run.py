"""Training runtime tests: dataset manager, full training loop, early stopping,
freeze plans and microbatch stacking."""

import os
import time
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from allophant_tpu.config import Config, UnfreezeScheduleConfig, Wav2Vec2PretrainedConfig
from allophant_tpu.data.speech_corpus import MultilingualSplits
from allophant_tpu.data.ucla import UCLAPhoneticCorpus
from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
from allophant_tpu.training.estimator import Estimator
from allophant_tpu.training.run import (
    DatasetManager,
    EarlyStopping,
    TrainingStatus,
    stack_microbatches,
)
from allophant_tpu.training.train_step import apply_freeze_plan, build_freeze_plan
from allophant_tpu.data.batch import LabeledBatch

from fixtures import mini_allophoible_csv, mini_config_dict


def _write_wav(path, samples: np.ndarray, rate: int = 16000):
    data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as file:
        file.setnchannels(1)
        file.setsampwidth(2)
        file.setframerate(rate)
        file.writeframes(data.tobytes())


@pytest.fixture
def tiny_corpus(tmp_path):
    """Tiny UCLA-format corpus: 2 languages x 3 utterances with real WAVs."""
    rng = np.random.default_rng(3)
    for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s", "i"])]:
        base = tmp_path / language
        (base / "audio").mkdir(parents=True)
        with open(base / "inventory", "w", encoding="utf-8") as file:
            for phoneme in phonemes:
                file.write(f"{phoneme} 5\n")
        with open(base / "raw", "w", encoding="utf-8") as raw, open(
            base / "text", "w", encoding="utf-8"
        ) as text:
            for index in range(3):
                utterance = f"{language}_{index}"
                raw.write(f"{utterance} rawform\n")
                text.write(f"{utterance} {' '.join(phonemes)}\n")
                _write_wav(
                    base / "audio" / f"{utterance}.wav",
                    rng.uniform(-0.3, 0.3, 1600 + 160 * index).astype(np.float32),
                )
    return UCLAPhoneticCorpus.load(str(tmp_path), resample=16000)


def _build_training_setup(tiny_corpus, config_overrides=None):
    config_dict = mini_config_dict()
    config_dict["nn"]["batch_size"] = 4
    config_dict["nn"]["maximum_iterations"] = 2
    config_dict["nn"]["accumulation_factor"] = 2
    if config_overrides:
        config_dict["nn"].update(config_overrides)
    config = Config.load(config_dict)
    indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
    splits = MultilingualSplits.single(tiny_corpus, "train")
    splits.dev = tiny_corpus
    manager = DatasetManager.from_config(
        config, splits, indexer, length_multiple=128, label_multiple=8
    )
    estimator = Estimator.from_config(
        config,
        manager.feature_size,
        16_000,
        manager.attribute_graph(),
        indexer,
        load_pretrained_weights=False,
    )
    return config, manager, estimator


class TestDatasetManager:
    def test_split_batch_size(self, tiny_corpus):
        _config, manager, _estimator = _build_training_setup(tiny_corpus)
        assert manager.split_batch_size == 2  # batch 4 / accumulation 2

    def test_training_and_validation_batches(self, tiny_corpus):
        _config, manager, _estimator = _build_training_setup(tiny_corpus)
        train_batches = list(manager.training_batches(seed=0))
        assert train_batches and all(isinstance(batch, LabeledBatch) for batch in train_batches)
        batch = train_batches[0]
        assert batch.audio_features.shape[1] % 128 == 0
        # Blank offset applied: label ids >= 1 for real entries.
        for name, labels in batch.attribute_indices.items():
            lengths = batch.label_lengths[name]
            for row, count in enumerate(lengths):
                assert (labels[row, :count] >= 1).all()
        assert list(manager.validation_batches())


class TestTrainingRun:
    def test_full_loop(self, tiny_corpus):
        _config, manager, estimator = _build_training_setup(tiny_corpus)
        before = jax.tree_util.tree_map(np.asarray, estimator.variables["params"])

        results = list(estimator.train(manager))
        statuses = [status for status, _stats in results]
        assert statuses[-1] == TrainingStatus.FINISHED
        # One yield per epoch + the trailing FINISHED.
        assert len(results) == 3

        for status, stats in results[:-1]:
            assert status in (TrainingStatus.EPOCH, TrainingStatus.IMPROVED)
            assert np.isfinite(stats.train_loss)
            assert stats.validation_loss is not None and np.isfinite(stats.validation_loss)
            # Per-head training losses are part of the reference's epoch
            # statistics (estimator.py:170-187) — regression: the train step
            # previously dropped them, leaving this dict empty.
            assert stats.classifier_losses
            assert all(np.isfinite(value) for value in stats.classifier_losses.values())
            assert stats.batch_count > 0

        after = estimator.variables["params"]
        changed = jax.tree_util.tree_map(
            lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)), before, after
        )
        assert any(jax.tree_util.tree_leaves(changed))
        # History recorded for checkpointing.
        assert len(estimator.history) == 2
        assert estimator.epoch.epoch == 2

    def test_step_based_validation(self, tiny_corpus):
        _config, manager, estimator = _build_training_setup(
            tiny_corpus, {"step_size": 1, "maximum_iterations": 1}
        )
        results = list(estimator.train(manager))
        step_results = [status for status, _ in results[:-1]]
        assert all(
            status in (TrainingStatus.STEP, TrainingStatus.IMPROVED) for status in step_results
        )
        assert len(step_results) >= 1


def _count_leaves(opt_state):
    """All optax step counters in the state tree (Adam count + schedule count)."""
    return [
        int(np.asarray(leaf))
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]
        if getattr(path[-1], "name", None) == "count"
    ]


class TestResume:
    def test_optimizer_and_early_stopping_roundtrip(self, tiny_corpus, tmp_path):
        """A checkpointed run resumes with identical Adam moments, schedule
        counters and early-stopping progress (reference estimator.py:190-194)."""
        config, manager, estimator = _build_training_setup(
            tiny_corpus, {"maximum_iterations": 1}
        )
        run = estimator.train(manager)
        results = list(run)
        assert results[-1][0] == TrainingStatus.FINISHED

        state_bytes = run.serialized_training_state()
        assert state_bytes is not None
        saved_opt = jax.tree_util.tree_map(np.asarray, run.optimizer_state)
        saved_counts = _count_leaves(saved_opt)
        assert saved_counts and all(count > 0 for count in saved_counts)

        checkpoint_path = str(tmp_path / "resume.ckpt")
        estimator.save(
            checkpoint_path,
            optimizer_state=state_bytes,
            phonetic_indexer_state=manager.processor.indexer_state(),
        )

        restored, _indexer = Estimator.restore(checkpoint_path, precision="float32")
        assert restored.training_state is not None
        restored.config.nn.maximum_iterations = 2

        resumed_run = restored.train(manager)
        # Early stopping state carried over before iteration starts.
        assert resumed_run.early_stopping.best_loss == run.early_stopping.best_loss
        assert resumed_run.early_stopping.stagnation == run.early_stopping.stagnation
        assert resumed_run.global_step == run.global_step

        # The deserialized optimizer state matches the saved one exactly.
        from flax import serialization

        params, _other = resumed_run._variables()
        template = resumed_run._optimizer.init(params)
        restored_opt = serialization.from_bytes(template, resumed_run._restored_optimizer_bytes)
        for expected, actual in zip(
            jax.tree_util.tree_leaves(saved_opt), jax.tree_util.tree_leaves(restored_opt)
        ):
            np.testing.assert_array_equal(np.asarray(expected), np.asarray(actual))

        # One more epoch continues the counters instead of restarting them, so
        # the warmup learning rate advances from the saved position.
        resumed_results = list(resumed_run)
        assert resumed_results[-1][0] in (TrainingStatus.FINISHED, TrainingStatus.EARLY_STOPPED)
        new_counts = _count_leaves(jax.tree_util.tree_map(np.asarray, resumed_run.optimizer_state))
        steps_taken = resumed_run.global_step - run.global_step
        assert steps_taken > 0
        assert new_counts == [count + steps_taken for count in saved_counts]

        if resumed_run._lr_schedule is not None:
            stats = resumed_results[0][1]
            expected_lr = float(resumed_run._lr_schedule(resumed_run.global_step - 1))
            assert stats.learning_rate == pytest.approx(expected_lr)

    def test_fresh_run_without_state_starts_counters_at_zero(self, tiny_corpus):
        _config, manager, estimator = _build_training_setup(tiny_corpus)
        run = estimator.train(manager)
        assert run._restored_optimizer_bytes is None
        assert run.early_stopping.best_loss == float("inf")

    def test_mid_epoch_position_recorded(self, tiny_corpus, tmp_path):
        """Step-mode validation records batches consumed into the epoch so a
        resumed run can skip them (the reference ships SkipBatchSampler
        unwired, batching.py:142-159)."""
        _config, manager, estimator = _build_training_setup(
            tiny_corpus, {"step_size": 1, "maximum_iterations": 1}
        )
        run = estimator.train(manager)
        iterator = iter(run)
        _status, _stats = next(iterator)
        assert estimator.epoch.step > 0
        recorded = estimator.epoch.step
        iterator.close()

        # Resuming with that skip consumes fewer batches in the first epoch.
        total_batches = len(list(manager.training_batches(seed=0)))
        remaining = len(list(manager.training_batches(seed=0, skip_batches=recorded)))
        assert remaining == total_batches - recorded


class TestGracefulInterrupt:
    def test_request_stop_yields_interrupted_and_resumes(self, tiny_corpus, tmp_path):
        """`request_stop` (the SIGTERM preemption path) stops after the in-flight
        step, yields INTERRUPTED with every piece of resumable state synced, and
        a restored run continues optimizer counters from the interrupted step."""
        _config, manager, estimator = _build_training_setup(tiny_corpus)
        run = estimator.train(manager)
        run.request_stop()
        results = list(run)

        assert [status for status, _ in results] == [TrainingStatus.INTERRUPTED]
        _status, stats = results[0]
        # Exactly the in-flight update ran; preemption skips the validation pass.
        assert stats.global_step == 1
        assert stats.validation_loss is None
        assert stats.batch_count > 0
        # Mid-epoch position and global step synced for --skip-batches resume.
        assert estimator.epoch.step == stats.batch_count
        assert estimator.epoch.global_step == 1

        state_bytes = run.serialized_training_state()
        assert state_bytes is not None
        saved_counts = _count_leaves(jax.tree_util.tree_map(np.asarray, run.optimizer_state))
        assert saved_counts and all(count == 1 for count in saved_counts)

        checkpoint_path = str(tmp_path / "interrupted.ckpt")
        estimator.save(
            checkpoint_path,
            optimizer_state=state_bytes,
            phonetic_indexer_state=manager.processor.indexer_state(),
        )
        restored, _indexer = Estimator.restore(checkpoint_path, precision="float32")
        resumed_run = restored.train(manager, skip_batches=int(restored.epoch.step or 0))
        resumed_results = list(resumed_run)
        assert resumed_results[-1][0] == TrainingStatus.FINISHED
        steps_taken = resumed_run.global_step - run.global_step
        assert steps_taken > 0
        new_counts = _count_leaves(
            jax.tree_util.tree_map(np.asarray, resumed_run.optimizer_state)
        )
        # Adam/schedule counters continue from the interrupted step, never reset.
        assert new_counts == [1 + steps_taken for _ in new_counts]

    def test_interrupted_checkpoint_path_preference(self, tmp_path):
        """Restore picks the preemption checkpoint only while it is the newest
        state; a later regular save supersedes it."""
        from allophant_tpu.cli.run import (
            _interrupted_checkpoint_path,
            _prefer_interrupted_checkpoint,
        )

        single = str(tmp_path / "model.ckpt")
        assert _interrupted_checkpoint_path(single) == single + ".interrupted"
        directory = str(tmp_path / "checkpoints")
        os.makedirs(directory)
        assert _interrupted_checkpoint_path(directory) == os.path.join(
            directory, "interrupted.ckpt"
        )

        best = os.path.join(directory, "best.ckpt")
        # No interrupted file: the regular candidate wins.
        assert _prefer_interrupted_checkpoint(best, directory) == best
        interrupted = os.path.join(directory, "interrupted.ckpt")
        with open(interrupted, "w", encoding="utf-8"):
            pass
        # Interrupted exists, regular candidate missing: resume from interrupted.
        assert _prefer_interrupted_checkpoint(best, directory) == interrupted
        with open(best, "w", encoding="utf-8"):
            pass
        newer = time.time() + 60
        os.utime(best, (newer, newer))
        # A newer regular checkpoint supersedes the stale interrupted file.
        assert _prefer_interrupted_checkpoint(best, directory) == best
        os.utime(interrupted, (newer + 60, newer + 60))
        assert _prefer_interrupted_checkpoint(best, directory) == interrupted


class TestEarlyStopping:
    def test_patience(self):
        stopper = EarlyStopping(patience=1)
        assert stopper.update(1.0)
        assert not stopper.update(1.5)
        # patience=1 stops after the FIRST stagnant validation (reference
        # estimator.py:132 stops when the counter equals patience).
        assert stopper.should_stop
        stopper = EarlyStopping(patience=2)
        assert stopper.update(1.0)
        assert not stopper.update(1.5)
        assert not stopper.should_stop
        assert stopper.update(0.5)  # improvement resets stagnation
        assert not stopper.should_stop
        assert not stopper.update(0.6)
        assert not stopper.update(0.7)
        assert stopper.should_stop

    def test_state_roundtrip(self):
        stopper = EarlyStopping(patience=2)
        stopper.update(0.5)
        restored = EarlyStopping(patience=2)
        restored.load_state_dict(stopper.state_dict())
        assert restored.best_loss == 0.5


class TestFreezePlan:
    def test_plan_from_config(self):
        config = Wav2Vec2PretrainedConfig(
            "some-model",
            freeze_feature_encoder=True,
            freeze_encoder=True,
            unfreeze_schedule=UnfreezeScheduleConfig(encoder_steps=10),
        )
        plan = build_freeze_plan(config)
        groups = dict(plan.groups)
        assert groups[("acoustic_model", "feature_extractor")] is None
        assert groups[("acoustic_model", "encoder")] == 10

    def test_apply_masks_gradients(self):
        config = Wav2Vec2PretrainedConfig(
            "some-model",
            freeze_feature_encoder=True,
            unfreeze_schedule=UnfreezeScheduleConfig(feature_encoder_steps=5),
        )
        plan = build_freeze_plan(config)
        grads = {
            "acoustic_model": {
                "feature_extractor": {"kernel": jnp.ones(3)},
                "encoder": {"kernel": jnp.ones(3)},
            },
            "projection": {"kernel": jnp.ones(3)},
        }
        frozen = apply_freeze_plan(grads, plan, jnp.asarray(2))
        assert np.allclose(frozen["acoustic_model"]["feature_extractor"]["kernel"], 0.0)
        assert np.allclose(frozen["acoustic_model"]["encoder"]["kernel"], 1.0)
        assert np.allclose(frozen["projection"]["kernel"], 1.0)
        unfrozen = apply_freeze_plan(grads, plan, jnp.asarray(7))
        assert np.allclose(unfrozen["acoustic_model"]["feature_extractor"]["kernel"], 1.0)


class TestStackMicrobatches:
    def test_pads_to_group_maximum(self):
        def make(batch, time, labels):
            return LabeledBatch(
                np.zeros((batch, time), dtype=np.float32),
                np.full(batch, time, dtype=np.int32),
                np.zeros(batch, dtype=np.int32),
                {"phoneme": np.ones((batch, labels), dtype=np.int32)},
                {"phoneme": np.full(batch, labels, dtype=np.int32)},
            )

        stacked = stack_microbatches([make(2, 128, 4), make(1, 256, 8)])
        assert stacked["audio"].shape == (2, 2, 256)
        assert stacked["labels_phoneme"].shape == (2, 2, 8)
        # Filler rows keep nonzero audio lengths, zero label lengths.
        assert stacked["lengths"].min() >= 1
        assert stacked["label_lengths_phoneme"][1, 1] == 0


class TestRemat:
    def test_remat_matches_plain_gradients(self, tiny_corpus):
        """Per-layer rematerialization must not change gradients (same math,
        recomputed activations)."""
        import jax
        import jax.numpy as jnp
        from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture, Wav2Vec2Model

        arch = Wav2Vec2Architecture(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, conv_dim=(16,) * 7,
            hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        )
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
        lengths = jnp.full((2,), 3200, dtype=jnp.int32)

        plain = Wav2Vec2Model(arch, jnp.float32, remat=False)
        remat = Wav2Vec2Model(arch, jnp.float32, remat=True)
        variables = plain.init(jax.random.PRNGKey(0), audio, lengths)

        def loss(model, params):
            hidden_states, _ = model.apply(params, audio, lengths)
            return hidden_states[-1].sum()

        grad_plain = jax.grad(lambda p: loss(plain, p))(variables)
        grad_remat = jax.grad(lambda p: loss(remat, p))(variables)
        for a, b in zip(jax.tree_util.tree_leaves(grad_plain), jax.tree_util.tree_leaves(grad_remat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


class TestFrozenPrefix:
    def test_prefix_from_config(self):
        from allophant_tpu.models.allophant import whole_run_frozen_prefix

        base = Wav2Vec2PretrainedConfig("some-model", freeze_feature_encoder=True)
        assert whole_run_frozen_prefix(base) == 1
        assert (
            whole_run_frozen_prefix(
                Wav2Vec2PretrainedConfig(
                    "m",
                    freeze_feature_encoder=True,
                    freeze_feature_projection=True,
                    freeze_encoder=True,
                )
            )
            == 3
        )
        # A scheduled thaw keeps the group out of the static prefix.
        assert (
            whole_run_frozen_prefix(
                Wav2Vec2PretrainedConfig(
                    "m",
                    freeze_feature_encoder=True,
                    unfreeze_schedule=UnfreezeScheduleConfig(feature_encoder_steps=5),
                )
            )
            == 0
        )
        # Prefix must be contiguous from the extractor: trainable extractor blocks
        # stop_gradient for the frozen projection (flow-through grads must survive).
        assert (
            whole_run_frozen_prefix(
                Wav2Vec2PretrainedConfig(
                    "m", freeze_feature_encoder=False, freeze_feature_projection=True
                )
            )
            == 0
        )

    def test_stop_gradient_matches_masked_gradients(self):
        """frozen_prefix=1 must produce exactly the gradients of the unfrozen model
        with extractor grads zeroed: stop_gradient is an optimization, not a change
        in training semantics."""
        from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture, Wav2Vec2Model

        arch = Wav2Vec2Architecture(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, conv_dim=(16,) * 7,
            hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
        )
        rng = np.random.default_rng(1)
        audio = jnp.asarray(rng.standard_normal((2, 3200)).astype(np.float32))
        lengths = jnp.full((2,), 3200, dtype=jnp.int32)

        plain = Wav2Vec2Model(arch, jnp.float32)
        frozen = Wav2Vec2Model(arch, jnp.float32, frozen_prefix=1)
        variables = plain.init(jax.random.PRNGKey(0), audio, lengths)

        def loss(model, params):
            hidden_states, _ = model.apply(params, audio, lengths)
            return (hidden_states[-1] ** 2).sum()

        grad_plain = jax.grad(lambda p: loss(plain, p))(variables)["params"]
        grad_frozen = jax.grad(lambda p: loss(frozen, p))(variables)["params"]

        for leaf in jax.tree_util.tree_leaves(grad_frozen["feature_extractor"]):
            assert np.allclose(np.asarray(leaf), 0.0)
        for name in ("feature_projection", "encoder"):
            for a, b in zip(
                jax.tree_util.tree_leaves(grad_plain[name]),
                jax.tree_util.tree_leaves(grad_frozen[name]),
            ):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)
