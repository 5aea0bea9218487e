"""Differential tests: execute the reference's *estimator.py* as the oracle.

The training-loop runtime (reference estimator.py) was the last major reference
module never run as an executable oracle (VERDICT r3 item 4). These tests load
the real module (``reference_shim.load_reference_estimator``) and drive its
``EarlyStopping``, ``split_batch_size``, ``Checkpoint`` layout,
``TrainingRun._training_batch_accumulation`` (the gradient-accumulation drain,
reference estimator.py:687-760) and ``TrainingRun.__iter__`` (epoch/step
validation cadence, :800-928) with tiny torch models and duck-typed dataset
managers on CPU, pinning their semantics against ours
(``allophant_tpu/training/run.py``, ``training/train_step.py``).

Reference quirks surfaced by executing the code — pinned here as *documented
divergences*, not copied (PARITY.md "Latent reference bugs"):

- **Cumulative accumulation divisor** (estimator.py:733-741): microbatches are
  drained with ``batches.pop()`` (reverse list order) and the k-th drained
  microbatch's backward is ``loss_k / cumulative_label_count(1..k)`` — the
  divisor grows as batches drain, so the *first-drained* (= last-listed)
  microbatch's gradient is weighted by its own label count while earlier-listed
  ones are damped by everyone processed before them. With the default recipe's
  ``accumulation_factor = 16`` the effective objective depends on DataLoader
  order. Ours is the order-independent per-microbatch mean:
  ``(1/K) * sum_k grad(loss_k / labels_k)`` (train_step.py accumulate/scan).
- **Per-microbatch L2 penalty** (estimator.py:754-758): the allophone L2
  penalty backward runs *inside* the drain loop — K times per optimizer step —
  despite the "after accumulating losses over the whole batch" comment, so its
  effective weight scales with the accumulation factor. Ours adds
  ``alpha * penalty`` to each microbatch objective and averages over K,
  keeping the configured weight.
- **max_iterations off-by-one** (estimator.py:677-680, 824): the epoch counter
  is ``range(start, max_iterations + 1)`` with ``start = 0``, so
  ``max_iterations = N`` trains N+1 epochs. Ours trains exactly N.
- **split_batch_size** (estimator.py:252-256) raises on non-divisible
  batch/accumulation combinations; ours floors to keep static shapes.
"""

from __future__ import annotations

import dataclasses
import math
from types import SimpleNamespace
from typing import Dict, List

import numpy as np
import pytest

from reference_shim import load_reference_estimator, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted at /root/reference"
)

torch = pytest.importorskip("torch")

from allophant_tpu.training.run import EarlyStopping as OurEarlyStopping


@pytest.fixture(scope="module")
def ref():
    return load_reference_estimator()


@pytest.fixture(autouse=True)
def _cpu_cuda_properties(monkeypatch):
    """TrainingRun.__init__ unconditionally queries CUDA device 0
    (estimator.py:510); satisfy it on the CPU-only host."""
    monkeypatch.setattr(
        torch.cuda, "get_device_properties", lambda _index: SimpleNamespace(total_memory=1)
    )


# ---------------------------------------------------------------------------
# EarlyStopping
# ---------------------------------------------------------------------------


class TestEarlyStopping:
    @pytest.mark.parametrize("patience", [1, 2, 3])
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_patience_semantics_match(self, ref, patience, seed):
        """(stop, improvement) per validation point matches the reference's
        ``EarlyStopping.status`` for random loss sequences (estimator.py:108-132)."""
        rng = np.random.default_rng(seed)
        losses = [float(value) for value in rng.uniform(1.0, 3.0, 12)]

        reference = ref.EarlyStopping(patience)
        ours = OurEarlyStopping(patience)
        for loss in losses:
            status = reference.status(loss)
            improvement = ours.update(loss)
            assert improvement == status.improvement
            assert ours.should_stop == status.stop
            if status.stop:
                break

    def test_improvement_tracking_never_stops(self, ref):
        """patience=None maps to the reference's ImprovementTrackingCriterion
        (estimator.py:91-105): improvements tracked, never stops."""
        reference = ref.ImprovementTrackingCriterion()
        ours = OurEarlyStopping(None)
        for loss in [3.0, 2.0, 2.5, 2.5, 1.0]:
            status = reference.status(loss)
            assert ours.update(loss) == status.improvement
            assert status.stop is False
            assert ours.should_stop is False


# ---------------------------------------------------------------------------
# split_batch_size
# ---------------------------------------------------------------------------


class TestSplitBatchSize:
    def test_divisible_matches(self, ref):
        for batch_size, accumulation in [(32, 4), (16, 1), (48, 6)]:
            assert ref.split_batch_size(batch_size, accumulation) == batch_size // accumulation

    def test_non_divisible_documented_divergence(self, ref):
        """The reference raises on a remainder (estimator.py:252-256); ours floors
        (run.py DatasetManager.split_batch_size) so bucketed static shapes never
        depend on user rounding. Pin both behaviors."""
        with pytest.raises(ValueError):
            ref.split_batch_size(33, 4)
        # Ours: documented floor. (Computed inline to avoid building a manager.)
        assert max(33 // 4, 1) == 8


# ---------------------------------------------------------------------------
# Checkpoint layout
# ---------------------------------------------------------------------------


class TestCheckpointLayout:
    # The exact key set our reference-checkpoint reader consumes
    # (allophant_tpu/training/checkpoint.py parse path).
    EXPECTED_FIELDS = [
        "config",
        "allophant_version",
        "feature_size",
        "sample_rate",
        "attribute_graph",
        "epoch",
        "phonetic_indexer_state",
        "dataset_meta_data",
        "model_state",
        "additional",
        "history",
        "optimization_states",
    ]

    def test_field_names_and_order(self, ref):
        """The reference Checkpoint dataclass layout (estimator.py:199-249) is the
        contract our torch-checkpoint reader parses; pin names and order."""
        assert [field.name for field in dataclasses.fields(ref.Checkpoint)] == self.EXPECTED_FIELDS

    def test_optimization_states_fields(self, ref):
        assert [field.name for field in dataclasses.fields(ref.OptimizationStates)] == [
            "optimizer",
            "grad_scaler",
        ]

    def test_epoch_position_fields(self, ref):
        assert [field.name for field in dataclasses.fields(ref.EpochPosition)] == [
            "epoch",
            "global_step",
            "step",
        ]
        position = ref.EpochPosition()
        position.next_step()
        position.next_step()
        assert (position.epoch, position.global_step, position.step) == (0, 2, 2)


# ---------------------------------------------------------------------------
# Tiny torch model + duck-typed batches for driving the real TrainingRun
# ---------------------------------------------------------------------------

HEADS = {"phoneme": 5, "syllabic": 3}


class TinyMultiHead(torch.nn.Module):
    """Linear per-head classifier over precomputed features: the smallest model
    satisfying the TrainingRun contract (classes, forward(batch) -> Predictions,
    l2_penalty)."""

    def __init__(self, feature_size: int = 4, l2: bool = False):
        super().__init__()
        self.heads = torch.nn.ModuleDict(
            {name: torch.nn.Linear(feature_size, size) for name, size in HEADS.items()}
        )
        self.use_l2 = l2
        self.forward_log: List[int] = []

    @property
    def classes(self) -> List[str]:
        return list(HEADS)

    def forward(self, batch):
        self.forward_log.append(batch.batch_id)
        predictions_module = __import__("sys").modules["allophant.network.acoustic_model"]
        features = batch.audio_features  # [B, T, F]
        outputs = {
            # Time-first [T, B, C] as the reference model emits for CTC.
            name: head(features).transpose(0, 1)
            for name, head in self.heads.items()
        }
        return predictions_module.Predictions(outputs, batch.lengths)

    def l2_penalty(self):
        if not self.use_l2:
            return None
        return sum((head.weight**2).sum() for head in self.heads.values())


@dataclasses.dataclass
class FakeBatch:
    batch_id: int
    audio_features: torch.Tensor  # [B, T, F]
    lengths: torch.Tensor  # [B] output frame counts
    labels: Dict[str, torch.Tensor]  # [B, N] per head
    label_lengths: Dict[str, torch.Tensor]  # [B] per head

    def to(self, _device):
        return self

    def __len__(self) -> int:
        return self.audio_features.shape[0]

    @property
    def attribute_indices(self):
        return [self.labels]

    @property
    def label_length_indices(self):
        return {name: index for index, name in enumerate(self.labels)}

def make_batch(batch_id: int, batch_size: int, frames: int, label_count: int, seed: int):
    rng = np.random.default_rng(seed)
    features = torch.tensor(rng.standard_normal((batch_size, frames, 4)), dtype=torch.float32)
    lengths = torch.full((batch_size,), frames, dtype=torch.int64)
    labels = {}
    label_lengths = {}
    for name, size in HEADS.items():
        labels[name] = torch.tensor(
            rng.integers(1, size, (batch_size, label_count)), dtype=torch.int64
        )
        label_lengths[name] = torch.full((batch_size,), label_count, dtype=torch.int64)
    batch = FakeBatch(batch_id, features, lengths, labels, label_lengths)
    # The loop unpacks a 1-element list for label_lengths and indexes by position.
    object.__setattr__(batch, "label_lengths", [list(label_lengths.values())])
    object.__setattr__(batch, "_label_length_by_name", label_lengths)
    return batch


def make_config(
    ref,
    accumulation: int = 1,
    step_size=None,
    patience=None,
    clip_norm=None,
    allophone_l2_alpha: float = 0.0,
    max_iterations=None,
):
    nn_config = SimpleNamespace(
        accumulation_factor=accumulation,
        step_size=step_size,
        early_stopping_patience=patience,
        clip_norm=clip_norm,
        mixed_precision=False,
        acoustic_model=SimpleNamespace(),  # not a Wav2Vec2PretrainedConfig -> no unfreeze
        projection=SimpleNamespace(allophone_l2_alpha=allophone_l2_alpha),
    )
    return SimpleNamespace(nn=nn_config, profiling=None)


class FakeManager:
    def __init__(self, batches: List[FakeBatch], dev_batches: List[FakeBatch] | None = None):
        self._batches = batches
        self._dev = dev_batches or []
        self.training_set_size = sum(len(batch) for batch in batches)
        self.validation_set_size = sum(len(batch) for batch in self._dev)

    def training_batches(self, shuffle: bool = False):
        return iter(list(self._batches))

    def development_batches(self):
        return iter(list(self._dev))


def make_training_run(ref, model, batches, config, dev_batches=None, validate=False, lr=1e-3):
    import sys as _sys

    config_module = _sys.modules["allophant.config"]
    wrapper = config_module.OptimizerWrapper(
        torch.optim.Adam(model.parameters(), lr=lr), config_module.WarmupInfo(4)
    )
    wrapper.add_schedulers(None)
    estimator = SimpleNamespace(
        config=config,
        model=model,
        loss_functions={name: _ctc_wrapper() for name in HEADS},
        history=[],
        epoch=ref.EpochPosition(),
    )
    parameters = ref.TrainingParameters(progress=False, validate=validate)
    run = ref.TrainingRun(estimator, FakeManager(batches, dev_batches), wrapper, parameters)
    return run, estimator


def _ctc_wrapper():
    import sys as _sys

    return _sys.modules["allophant.loss_functions"].CTCWrapper()


def reference_losses(model, batch) -> torch.Tensor:
    """Sum of per-head CTC losses exactly as the drain loop computes them."""
    features = batch.audio_features
    total = torch.zeros(())
    for name, head in model.heads.items():
        logits = head(features).transpose(0, 1)
        loss = _ctc_wrapper()(
            logits, batch.labels[name], batch.lengths, batch._label_length_by_name[name]
        )
        total = total + loss
    return total


# ---------------------------------------------------------------------------
# Accumulation drain semantics
# ---------------------------------------------------------------------------


class TestAccumulationSemantics:
    def _run_reference_accumulation(self, ref, model, batches, alpha=0.0, clip_norm=None):
        config = make_config(ref, accumulation=len(batches), allophone_l2_alpha=alpha, clip_norm=clip_norm)
        run, _estimator = make_training_run(ref, model, batches, config)
        run._scaler = None  # set by __iter__; the drain is called directly here
        progress_statistics = ref.TrainingProgressStatistics()
        progress_bar = ref._create_training_progress_bar(10, None, progress=False)
        model.zero_grad()
        category_statistics = run._training_batch_accumulation(
            list(batches), progress_statistics, progress_bar, False, torch.device("cpu")
        )
        progress_bar.close()
        return category_statistics, progress_statistics

    def test_drain_order_is_reversed(self, ref):
        """batches.pop() drains the accumulation list from the END
        (estimator.py:707): forward order is the reverse of the list order."""
        model = TinyMultiHead()
        batches = [make_batch(index, 2, 6, 3, seed=index) for index in range(3)]
        self._run_reference_accumulation(ref, model, batches)
        assert model.forward_log == [2, 1, 0]

    def test_cumulative_divisor_gradient(self, ref):
        """The k-th drained microbatch's backward is loss_k / cumulative label
        count of everything drained so far (estimator.py:733-741) — NOT
        loss_k / total and NOT loss_k / own count. Reproduce the accumulated
        gradient independently from that formula."""
        torch.manual_seed(0)
        model = TinyMultiHead()
        # Distinct label counts per microbatch make the three candidate
        # normalizations numerically distinguishable.
        batches = [
            make_batch(0, 2, 8, 2, seed=10),
            make_batch(1, 3, 6, 4, seed=11),
            make_batch(2, 1, 7, 3, seed=12),
        ]
        self._run_reference_accumulation(ref, model, batches)
        reference_grads = {
            name: parameter.grad.clone() for name, parameter in model.named_parameters()
        }

        def label_count(batch):
            return sum(int(lengths.sum()) for lengths in batch._label_length_by_name.values())

        # Independent recomputation: reversed drain, growing divisor.
        clone = TinyMultiHead()
        clone.load_state_dict(model.state_dict())
        clone.zero_grad()
        cumulative = 0
        for batch in reversed(batches):
            cumulative += label_count(batch)
            (reference_losses(clone, batch) / cumulative).backward()
        for name, parameter in clone.named_parameters():
            assert torch.allclose(reference_grads[name], parameter.grad, atol=1e-6), name

        # Our semantics — the order-independent per-microbatch mean
        # (train_step.py): (1/K) * sum_k grad(loss_k / labels_k). Differs from
        # the reference whenever label counts differ across microbatches:
        # documented divergence, not a bug in either direction we hide.
        ours = TinyMultiHead()
        ours.load_state_dict(model.state_dict())
        ours.zero_grad()
        for batch in batches:
            (reference_losses(ours, batch) / label_count(batch) / len(batches)).backward()
        deltas = [
            (reference_grads[name] - parameter.grad).abs().max().item()
            for name, parameter in ours.named_parameters()
        ]
        assert max(deltas) > 1e-4  # genuinely different objectives

    def test_single_microbatch_agrees_with_ours(self, ref):
        """With accumulation_factor = 1 the cumulative divisor equals the own
        label count, so the reference gradient IS our per-microbatch objective's
        gradient — the regimes coincide exactly where the quirk vanishes."""
        torch.manual_seed(1)
        model = TinyMultiHead()
        batch = make_batch(0, 3, 8, 3, seed=20)
        self._run_reference_accumulation(ref, model, [batch])
        reference_grads = {
            name: parameter.grad.clone() for name, parameter in model.named_parameters()
        }

        clone = TinyMultiHead()
        clone.load_state_dict(model.state_dict())
        clone.zero_grad()
        count = sum(int(lengths.sum()) for lengths in batch._label_length_by_name.values())
        (reference_losses(clone, batch) / count).backward()
        for name, parameter in clone.named_parameters():
            assert torch.allclose(reference_grads[name], parameter.grad, atol=1e-6), name

    def test_l2_penalty_applied_per_microbatch(self, ref):
        """The allophone L2 backward runs inside the drain loop
        (estimator.py:754-758): K microbatches contribute K * alpha * grad(penalty),
        despite the "after accumulating ... whole batch" comment. Ours keeps the
        configured weight (alpha * penalty per microbatch objective, averaged
        over K)."""
        torch.manual_seed(2)
        alpha = 0.5
        accumulation = 3
        model = TinyMultiHead(l2=True)
        batches = [make_batch(index, 2, 6, 3, seed=30 + index) for index in range(accumulation)]
        self._run_reference_accumulation(ref, model, batches, alpha=alpha)
        reference_grads = {
            name: parameter.grad.clone() for name, parameter in model.named_parameters()
        }

        # Recompute with the data terms (cumulative divisor) plus K penalty terms.
        clone = TinyMultiHead(l2=True)
        clone.load_state_dict(model.state_dict())
        clone.zero_grad()
        cumulative = 0
        for batch in reversed(batches):
            cumulative += sum(
                int(lengths.sum()) for lengths in batch._label_length_by_name.values()
            )
            (reference_losses(clone, batch) / cumulative).backward()
            (alpha * clone.l2_penalty()).backward()
        for name, parameter in clone.named_parameters():
            assert torch.allclose(reference_grads[name], parameter.grad, atol=1e-6), name

        # With K - 1 penalty terms instead the gradients must differ: the
        # per-microbatch application is real, not an artifact of tolerances.
        fewer = TinyMultiHead(l2=True)
        fewer.load_state_dict(model.state_dict())
        fewer.zero_grad()
        cumulative = 0
        for index, batch in enumerate(reversed(batches)):
            cumulative += sum(
                int(lengths.sum()) for lengths in batch._label_length_by_name.values()
            )
            (reference_losses(fewer, batch) / cumulative).backward()
            if index < accumulation - 1:
                (alpha * fewer.l2_penalty()).backward()
        deltas = [
            (reference_grads[name] - parameter.grad).abs().max().item()
            for name, parameter in fewer.named_parameters()
        ]
        assert max(deltas) > 1e-6

    def test_running_mean_is_label_weighted(self, ref):
        """TrainingProgressStatistics.update_mean divides the summed losses by
        the summed label counts (estimator.py:447-451) — the same weighted mean
        our _MeanAccumulator.mean_loss computes."""
        torch.manual_seed(3)
        model = TinyMultiHead()
        batches = [make_batch(index, 2, 6, 2 + index, seed=40 + index) for index in range(2)]
        config = make_config(ref, accumulation=len(batches))
        run, _estimator = make_training_run(ref, model, batches, config)
        run._scaler = None
        progress_statistics = ref.TrainingProgressStatistics()
        progress_bar = ref._create_training_progress_bar(10, None, progress=False)
        category_statistics = run._training_step(
            list(batches), progress_statistics, progress_bar, False, torch.device("cpu")
        )
        progress_bar.close()

        expected_count = sum(
            int(lengths.sum())
            for batch in batches
            for lengths in batch._label_length_by_name.values()
        )
        # Forward reruns above happen after one optimizer step; recompute on the
        # recorded statistics instead: losses were recorded pre-step.
        assert category_statistics.sum_lengths() == expected_count
        assert progress_statistics.training_lengths == expected_count
        assert progress_statistics.running_mean_training_losses == pytest.approx(
            progress_statistics.training_losses / expected_count
        )


# ---------------------------------------------------------------------------
# TrainingRun cadence
# ---------------------------------------------------------------------------


class TestTrainingRunCadence:
    def test_step_cadence_and_ragged_tail(self, ref):
        """step_size validation cadence (estimator.py:884-904): with 7 batches
        and accumulation 2 the epoch runs steps of [2, 2, 2, 1] batches — the
        ragged tail group IS processed (islice drains whatever remains) — and
        yields every step_size=2 steps. Ours drops ragged tails (static
        accumulation shapes, run.py _group(drop_last=True)): documented
        divergence."""
        model = TinyMultiHead()
        batches = [make_batch(index, 2, 6, 3, seed=50 + index) for index in range(7)]
        config = make_config(ref, accumulation=2, step_size=2, max_iterations=0)
        run, estimator = make_training_run(ref, model, batches, config)
        run._parameters.max_iterations = 0  # epochs: range(0, 1) -> one epoch

        yields = []
        step_snapshots = []
        for status, statistics in run:
            yields.append((status, statistics))
            # EpochStatistics.epoch aliases the run's single mutable
            # EpochPosition (estimator.py:811, 890): after the run, every
            # history entry shows the FINAL position — snapshot per yield.
            step_snapshots.append(statistics.epoch.global_step)
        # 7 batches / accumulation 2 -> 4 steps; yields after steps 2 and 4.
        assert len(yields) == 2
        assert model.forward_log.count(6) == 1 and len(model.forward_log) == 7
        for _status, statistics in yields:
            assert statistics.validation_loss == statistics.training_loss  # validate=False
        assert step_snapshots == [2, 4]
        assert estimator.history == yields
        # The aliasing quirk itself, pinned: both recorded statistics now report
        # the final global step.
        assert [statistics.epoch.global_step for _s, statistics in yields] == [4, 4]

    def test_epoch_cadence_and_max_iterations_off_by_one(self, ref):
        """Epoch-mode validation yields once per epoch, and max_iterations = N
        runs N + 1 epochs (estimator.py:677-680: range(start=0, N + 1)) — the
        reference's off-by-one. Ours trains exactly N epochs (run.py
        ``while epoch < maximum_iterations``): documented divergence."""
        model = TinyMultiHead()
        batches = [make_batch(index, 2, 6, 3, seed=60 + index) for index in range(4)]
        config = make_config(ref, accumulation=2, step_size=None)
        run, _estimator = make_training_run(ref, model, batches, config)
        run._parameters.max_iterations = 1

        epoch_snapshots = []
        yields = []
        for status, statistics in run:
            yields.append((status, statistics))
            epoch_snapshots.append(statistics.epoch.epoch)  # mutable; see above
        assert len(yields) == 2  # max_iterations=1 -> epochs 0 AND 1
        assert len(model.forward_log) == 8  # 4 batches per epoch, twice
        assert epoch_snapshots == [0, 1]

    def test_early_stopping_terminates_epoch_mode(self, ref):
        """EarlyStopping(patience=1) with non-improving validation losses stops
        after the second yield (estimator.py:924-928). lr=0 freezes the model,
        so losses are identical across epochs: the first yield improves
        (inf -> loss), the second is stagnant and stops — deterministically."""
        model = TinyMultiHead()
        batches = [make_batch(index, 2, 6, 3, seed=70 + index) for index in range(2)]
        config = make_config(ref, accumulation=1, step_size=None, patience=1)
        run, _estimator = make_training_run(ref, model, batches, config, lr=0.0)
        run._parameters.max_iterations = 50
        run._parameters.stopping_criterion = ref.EarlyStopping(1)
        run._stopping_criterion = run._parameters.stopping_criterion

        yields = list(run)
        assert [(status.stop, status.improvement) for status, _stats in yields] == [
            (False, True),
            (True, False),
        ]
        losses = [statistics.validation_loss for _status, statistics in yields]
        assert losses[0] == pytest.approx(losses[1])
        assert math.isfinite(losses[0])


# ---------------------------------------------------------------------------
# Validation aggregation
# ---------------------------------------------------------------------------


class TestValidationAggregation:
    def test_validation_loss_is_label_weighted(self, ref):
        """_end_step's validation loss is total summed loss / total label count
        over the whole dev set (estimator.py:589-674) — the weighted mean, not a
        mean of batch means. Our _MeanAccumulator computes the same weighted
        mean from (loss_sum, label_count) metrics."""
        torch.manual_seed(4)
        model = TinyMultiHead()
        train_batches = [make_batch(0, 2, 6, 3, seed=80)]
        # Different label counts so weighted and unweighted means differ.
        dev_batches = [
            make_batch(100, 2, 8, 2, seed=81),
            make_batch(101, 3, 6, 5, seed=82),
        ]
        config = make_config(ref, accumulation=1, step_size=None)
        run, _estimator = make_training_run(
            ref, model, train_batches, config, dev_batches=dev_batches, validate=True
        )
        run._scaler = None
        status, statistics = run._end_step(
            ref.EpochPosition(), torch.device("cpu"), 0.0, 0.0, False
        )

        with torch.inference_mode():
            total_loss = sum(float(reference_losses(model, batch)) for batch in dev_batches)
        total_count = sum(
            int(lengths.sum())
            for batch in dev_batches
            for lengths in batch._label_length_by_name.values()
        )
        expected = total_loss / total_count
        assert statistics.validation_loss == pytest.approx(expected, rel=1e-6)

        from allophant_tpu.training.run import _MeanAccumulator

        accumulator = _MeanAccumulator()
        with torch.inference_mode():
            for batch in dev_batches:
                accumulator.add(
                    {
                        "loss_sum": float(reference_losses(model, batch)),
                        "label_count": sum(
                            int(lengths.sum())
                            for lengths in batch._label_length_by_name.values()
                        ),
                    }
                )
        assert accumulator.mean_loss == pytest.approx(expected, rel=1e-6)
