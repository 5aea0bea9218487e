"""Differential tests: the reference's own greedy CTC decoder against ours.

Runs the reference's real ``predictions.py`` ``GreedyCTCDecoder``
(argmax -> ``unique_consecutive`` -> blank removal -> flashlight-compatible
1-based run-start timesteps -> summed-max score, predictions.py:189-207) as the
oracle for our device decode (`ops/decode.py`: prefix-sum compaction under jit,
both the log-probability and the logits-direct entry points). Greedy is the
decoding mode behind every published PER/AER number (reference README.md:191),
so token/timestep agreement here is serving-parity evidence.

Also pins the prediction-file format version constants to the reference's
(predictions.py:30-31) — the JSONL interop surface.
"""

from __future__ import annotations

import numpy as np
import pytest

from reference_shim import load_reference_predictions, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted at /root/reference"
)

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import allophant_tpu.predictions as ours_predictions
from allophant_tpu.ops.decode import GreedyCTCDecoder, greedy_decode_logits


@pytest.fixture(scope="module")
def ref_predictions():
    return load_reference_predictions()


def _random_case(seed: int):
    rng = np.random.default_rng(seed)
    batch = int(rng.integers(1, 7))
    time = int(rng.integers(1, 40))
    classes = int(rng.integers(2, 12))
    logits = rng.normal(size=(batch, time, classes)).astype(np.float32)
    if rng.random() < 0.5:
        # Long same-token runs and blank runs: quantized logits force repeats.
        logits = np.round(logits * 1.5).astype(np.float32)
        # Break argmax ties deterministically and identically for torch/XLA
        # (both pick the first maximum, but equal floats after rounding make
        # that the only thing under test — nudge by a tiny index-dependent bias
        # so maxima are unique).
        logits += (np.arange(classes, dtype=np.float32) * 1e-4)[None, None, :]
    lengths = rng.integers(0, time + 1, size=batch)
    if batch > 1:
        lengths[0] = time  # always cover the full-length row
    return logits, lengths


def _assert_hypotheses_match(reference_outputs, our_outputs, *, check_scores=True):
    assert len(our_outputs) == len(reference_outputs)
    for row, (reference_hyps, our_hyps) in enumerate(zip(reference_outputs, our_outputs)):
        assert len(reference_hyps) == len(our_hyps) == 1
        reference_hyp = reference_hyps[0]
        our_hyp = our_hyps[0]
        np.testing.assert_array_equal(
            np.asarray(our_hyp.tokens, dtype=np.int64),
            reference_hyp.tokens.numpy(),
            err_msg=f"tokens, row {row}",
        )
        np.testing.assert_array_equal(
            np.asarray(our_hyp.timesteps, dtype=np.int64),
            reference_hyp.timesteps.numpy(),
            err_msg=f"timesteps, row {row}",
        )
        if check_scores:
            assert float(our_hyp.score) == pytest.approx(float(reference_hyp.score), abs=1e-4)


@pytest.mark.parametrize("seed", range(8))
def test_greedy_decoder_matches_reference(ref_predictions, seed):
    logits, lengths = _random_case(seed)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1)

    reference_outputs = ref_predictions.GreedyCTCDecoder()(log_probs, torch.tensor(lengths))
    our_outputs = GreedyCTCDecoder()(jnp.asarray(log_probs.numpy()), jnp.asarray(lengths))
    _assert_hypotheses_match(reference_outputs, our_outputs)


@pytest.mark.parametrize("seed", range(8))
def test_greedy_logits_direct_matches_reference(ref_predictions, seed):
    """The serving fast path decodes raw logits without materializing the
    [B, T, C] log-softmax (argmax is softmax-invariant; scores via
    max - logsumexp). Tokens/timesteps/scores must still match the reference's
    log-probability decode of the same logits."""
    logits, lengths = _random_case(100 + seed)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1)
    reference_outputs = ref_predictions.GreedyCTCDecoder()(log_probs, torch.tensor(lengths))

    tokens, timesteps, counts, scores = (
        np.asarray(part)
        for part in greedy_decode_logits(jnp.asarray(logits), jnp.asarray(lengths))
    )
    for row, reference_hyps in enumerate(reference_outputs):
        reference_hyp = reference_hyps[0]
        count = int(counts[row])
        np.testing.assert_array_equal(
            tokens[row, :count].astype(np.int64), reference_hyp.tokens.numpy(), err_msg=f"row {row}"
        )
        np.testing.assert_array_equal(
            timesteps[row, :count].astype(np.int64), reference_hyp.timesteps.numpy()
        )
        assert float(scores[row]) == pytest.approx(float(reference_hyp.score), abs=1e-4)


@pytest.mark.parametrize("blank_index", [0, 2])
def test_greedy_nonzero_blank_matches_reference(ref_predictions, blank_index):
    logits, lengths = _random_case(42)
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1)
    reference_outputs = ref_predictions.GreedyCTCDecoder(blank_index)(
        log_probs, torch.tensor(lengths)
    )
    our_outputs = GreedyCTCDecoder(blank_index)(jnp.asarray(log_probs.numpy()), jnp.asarray(lengths))
    _assert_hypotheses_match(reference_outputs, our_outputs)


def test_greedy_all_blank_and_zero_length_rows(ref_predictions):
    """Degenerate rows: all-blank emissions and zero lengths yield empty
    hypotheses on both sides (empty tokens/timesteps, score = masked sum)."""
    batch, time, classes = 3, 5, 4
    logits = np.full((batch, time, classes), -1.0, dtype=np.float32)
    logits[:, :, 0] = 5.0  # blank dominates everywhere
    lengths = np.array([time, 0, 3])
    log_probs = torch.log_softmax(torch.tensor(logits), dim=-1)

    reference_outputs = ref_predictions.GreedyCTCDecoder()(log_probs, torch.tensor(lengths))
    our_outputs = GreedyCTCDecoder()(jnp.asarray(log_probs.numpy()), jnp.asarray(lengths))
    _assert_hypotheses_match(reference_outputs, our_outputs)
    for hyps in our_outputs:
        assert hyps[0].tokens.size == 0


def test_prediction_format_version_matches_reference(ref_predictions):
    """The JSONL interop surface: same current format version, and every version
    the reference supports we support."""
    assert ours_predictions.CURRENT_FORMAT_VERSION == ref_predictions.CURRENT_FORMAT_VERSION
    assert list(ours_predictions.SUPPORTED_VERSIONS) == list(ref_predictions.SUPPORTED_VERSIONS)


def test_greedy_feature_decoder_selection_matches_reference(ref_predictions):
    """``feature_decoders``/``_ctc_decoder`` pick the greedy decoder at beam
    width 1 (reference predictions.py:229-236); ours mirrors that contract."""

    class _Indexer:
        feature_names = ["phoneme", "tone"]

        def feature_categories(self, _name):
            return ["a", "b"]

    reference_decoders = ref_predictions.feature_decoders(_Indexer(), beam_width=1)
    assert set(reference_decoders) == {"phoneme", "tone"}
    assert all(
        isinstance(decoder, ref_predictions.GreedyCTCDecoder)
        for decoder in reference_decoders.values()
    )

    our_decoders = ours_predictions.feature_decoders(_Indexer(), beam_width=1)
    assert set(our_decoders) == set(reference_decoders)
    assert all(isinstance(decoder, GreedyCTCDecoder) for decoder in our_decoders.values())
