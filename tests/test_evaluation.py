"""Tests for the evaluation pipeline: result-file compatibility with the reference's
published JSONs, the batched TPU Levenshtein scorer, and the end-to-end
predictions-file -> statistics flow."""

import json
import os

import numpy as np
import pytest

from allophant_tpu.evaluation import MultilingualEvaluationResults, macro_average_error_rates
from allophant_tpu.ops.levenshtein import (
    batched_levenshtein_distances,
    corpus_error_rate,
    encode_token_batches,
)
from allophant_tpu.phonemes import levensthein

REFERENCE_RESULTS = "/root/reference/interspeech_results/allophant_ucla.json"


class TestResultCompatibility:
    @pytest.mark.skipif(not os.path.exists(REFERENCE_RESULTS), reason="reference results absent")
    def test_loads_published_results(self):
        results = MultilingualEvaluationResults.load(REFERENCE_RESULTS)
        assert "total" in results.results
        assert len(results.results) == 85  # 84 languages + total
        first = next(iter(results.results.values()))
        assert len(first.properties) == 37

    @pytest.mark.skipif(not os.path.exists(REFERENCE_RESULTS), reason="reference results absent")
    def test_published_macro_averages(self):
        # The README numbers are macro averages of these files: Multitask UCLA
        # PER 45.62% and AER 19.44% (BASELINE.md).
        results = MultilingualEvaluationResults.load(REFERENCE_RESULTS)
        summary = macro_average_error_rates(results)
        assert summary["phoneme_error_rate"] * 100 == pytest.approx(45.62, abs=0.01)
        assert summary["attribute_error_rate"] * 100 == pytest.approx(19.44, abs=0.01)

    @pytest.mark.skipif(not os.path.exists(REFERENCE_RESULTS), reason="reference results absent")
    def test_roundtrip_preserves_json(self):
        with open(REFERENCE_RESULTS) as file:
            raw = json.load(file)
        results = MultilingualEvaluationResults.from_json(raw)
        dumped = results.to_json()
        assert dumped["results"].keys() == raw["results"].keys()
        language = next(iter(raw["results"]))
        assert dumped["results"][language]["error_statistics"] == raw["results"][language]["error_statistics"]


class TestBatchedLevenshtein:
    def test_matches_native_engine(self):
        rng = np.random.default_rng(0)
        expected = []
        actual = []
        for _ in range(20):
            expected.append([f"p{i}" for i in rng.integers(0, 12, rng.integers(1, 15))])
            actual.append([f"p{i}" for i in rng.integers(0, 12, rng.integers(1, 15))])
        a_ids, a_lengths, b_ids, b_lengths = encode_token_batches(expected, actual)
        distances = np.asarray(batched_levenshtein_distances(a_ids, a_lengths, b_ids, b_lengths))
        for index, (exp, act) in enumerate(zip(expected, actual)):
            assert distances[index] == levensthein(exp, act), f"row {index}"

    def test_empty_and_identical(self):
        expected = [["a", "b"], ["a"], ["x", "y", "z"]]
        actual = [["a", "b"], ["b"], []]
        a_ids, a_lengths, b_ids, b_lengths = encode_token_batches(expected, actual)
        distances = np.asarray(batched_levenshtein_distances(a_ids, a_lengths, b_ids, b_lengths))
        np.testing.assert_array_equal(distances, [0, 1, 3])

    def test_corpus_error_rate(self):
        expected = [["a", "b", "c"], ["a", "a"]]
        actual = [["a", "b"], ["a", "a"]]
        a_ids, a_lengths, b_ids, b_lengths = encode_token_batches(expected, actual)
        rate = corpus_error_rate(a_ids, a_lengths, b_ids, b_lengths)
        # 1 deletion over 5 expected symbols.
        assert rate == pytest.approx(1 / 5)


class TestEvaluationFlow:
    def _write_predictions(self, tmp_path, indexer_state, classifiers):
        from allophant_tpu.predictions import JsonlWriter, PredictionMetaData, UtterancePrediction

        meta = PredictionMetaData(
            "test", "ucla-phonetic", ["spa"], "phoible", indexer_state, classifiers,
            label_inventories={"spa": ["a", "t", "n"]},
        )
        path = str(tmp_path / "predictions.jsonl")
        with JsonlWriter(path, meta) as writer:
            writer.write(
                UtterancePrediction(
                    "spa",
                    "utt1",
                    {
                        "phoneme": [["a", "t"], ["a", "t", "n"]],  # 2 candidates (n-best)
                        "nasal": [["-", "-", "+"]],
                    },
                    labels=[["a", "t", "n"]],
                )
            )
        return path

    def test_compute_statistics(self, tmp_path):
        from fixtures import mini_allophoible_csv
        from allophant_tpu.evaluation_runner import compute_edit_statistics, summarize_edit_statistics
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer
        from allophant_tpu.predictions import PredictionReader

        indexer = PhoneticAttributeIndexer(FeatureSet.PHOIBLE, mini_allophoible_csv())
        path = self._write_predictions(tmp_path, indexer.state(), ["phoneme", "nasal"])

        with PredictionReader(path) as reader:
            statistics = compute_edit_statistics(reader, map_phonemes=False)
            results = summarize_edit_statistics(statistics, reader.metadata.classifiers, "args")

        # Best candidate is the exact match: zero errors.
        phoneme_stats = statistics["spa"]["phoneme"]
        assert phoneme_stats.correct == 3
        assert phoneme_stats.word_error_rate() == 0.0
        # nasal expected from features of [a, t, n]: "-", "-", "+" -> exact.
        assert statistics["spa"]["nasal"].word_error_rate() == 0.0
        assert results.results["total"].error_rates["phoneme"] == 0.0

    def test_edits_output(self, tmp_path):
        from fixtures import mini_allophoible_csv
        from allophant_tpu.evaluation_runner import compute_edits
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer
        from allophant_tpu.predictions import PredictionReader
        from allophant_tpu.phonemes import Action

        indexer = PhoneticAttributeIndexer(FeatureSet.PHOIBLE, mini_allophoible_csv())
        path = self._write_predictions(tmp_path, indexer.state(), ["phoneme", "nasal"])
        with PredictionReader(path) as reader:
            [edits] = list(compute_edits(reader, map_phonemes=False))
        # First candidate [a, t] vs [a, t, n]: one deletion of n.
        operations = edits.edit_operations["phoneme"]
        assert len(operations) == 1
        assert operations[0][0] == Action.DELETION
        assert operations[0][1] == "n"


class TestDeviceScorerParity:
    def test_device_matches_host_scorer(self, tmp_path):
        """Full pipeline: device-batched statistics equal the per-utterance host
        engine on a multi-utterance, multi-candidate prediction file."""
        import numpy as np
        from fixtures import mini_allophoible_csv
        from allophant_tpu.evaluation_runner import compute_edit_statistics
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer
        from allophant_tpu.predictions import (
            JsonlWriter,
            PredictionMetaData,
            PredictionReader,
            UtterancePrediction,
        )

        indexer = PhoneticAttributeIndexer(FeatureSet.PHOIBLE, mini_allophoible_csv())
        meta = PredictionMetaData(
            "test", "ucla-phonetic", ["spa", "ita"], "phoible", indexer.state(),
            ["phoneme", "nasal"],
            label_inventories={"spa": ["a", "t", "n"], "ita": ["a", "s", "i"]},
        )
        rng = np.random.default_rng(0)
        pool = ["a", "t", "n", "s", "i", "e", "o"]
        path = str(tmp_path / "predictions.jsonl")
        with JsonlWriter(path, meta) as writer:
            for index in range(12):
                language = "spa" if index % 2 == 0 else "ita"
                labels = [list(rng.choice(pool, rng.integers(1, 6)))]
                candidates = [
                    list(rng.choice(pool, rng.integers(0, 6))) for _ in range(3)
                ]
                nasal = [["-"] * max(len(candidates[0]), 1)]
                writer.write(
                    UtterancePrediction(
                        language, f"utt{index}",
                        {"phoneme": candidates, "nasal": nasal},
                        labels=labels,
                    )
                )

        with PredictionReader(path) as reader:
            device_stats = compute_edit_statistics(reader, map_phonemes=False, scorer="device")
        with PredictionReader(path) as reader:
            host_stats = compute_edit_statistics(reader, map_phonemes=False, scorer="host")

        for language in device_stats:
            for name in device_stats[language]:
                dev = device_stats[language][name]
                host = host_stats[language][name]
                assert (dev.insertions, dev.deletions, dev.substitutions, dev.correct) == (
                    host.insertions, host.deletions, host.substitutions, host.correct
                ), (language, name)


class TestEmptyReferenceHandling:
    def test_both_scorers_skip_empty_references(self, tmp_path):
        """An utterance with an empty reference and non-exact candidates scores
        +inf for every candidate: the reference warns and skips it
        (run.py:457-462). Both scorer paths must skip identically — previously
        the host path crashed (adding None) and the device path silently
        counted the insertions."""
        import warnings as warnings_module

        from fixtures import mini_allophoible_csv
        from allophant_tpu.evaluation_runner import compute_edit_statistics
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer
        from allophant_tpu.predictions import (
            JsonlWriter,
            PredictionMetaData,
            PredictionReader,
            UtterancePrediction,
        )

        indexer = PhoneticAttributeIndexer(FeatureSet.PHOIBLE, mini_allophoible_csv())
        meta = PredictionMetaData(
            "test", "ucla-phonetic", ["spa"], "phoible", indexer.state(), ["phoneme"],
            label_inventories={"spa": ["a", "t", "n"]},
        )
        path = str(tmp_path / "predictions.jsonl")
        with JsonlWriter(path, meta) as writer:
            writer.write(
                UtterancePrediction("spa", "empty", {"phoneme": [["a", "t"]]}, labels=[[]])
            )
            writer.write(
                UtterancePrediction("spa", "real", {"phoneme": [["a", "t"]]}, labels=[["a", "t"]])
            )

        results = {}
        for scorer in ("host", "device"):
            with PredictionReader(path) as reader:
                with warnings_module.catch_warnings(record=True) as caught:
                    warnings_module.simplefilter("always")
                    statistics = compute_edit_statistics(
                        reader, map_phonemes=False, scorer=scorer
                    )
                assert any("empty" in str(warning.message) for warning in caught)
            results[scorer] = statistics["spa"]["phoneme"]

        # Only the real utterance counts: 2 correct, nothing else.
        for scorer, stats in results.items():
            assert stats.correct == 2, scorer
            assert stats.insertions == 0, scorer
            assert stats.deletions == 0 and stats.substitutions == 0, scorer
