"""Differential tests: the reference's own evaluation pipeline against ours.

Executes the reference's real ``run.py`` evaluation code — ``EvaluationProcessor``
(remap/unicode-fix/complex-split preparation, run.py:280-368),
``_compute_edit_statistics`` (best-of-n-best accumulation, run.py:434-466), the
``evaluate`` aggregation (run.py:469-499) and ``get_attribute_error_rates``'s
macro-average report (get_attribute_error_rates.py:23-90) — on predictions
produced by OUR predict CLI, and requires our evaluation stack to reproduce the
reference's numbers exactly. This covers two parity surfaces at once:

- the JSONL prediction format: the reference's ``PredictionReader`` consumes our
  files (metadata parsed into the reference's own dataclasses, utterances via
  the reference's reader);
- the metric pipeline behind every published PER/AER number: same edit
  statistics per (language, classifier), same per-language/total aggregation,
  same formatted report, same macro averages.

``allophant.phonemes`` (the Rust scorer) is shimmed with our API-identical
module on both sides, so raw Levenshtein semantics cancel out of the comparison
(they are pinned separately by brute-force tests in test_phonemes.py); what this
file genuinely differentials is everything the reference layers on top of the
scorer.
"""

from __future__ import annotations

import json
import sys
from argparse import Namespace
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from reference_shim import (
    load_reference_error_rates,
    load_reference_phonetics,
    load_reference_predictions,
    load_reference_run,
    reference_available,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted at /root/reference"
)

torch = pytest.importorskip("torch")

from allophant_tpu.cli import error_rates as error_rates_cli
from allophant_tpu.cli import run as run_cli
from allophant_tpu.config import Config
from allophant_tpu.evaluation_runner import compute_edit_statistics
from allophant_tpu.models.allophant import attribute_graph_from_config
from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
from allophant_tpu.predictions import PredictionReader
from allophant_tpu.training.estimator import Estimator

from fixtures import mini_allophoible_csv, mini_config_dict
from test_cli import _write_wav


@pytest.fixture(autouse=True)
def _pandas2_string_semantics():
    """The reference targets pandas < 3: its indexer assigns ndarray cells into
    string columns, which pandas 3's inferred ``str`` dtype rejects. Disabling
    string inference restores pre-3 object columns for both sides so the
    comparison measures code, not pandas (same treatment as
    test_reference_differential.py)."""
    with pd.option_context("future.infer_string", False):
        yield


@pytest.fixture(scope="module")
def ref_modules():
    run = load_reference_run()
    predictions = load_reference_predictions()
    features, _, _ = load_reference_phonetics()
    return run, predictions, features


@pytest.fixture(scope="module")
def predictions_file(tmp_path_factory) -> str:
    """Predictions over a tiny two-language UCLA corpus, written by OUR predict CLI
    (an untrained checkpoint: outputs are arbitrary but deterministic, which is all
    a metric differential needs)."""
    tmp_path = tmp_path_factory.mktemp("reference_evaluation")

    corpus_root = tmp_path / "corpus"
    rng = np.random.default_rng(7)
    for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s"])]:
        base = corpus_root / language
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
                    rng.uniform(-0.3, 0.3, 1600 + 320 * index).astype(np.float32),
                )

    config = Config.load(mini_config_dict())
    indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
    estimator = Estimator.from_config(
        config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer,
        load_pretrained_weights=False,
    )
    checkpoint_path = str(tmp_path / "model.ckpt")
    estimator.save(checkpoint_path, phonetic_indexer_state=indexer.state())

    predictions_path = str(tmp_path / "predictions.jsonl")
    run_cli.main(
        [
            "predict", str(corpus_root), checkpoint_path, "--cpu", "--no-progress",
            "-t", "ucla-phonetic", "-m", "utterances", "-s", "2", "-o", predictions_path,
        ]
    )
    return predictions_path


def _typed_metadata(ref_predictions, ref_features, line: str):
    """Parses our metadata header into the reference's own dataclasses.

    In the real package this is marshmallow schema machinery
    (``PredictionMetaData.loads``, utils.py:244-270); the schema backend isn't
    importable here, so the (plumbing-only) field typing is done by hand: enum for
    ``feature_set``, the reference's ``PhoneticIndexerState`` /
    ``LanguageAllophoneMappings`` with int-keyed mappings restored from JSON."""
    data = json.loads(line)
    state = data["indexer_state"]
    allophones = state.get("language_allophones")
    language_allophones = (
        None
        if allophones is None
        else ref_features.LanguageAllophoneMappings(
            {
                int(language_id): {int(k): [int(i) for i in v] for k, v in mapping.items()}
                for language_id, mapping in allophones["allophones"].items()
            },
            list(allophones["languages"]),
            list(allophones["shared_phones"]),
        )
    )
    feature_set = sys.modules["allophant.config"].FeatureSet(data["feature_set"])
    return ref_predictions.PredictionMetaData(
        prediction_arguments=data["prediction_arguments"],
        corpus_type=data["corpus_type"],
        languages=list(data["languages"]),
        feature_set=feature_set,
        indexer_state=ref_features.PhoneticIndexerState(
            list(state["phoneme_inventory"]), language_allophones, state.get("table_file")
        ),
        classifiers=list(data["classifiers"]),
        label_inventories=data.get("label_inventories"),
        package_version=data.get("package_version", "unknown"),
        format_version=tuple(data["format_version"]),
    )


def _reference_reader_class(ref_predictions, ref_features):
    class _TypedMetadataReader(ref_predictions.PredictionReader):
        def read_meta(self):
            return _typed_metadata(ref_predictions, ref_features, self._file.readline())

    return _TypedMetadataReader


def _statistics_tuple(statistics):
    return (
        statistics.insertions,
        statistics.deletions,
        statistics.substitutions,
        statistics.correct,
    )


@pytest.mark.parametrize(
    "map_phonemes,fix_unicode,split_complex",
    [(False, False, False), (True, False, False), (True, True, True)],
    ids=["no-remap", "remap", "remap-fix-split"],
)
@pytest.mark.parametrize("scorer", ["device", "host"])
def test_edit_statistics_match_reference(
    predictions_file, ref_modules, map_phonemes, fix_unicode, split_complex, scorer
):
    """The reference's ``_compute_edit_statistics`` (run.py:434-466) on our
    prediction file, against ours — per (language, classifier) insertion/deletion/
    substitution/correct counts must be identical for every flag combination and
    for both our scorer backends."""
    ref_run, ref_predictions, ref_features = ref_modules

    arguments = Namespace(
        no_remap=not map_phonemes,
        fix_unicode=fix_unicode,
        split_complex=split_complex,
        no_progress=True,
    )
    reader_class = _reference_reader_class(ref_predictions, ref_features)
    with reader_class(predictions_file, gzip=False) as reader:
        reference_statistics = ref_run._compute_edit_statistics(arguments, reader)

    with PredictionReader(predictions_file, None) as reader:
        our_statistics = compute_edit_statistics(
            reader,
            map_phonemes=map_phonemes,
            fix_unicode=fix_unicode,
            split_complex=split_complex,
            scorer=scorer,
        )

    assert set(our_statistics) == set(reference_statistics)
    for language, reference_by_classifier in reference_statistics.items():
        assert set(our_statistics[language]) == set(reference_by_classifier)
        for name, reference_stats in reference_by_classifier.items():
            assert _statistics_tuple(our_statistics[language][name]) == _statistics_tuple(
                reference_stats
            ), f"{language}/{name} ({scorer})"


@pytest.mark.parametrize(
    "map_phonemes,split_complex", [(True, False), (False, True)], ids=["remap", "split"]
)
def test_edits_match_reference(predictions_file, ref_modules, map_phonemes, split_complex):
    """The reference's ``_compute_edits`` (run.py:502-519, the ``edits``
    subcommand's core: top-beam selection + remap + per-classifier alignment
    dumps) against our ``compute_edits`` on the same prediction file."""
    ref_run, ref_predictions, ref_features = ref_modules

    arguments = Namespace(
        no_remap=not map_phonemes,
        fix_unicode=False,
        split_complex=split_complex,
        no_progress=True,
    )
    reader_class = _reference_reader_class(ref_predictions, ref_features)
    with reader_class(predictions_file, gzip=False) as reader:
        reference_edits = list(ref_run._compute_edits(arguments, reader))

    from allophant_tpu.evaluation_runner import compute_edits

    with PredictionReader(predictions_file, None) as reader:
        our_edits = list(
            compute_edits(reader, map_phonemes=map_phonemes, split_complex=split_complex)
        )

    assert len(our_edits) == len(reference_edits)
    for ours, reference in zip(our_edits, reference_edits):
        assert ours.language == reference.language
        assert ours.utterance_id == reference.utterance_id
        assert ours.expected == reference.expected
        # Action enums are distinct classes across the packages; compare by value.
        normalized_ours = {
            name: [(action.value, expected, actual) for action, expected, actual in operations]
            for name, operations in ours.edit_operations.items()
        }
        normalized_reference = {
            name: [(action.value, expected, actual) for action, expected, actual in operations]
            for name, operations in reference.edit_operations.items()
        }
        assert normalized_ours == normalized_reference


def test_evaluate_text_report_matches_reference(
    predictions_file, ref_modules, tmp_path, monkeypatch
):
    """Full ``evaluate`` both sides: identical formatted report (per-language and
    total sections, per-classifier edit statistics and 4-decimal error rates,
    reference run.py:469-499) modulo the Command/Version header."""
    ref_run, ref_predictions, ref_features = ref_modules
    monkeypatch.setattr(
        ref_run, "PredictionReader", _reference_reader_class(ref_predictions, ref_features)
    )

    reference_report_path = tmp_path / "reference_report.txt"
    with open(reference_report_path, "w", encoding="utf-8") as output:
        ref_run.evaluate(
            Namespace(
                prediction_path=predictions_file,
                decompress=False,
                no_remap=False,
                fix_unicode=False,
                split_complex=False,
                no_progress=True,
                output=output,
                json=False,
            )
        )

    our_report_path = str(tmp_path / "our_report.txt")
    run_cli.main(["evaluate", predictions_file, "-o", our_report_path])

    with open(reference_report_path, "r", encoding="utf-8") as file:
        reference_lines = file.read().splitlines()
    with open(our_report_path, "r", encoding="utf-8") as file:
        our_lines = file.read().splitlines()

    # Line 0 is "Command: <argparse namespace repr>", line 1 "Version: <package>" —
    # legitimately different across implementations.
    assert reference_lines[0].startswith("Command:") and our_lines[0].startswith("Command:")
    assert reference_lines[1].startswith("Version:") and our_lines[1].startswith("Version:")
    assert our_lines[2:] == reference_lines[2:]


def _parse_error_rate_report(lines, languages, classifiers):
    """Structures a macro-average report (ours or the reference's) for comparison.

    Both tools print, in order: per-language IPA-category sections each followed by
    one average line, per-language attribute means, per-attribute means, and the
    overall average (reference get_attribute_error_rates.py:59-90). Labels differ
    slightly between the tools, so rows are consumed positionally and keyed by the
    leading name; average-line labels are normalized to the category order."""
    numeric_rows = []
    for line in lines:
        name, _, value = line.rpartition(",")
        try:
            numeric_rows.append((name, float(value)))
        except ValueError:
            continue

    parsed = {}
    position = 0
    ipa_categories = [name for name in ("phone", "phoneme") if name in classifiers]
    for category in ipa_categories:
        for language in languages:
            row_name, value = numeric_rows[position]
            assert row_name == language, (category, row_name)
            parsed[(category, language)] = value
            position += 1
        assert numeric_rows[position][0].startswith("Average")
        parsed[(category, "average")] = numeric_rows[position][1]
        position += 1

    attributes = [name for name in classifiers if name not in ipa_categories]
    if not attributes:
        # Baseline models: no attribute classifiers, both tools print a
        # "No Attribute Error Rates" notice and stop.
        assert position == len(numeric_rows)
        assert any("No Attribute Error Rates" in line for line in lines)
        return parsed
    for language in languages:
        row_name, value = numeric_rows[position]
        assert row_name == language
        parsed[("attributes", language)] = value
        position += 1
    for attribute in attributes:
        row_name, value = numeric_rows[position]
        assert row_name == attribute
        parsed[("attribute", attribute)] = value
        position += 1
    assert numeric_rows[position][0] == "Average"
    parsed[("attributes", "average")] = numeric_rows[position][1]
    assert position + 1 == len(numeric_rows)
    return parsed


def _typed_results_loader(ref_evaluation, results_data):
    """The reference loads results through marshmallow schemas (not importable
    here); hands the (plumbing-only) loader its own dataclasses directly.
    Fresh objects per call: ``get_attribute_error_rates.main`` mutates them."""

    def _load(cls, _file):
        return cls(
            results_data["evaluation_arguments"],
            {
                language: ref_evaluation.EvaluationResults(
                    list(entry["properties"]), dict(entry["error_rates"]), {}
                )
                for language, entry in results_data["results"].items()
            },
            results_data["package_version"],
        )

    return classmethod(_load)


_PUBLISHED_RESULT_FILES = (
    sorted(
        path.name for path in Path("/root/reference/interspeech_results").glob("*.json")
    )
    if reference_available()
    else []
)


@pytest.mark.skipif(not _PUBLISHED_RESULT_FILES, reason="interspeech results not mounted")
@pytest.mark.parametrize("result_file", _PUBLISHED_RESULT_FILES)
def test_published_tables_match_reference(result_file, capsys, monkeypatch):
    """Both tools over the reference's actual released result files
    (`interspeech_results/*.json` — the data behind the paper's headline PER/AER
    table): `get_attribute_error_rates` and `allophant-error-rates` must print
    identical per-language PERs, per-language/per-attribute macro AERs and the
    overall averages for every released checkpoint x corpus."""
    ref_error_rates = load_reference_error_rates()
    ref_evaluation = sys.modules["allophant.evaluation"]

    results_path = f"/root/reference/interspeech_results/{result_file}"
    with open(results_path, "r", encoding="utf-8") as file:
        results_data = json.load(file)

    languages = [name for name in results_data["results"] if name != "total"]
    # Report ordering follows the error-rate dict of the first language (what
    # both tools iterate), not the `properties` list.
    classifiers = list(results_data["results"][languages[0]]["error_rates"])

    monkeypatch.setattr(
        ref_evaluation.MultilingualEvaluationResults,
        "load",
        _typed_results_loader(ref_evaluation, results_data),
    )

    ref_error_rates.main([results_path])
    reference_lines = capsys.readouterr().out.splitlines()
    error_rates_cli.main([results_path])
    our_lines = capsys.readouterr().out.splitlines()

    reference_parsed = _parse_error_rate_report(reference_lines, languages, classifiers)
    our_parsed = _parse_error_rate_report(our_lines, languages, classifiers)

    assert set(our_parsed) == set(reference_parsed)
    for key, reference_value in reference_parsed.items():
        assert our_parsed[key] == pytest.approx(reference_value, rel=1e-9), key


def test_error_rate_report_matches_reference(
    predictions_file, ref_modules, tmp_path, capsys, monkeypatch
):
    """``get_attribute_error_rates`` (the published-table generator) against our
    ``allophant-error-rates`` on the same evaluation results: identical
    per-language PER rows, per-language/per-attribute macro AERs and overall
    averages."""
    _, ref_predictions, ref_features = ref_modules
    ref_error_rates = load_reference_error_rates()
    ref_evaluation = sys.modules["allophant.evaluation"]

    results_path = str(tmp_path / "results.json")
    run_cli.main(["evaluate", predictions_file, "--no-remap", "-j", "-o", results_path])
    with open(results_path, "r", encoding="utf-8") as file:
        results_data = json.load(file)

    languages = [name for name in results_data["results"] if name != "total"]
    classifiers = results_data["results"]["total"]["properties"]

    monkeypatch.setattr(
        ref_evaluation.MultilingualEvaluationResults,
        "load",
        _typed_results_loader(ref_evaluation, results_data),
    )

    ref_error_rates.main([results_path])
    reference_lines = capsys.readouterr().out.splitlines()
    error_rates_cli.main([results_path])
    our_lines = capsys.readouterr().out.splitlines()

    reference_parsed = _parse_error_rate_report(reference_lines, languages, classifiers)
    our_parsed = _parse_error_rate_report(our_lines, languages, classifiers)

    assert set(our_parsed) == set(reference_parsed)
    for key, reference_value in reference_parsed.items():
        assert our_parsed[key] == pytest.approx(reference_value, rel=1e-9), key
