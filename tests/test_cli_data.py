"""End-to-end `allophant-data` CLI tests: save-lengths, preprocess, stats on a tiny
Common Voice corpus, plus `allophant-features` inventory extraction."""

import json
import os

import numpy as np
import pytest

from allophant_tpu.cli import data as data_cli
from allophant_tpu.cli import features as features_cli

from fixtures import build_cv_corpus, mini_allophoible_csv, mini_config_dict


@pytest.fixture
def cv_root(tmp_path):
    root = str(tmp_path / "cv")
    os.makedirs(root)
    build_cv_corpus(root)
    return root


@pytest.fixture
def config_json():
    return json.dumps(mini_config_dict())


class TestSaveLengths:
    def test_lengths_roundtrip(self, cv_root, tmp_path, config_json):
        from allophant_tpu.data.store import preprocessed_features_or_lengths

        output = str(tmp_path / "lengths")
        data_cli.main(["save-lengths", cv_root, output, "-j", config_json])
        data = preprocessed_features_or_lengths(output, {"train": ["es", "it"]})
        lengths = data["train"].lengths
        assert lengths.shape == (6,)  # 3 utterances x 2 languages
        # RAW features: frame count == sample count (1600 + 160 * i).
        assert sorted(lengths.tolist())[:2] == [1600, 1600]


class TestPreprocess:
    def test_features_roundtrip(self, cv_root, tmp_path, config_json):
        from allophant_tpu.data.store import preprocessed_features_or_lengths

        output = str(tmp_path / "features")
        data_cli.main(["preprocess", cv_root, output, "-j", config_json])
        data = preprocessed_features_or_lengths(
            output, {"test": ["es", "it"]}, lengths_only=False
        )
        features = data["test"].features
        assert len(features) == 2  # 1 per language in test split
        assert features[0].shape[1] == 1  # RAW feature size


class TestStats:
    def test_stats_with_lengths(self, cv_root, tmp_path, config_json, capsys):
        lengths_dir = str(tmp_path / "lengths")
        data_cli.main(["save-lengths", cv_root, lengths_dir, "-j", config_json])
        data_cli.main(
            ["stats", cv_root, "-l", lengths_dir, "-s", "train,dev", "-j", "-r", "16000"]
        )
        statistics = json.loads(capsys.readouterr().out)
        assert statistics["train"]["utterance_counts"] == {"es": 3, "it": 3}
        assert "durations" in statistics["train"]

    def test_stats_pretty(self, cv_root, capsys):
        data_cli.main(["stats", cv_root, "-s", "train"])
        output = capsys.readouterr().out
        assert "es: 3 utterances" in output


class TestFeaturesCli:
    def test_extract_inventories(self, tmp_path, capsys):
        table_path = str(tmp_path / "table.csv")
        with open(table_path, "w", encoding="utf-8") as file:
            file.write(mini_allophoible_csv())
        out_path = str(tmp_path / "processed.csv")
        features_cli.main(["spa,ita", "-p", table_path, "-o", out_path])
        import pandas as pd

        processed = pd.read_csv(out_path)
        assert set(processed["ISO6393"].dropna().unique()) >= {"spa", "ita"}
        # The processed table renames Phoneme to lowercase like the reference
        # (phonetic_features.py:1164-1166).
        assert "phoneme" in processed.columns


class TestReferenceFlagSpellings:
    """The reference's exact flag spellings parse (datasets/__main__.py:377-539)."""

    def test_transcribe_short_upvote_flag(self):
        args = data_cli.make_parser().parse_args(["transcribe", "/tmp/cv", "-u"])
        assert args.include_single_upvote is True

    def test_stats_short_primary_script_flag(self):
        args = data_cli.make_parser().parse_args(["stats", "/tmp/cv", "-p"])
        assert args.only_primary_script is True

    def test_download_meta_positional_output(self, tmp_path):
        out_path = str(tmp_path / "meta.json")
        args = data_cli.make_parser().parse_args(["download-meta", out_path])
        assert args.output.name == out_path
        args.output.close()

    def test_download_meta_output_defaults_to_stdout(self):
        import sys

        args = data_cli.make_parser().parse_args(["download-meta"])
        assert args.output is sys.stdout
