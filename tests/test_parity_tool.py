"""Tests for tools/parity_check.py: each parity command runs end to end against
synthetic stand-ins for the (offline-unavailable) released artifacts."""

import json
import os
import subprocess
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOOL = os.path.join(REPO_ROOT, "tools", "parity_check.py")

def _run_tool(*args):
    environment = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO_ROOT)
    return subprocess.run(
        [sys.executable, TOOL, *args], capture_output=True, text=True, env=environment
    )


class TestActivationsCommand:
    def test_tiny_hf_model_passes(self, tmp_path):
        import torch
        from transformers import Wav2Vec2Config
        from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model

        config = Wav2Vec2Config(
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=2,
            intermediate_size=48,
            conv_dim=(12, 16),
            conv_kernel=(4, 3),
            conv_stride=(2, 2),
            conv_bias=True,
            num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4,
            do_stable_layer_norm=True,
            feat_extract_norm="layer",
            hidden_dropout=0.0,
            activation_dropout=0.0,
            attention_dropout=0.0,
            feat_proj_dropout=0.0,
            layerdrop=0.0,
            apply_spec_augment=False,
        )
        torch.manual_seed(0)
        model_dir = str(tmp_path / "hf_model")
        Wav2Vec2Model(config).save_pretrained(model_dir)

        result = _run_tool("activations", model_dir, "--seconds", "0.1")
        assert result.returncode == 0, result.stdout + result.stderr
        assert "worst layer diff" in result.stdout

    def test_exceeding_tolerance_fails(self, tmp_path):
        # Exercise the failure exit path: any real float noise between the two
        # frameworks exceeds a zero tolerance.
        import torch
        from transformers import Wav2Vec2Config
        from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model

        config = Wav2Vec2Config(
            hidden_size=32,
            num_hidden_layers=1,
            num_attention_heads=2,
            intermediate_size=48,
            conv_dim=(12,),
            conv_kernel=(4,),
            conv_stride=(2,),
            do_stable_layer_norm=True,
            feat_extract_norm="layer",
            hidden_dropout=0.0,
            activation_dropout=0.0,
            attention_dropout=0.0,
            feat_proj_dropout=0.0,
            layerdrop=0.0,
            apply_spec_augment=False,
        )
        torch.manual_seed(0)
        model_dir = str(tmp_path / "hf_model")
        Wav2Vec2Model(config).save_pretrained(model_dir)

        result = _run_tool("activations", model_dir, "--seconds", "0.1", "--tolerance", "0")
        assert result.returncode == 1


class TestCheckpointCommand:
    def test_native_checkpoint_smoke(self, tmp_path):
        from allophant_tpu.config import Config
        from allophant_tpu.models.allophant import attribute_graph_from_config
        from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
        from allophant_tpu.training import Estimator

        from fixtures import mini_allophoible_csv, mini_config_dict

        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        estimator = Estimator.from_config(
            config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer,
            load_pretrained_weights=False,
        )
        path = str(tmp_path / "model.ckpt")
        estimator.save(path, phonetic_indexer_state=indexer.state())

        result = _run_tool("checkpoint", path)
        assert result.returncode == 0, result.stdout + result.stderr
        assert "smoke forward OK" in result.stdout


class TestErrorRatesCommand:
    def test_subcommand_end_to_end(self, tmp_path):
        """predict -> evaluate -> tool comparison: our own evaluation of our own
        predictions must match to 0 difference (exit 0); a perturbed reference
        must fail the gate (exit 1)."""
        import wave

        from allophant_tpu.cli import run as run_cli
        from allophant_tpu.config import Config
        from allophant_tpu.models.allophant import attribute_graph_from_config
        from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
        from allophant_tpu.training import Estimator

        import numpy as np

        from fixtures import mini_allophoible_csv, mini_config_dict

        # Tiny UCLA corpus.
        rng = np.random.default_rng(0)
        corpus_root = tmp_path / "corpus"
        for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s"])]:
            base = corpus_root / language
            (base / "audio").mkdir(parents=True)
            with open(base / "inventory", "w", encoding="utf-8") as file:
                for phoneme in phonemes:
                    file.write(f"{phoneme} 5\n")
            with open(base / "raw", "w", encoding="utf-8") as raw, open(
                base / "text", "w", encoding="utf-8"
            ) as text:
                for index in range(2):
                    utterance = f"{language}_{index}"
                    raw.write(f"{utterance} rawform\n")
                    text.write(f"{utterance} {' '.join(phonemes)}\n")
                    data = (rng.uniform(-0.3, 0.3, 1600) * 32767).astype("<i2")
                    with wave.open(str(base / "audio" / f"{utterance}.wav"), "wb") as file:
                        file.setnchannels(1)
                        file.setsampwidth(2)
                        file.setframerate(16000)
                        file.writeframes(data.tobytes())

        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        estimator = Estimator.from_config(
            config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer,
            load_pretrained_weights=False,
        )
        checkpoint = str(tmp_path / "model.ckpt")
        estimator.save(checkpoint, phonetic_indexer_state=indexer.state())

        predictions = str(tmp_path / "predictions.jsonl")
        run_cli.main([
            "predict", str(corpus_root), checkpoint, "--cpu", "--no-progress",
            "-t", "ucla-phonetic", "-m", "utterances", "-s", "2", "-o", predictions,
        ])
        results = str(tmp_path / "results.json")
        run_cli.main(["evaluate", predictions, "--no-remap", "-j", "-o", results])

        matching = _run_tool("error-rates", predictions, results, "--no-remap")
        assert matching.returncode == 0, matching.stdout + matching.stderr
        assert "OK" in matching.stdout

        # Perturb every error rate in the reference beyond the tolerance.
        with open(results, "r", encoding="utf-8") as file:
            perturbed = json.load(file)
        for entry in perturbed["results"].values():
            entry["error_rates"] = {
                name: value + 0.05 for name, value in entry["error_rates"].items()
            }
        perturbed_path = str(tmp_path / "perturbed.json")
        with open(perturbed_path, "w", encoding="utf-8") as file:
            json.dump(perturbed, file)
        failing = _run_tool("error-rates", predictions, perturbed_path, "--no-remap")
        assert failing.returncode == 1, failing.stdout + failing.stderr

    def test_self_comparison_passes(self, tmp_path):
        # Evaluate the reference repo's own published results file against
        # itself through the tool's comparison: macro rates must match exactly.
        reference = "/root/reference/interspeech_results/allophant_ucla.json"
        if not os.path.exists(reference):
            pytest.skip("reference results not mounted")
        from allophant_tpu.evaluation import (
            MultilingualEvaluationResults,
            macro_average_error_rates,
        )

        macro = macro_average_error_rates(MultilingualEvaluationResults.load(reference))
        # Published README values: UCLA PER 45.62% / AER 19.44% (macro, 84 langs).
        assert macro["phoneme_error_rate"] * 100 == pytest.approx(45.62, abs=0.01)
        assert macro["attribute_error_rate"] * 100 == pytest.approx(19.44, abs=0.01)

    def test_comparison_math(self, tmp_path):
        # Direct unit check of the comparison: identical files -> OK, perturbed
        # reference -> FAIL.
        from allophant_tpu.evaluation import (
            EvaluationResults,
            MultilingualEvaluationResults,
        )
        from allophant_tpu.phonemes import EditStatistics

        stats = EditStatistics(1, 2, 3, 14)
        results = MultilingualEvaluationResults(
            "",
            {
                "spa": EvaluationResults(["phoneme"], {"phoneme": 0.30}, {"phoneme": stats}),
                "total": EvaluationResults(["phoneme"], {"phoneme": 0.30}, {"phoneme": stats}),
            },
        )
        same = str(tmp_path / "same.json")
        with open(same, "w", encoding="utf-8") as file:
            json.dump(results.to_json(), file)

        worse = MultilingualEvaluationResults(
            "",
            {
                "spa": EvaluationResults(["phoneme"], {"phoneme": 0.35}, {"phoneme": stats}),
                "total": EvaluationResults(["phoneme"], {"phoneme": 0.35}, {"phoneme": stats}),
            },
        )
        worse_path = str(tmp_path / "worse.json")
        with open(worse_path, "w", encoding="utf-8") as file:
            json.dump(worse.to_json(), file)

        from allophant_tpu.evaluation import macro_average_error_rates

        ours = macro_average_error_rates(MultilingualEvaluationResults.load(same))
        theirs = macro_average_error_rates(MultilingualEvaluationResults.load(worse_path))
        assert abs(ours["phoneme_error_rate"] - theirs["phoneme_error_rate"]) * 100 > 0.1


class TestAllCommand:
    """Dry run of the artifacts-day orchestrator (``parity_check.py all``) on
    synthetic stand-ins: a tiny fresh checkpoint, a synthetic UCLA corpus, and a
    "published" results file generated from the tool's own predictions (so the
    gate passes at zero difference)."""

    def _write_wav(self, file_path, samples):
        import wave

        import numpy as np

        with wave.open(str(file_path), "wb") as file:
            file.setnchannels(1)
            file.setsampwidth(2)
            file.setframerate(16000)
            file.writeframes((np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes())

    def _build_artifacts(self, tmp_path):
        import numpy as np

        sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))
        from fixtures import mini_allophoible_csv, mini_config_dict

        from allophant_tpu.config import Config
        from allophant_tpu.models.allophant import attribute_graph_from_config
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer
        from allophant_tpu.training import Estimator

        corpus_dir = tmp_path / "corpora"
        ucla = corpus_dir / "ucla"
        rng = np.random.default_rng(0)
        for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s"])]:
            base = ucla / language
            (base / "audio").mkdir(parents=True)
            with open(base / "inventory", "w", encoding="utf-8") as file:
                for phoneme in phonemes:
                    file.write(f"{phoneme} 5\n")
            with open(base / "raw", "w", encoding="utf-8") as raw, open(
                base / "text", "w", encoding="utf-8"
            ) as text:
                for index in range(2):
                    utterance = f"{language}_{index}"
                    raw.write(f"{utterance} rawform\n")
                    text.write(f"{utterance} {' '.join(phonemes)}\n")
                    self._write_wav(
                        base / "audio" / f"{utterance}.wav",
                        rng.uniform(-0.3, 0.3, 1600 + 320 * index).astype("float32"),
                    )

        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer(
            FeatureSet.PHOIBLE,
            mini_allophoible_csv(),
            attribute_subset=[entry.name for entry in config.nn.projection.classes],
            language_inventories=["spa", "ita"],
        )
        estimator = Estimator.from_config(
            config, 1, 16_000,
            attribute_graph_from_config(config, indexer), indexer,
            load_pretrained_weights=False,
        )
        checkpoint_dir = tmp_path / "checkpoints"
        checkpoint_dir.mkdir()
        estimator.save(str(checkpoint_dir / "allophant.pt"), phonetic_indexer_state=indexer.state())
        return checkpoint_dir, corpus_dir, ucla

    def test_dry_run_passes_at_zero_difference(self, tmp_path):
        checkpoint_dir, corpus_dir, _ucla = self._build_artifacts(tmp_path)

        sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
        import parity_check

        from allophant_tpu.evaluation_runner import (
            compute_edit_statistics,
            summarize_edit_statistics,
        )
        from allophant_tpu.predictions import PredictionReader

        # First pass: predictions exist afterwards; generate the synthetic
        # "published" results from them so the diff is exactly zero.
        output_dir = tmp_path / "outputs"
        results_dir = tmp_path / "published"
        results_dir.mkdir()
        status = parity_check.check_all(
            str(checkpoint_dir), str(corpus_dir),
            output_dir=str(output_dir), reference_results=str(results_dir),
            models=["allophant"],
        )
        assert status == 2  # ran nothing: no published results yet
        # check_all skipped before predicting; produce the predictions by
        # pointing it at a published file generated from a direct CLI run.
        from allophant_tpu.cli import run as run_cli

        predictions_path = output_dir / "allophant_ucla.jsonl"
        run_cli.main([
            "predict", str(_ucla), str(checkpoint_dir / "allophant.pt"),
            "-t", "ucla-phonetic", "-o", str(predictions_path), "--no-progress",
            "-m", "utterances", "-s", "2",
        ])
        with PredictionReader(str(predictions_path)) as reader:
            statistics = compute_edit_statistics(reader, map_phonemes=True)
            results = summarize_edit_statistics(statistics, reader.metadata.classifiers)
        results.dump(str(results_dir / "allophant_ucla.json"))

        status = parity_check.check_all(
            str(checkpoint_dir), str(corpus_dir),
            output_dir=str(output_dir), reference_results=str(results_dir),
            models=["allophant"],
        )
        assert status == 0

    def test_empty_dirs_exit_2(self, tmp_path):
        sys.path.insert(0, os.path.join(REPO_ROOT, "tools"))
        import parity_check

        empty_checkpoints = tmp_path / "ckpts"
        empty_corpora = tmp_path / "corpora"
        empty_checkpoints.mkdir()
        empty_corpora.mkdir()
        assert parity_check.check_all(str(empty_checkpoints), str(empty_corpora)) == 2
