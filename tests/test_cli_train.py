"""End-to-end train CLI test on a tiny synthetic Common Voice corpus."""

import json
import os
import wave

import numpy as np

from allophant_tpu.cli import run as run_cli
from allophant_tpu.data.common_voice import (
    CommonVoiceCorpus,
    CommonVoiceCorpusMeta,
    Transcription,
)
from allophant_tpu.data.g2p import PhonemeTranscription, TaggedTranscription
from allophant_tpu.data.speech_corpus import LanguageData, LanguageInfo
from allophant_tpu.training import checkpoint as checkpoint_module

from fixtures import mini_allophoible_csv, mini_config_dict


def _write_wav(path, samples: np.ndarray, rate: int = 16000):
    data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as file:
        file.setnchannels(1)
        file.setsampwidth(2)
        file.setframerate(rate)
        file.writeframes(data.tobytes())


def _build_cv_corpus(root: str) -> None:
    rng = np.random.default_rng(0)
    phoneme_sets = {"es": ["a", "o", "n"], "it": ["a", "s", "i"]}
    for split, count in [("train", 3), ("dev", 2), ("test", 1)]:
        languages = []
        for language, phonemes in phoneme_sets.items():
            transcriptions = []
            for index in range(count):
                utterance = f"{language}_{split}_{index}"
                transcriptions.append(
                    Transcription(
                        "text", utterance, "client", None, None, None,
                        PhonemeTranscription(
                            ["text"], [[TaggedTranscription(list(phonemes), None)]]
                        ),
                    )
                )
                clips = os.path.join(root, language, "clips")
                os.makedirs(clips, exist_ok=True)
                _write_wav(
                    os.path.join(clips, f"{utterance}.wav"),
                    rng.uniform(-0.3, 0.3, 1600 + 160 * index).astype(np.float32),
                )
            languages.append(
                LanguageData(LanguageInfo(language, sorted(phonemes), [{}]), transcriptions)
            )
        corpus = CommonVoiceCorpus(
            root, languages, CommonVoiceCorpusMeta("cv-mini", audio_format="wav")
        )
        corpus.save(root, split)


def test_train_cli_end_to_end(tmp_path):
    corpus_root = str(tmp_path / "cv")
    os.makedirs(corpus_root)
    _build_cv_corpus(corpus_root)

    attribute_path = str(tmp_path / "features.csv")
    with open(attribute_path, "w", encoding="utf-8") as file:
        file.write(mini_allophoible_csv())

    config = mini_config_dict()
    config["nn"]["batch_size"] = 2
    config["nn"]["maximum_iterations"] = 1
    config["data"]["languages"] = ["es", "it"]

    save_path = str(tmp_path / "model.ckpt")
    run_cli.main(
        [
            "train",
            corpus_root,
            "--cpu",
            "--no-progress",
            "-j",
            json.dumps(config),
            "-a",
            attribute_path,
            "-s",
            save_path,
        ]
    )
    assert os.path.isfile(save_path)

    checkpoint = checkpoint_module.load_checkpoint(save_path)
    assert checkpoint.variables is not None
    assert checkpoint.phonetic_indexer_state is not None
    # Restorable end to end.
    from allophant_tpu.training import Estimator

    estimator, indexer = Estimator.restore(checkpoint)
    assert "phoneme" in estimator.classes
