"""Shared test fixtures: a miniature Allophoible-format feature table and configs."""

from io import StringIO

import pandas as pd

# Feature columns in PHOIBLE order: "tone" first, classifier features after.
FEATURES = [
    "tone",
    "stress",
    "syllabic",
    "consonantal",
    "sonorant",
    "continuant",
    "nasal",
    "labial",
    "high",
    "low",
]

#                     tone stress syl  cons son  cont nas  lab  high low
_SEGMENTS = {
    "a":     ("vowel",     "-", "-", "+", "-", "+", "+", "-", "-", "-", "+"),
    "e":     ("vowel",     "-", "-", "+", "-", "+", "+", "-", "-", "-", "-"),
    "i":     ("vowel",     "-", "-", "+", "-", "+", "+", "-", "-", "+", "-"),
    "o":     ("vowel",     "-", "-", "+", "-", "+", "+", "-", "+", "-", "-"),
    "u":     ("vowel",     "-", "-", "+", "-", "+", "+", "-", "+", "+", "-"),
    "p":     ("consonant", "-", "-", "-", "+", "-", "-", "-", "+", "-", "-"),
    "b":     ("consonant", "-", "-", "-", "+", "-", "-", "-", "+", "-", "-"),
    "t":     ("consonant", "-", "-", "-", "+", "-", "-", "-", "-", "-", "-"),
    "d":     ("consonant", "-", "-", "-", "+", "-", "-", "-", "-", "-", "-"),
    "k":     ("consonant", "-", "-", "-", "+", "-", "-", "-", "-", "+", "-"),
    "ɡ":     ("consonant", "-", "-", "-", "+", "-", "-", "-", "-", "+", "-"),
    "m":     ("consonant", "-", "-", "-", "+", "+", "-", "+", "+", "-", "-"),
    "n":     ("consonant", "-", "-", "-", "+", "+", "-", "+", "-", "-", "-"),
    "s":     ("consonant", "-", "-", "-", "+", "-", "+", "-", "-", "-", "-"),
    "z":     ("consonant", "-", "-", "-", "+", "-", "+", "-", "-", "-", "-"),
    "ʃ":     ("consonant", "-", "-", "-", "+", "-", "+", "-", "-", "+", "-"),
    "t͡ʃ":   ("consonant", "-", "-", "-", "+", "-", "-", "-", "-", "+", "-"),
    "ð":     ("consonant", "-", "-", "-", "+", "-", "+", "-", "-", "-", "-"),
    "β":     ("consonant", "-", "-", "-", "+", "-", "+", "-", "+", "-", "-"),
    # Diphthong with a contour feature (high: -,+) to exercise contours.
    "ai̯":   ("vowel",     "-", "-", "+", "-", "+", "+", "-", "-", "-,+", "+,-"),
    # Non-syllabic i, the diphthong's second subsegment.
    "i̯":    ("vowel",     "-", "-", "-", "-", "+", "+", "-", "-", "+", "-"),
}

_INVENTORIES = {
    # (InventoryID, ISO6393, LanguageName, dialect): {phoneme: allophones}
    (1, "spa", "Spanish", ""): {
        "a": "a", "e": "e", "i": "i", "o": "o", "u": "u",
        "p": "p", "t": "t", "k": "k",
        "b": "b β", "d": "d ð", "ɡ": "ɡ",
        "m": "m", "n": "n", "s": "s", "t͡ʃ": "t͡ʃ",
    },
    (2, "ita", "Italian", ""): {
        "a": "a", "e": "e", "i": "i", "o": "o", "u": "u",
        "p": "p", "t": "t", "k": "k", "b": "b", "d": "d", "ɡ": "ɡ",
        "m": "m", "n": "n", "s": "s z", "t͡ʃ": "t͡ʃ", "ʃ": "ʃ",
    },
    (3, "deu", "German", ""): {
        "a": "a", "e": "e", "i": "i", "o": "o", "u": "u", "ai̯": "ai̯",
        "p": "p", "t": "t", "k": "k", "b": "b", "d": "d", "ɡ": "ɡ",
        "m": "m", "n": "n", "s": "s", "z": "z", "ʃ": "ʃ",
    },
}

METADATA_COLUMNS = [
    "InventoryID",
    "Glottocode",
    "ISO6393",
    "LanguageName",
    "SpecificDialect",
    "GlyphID",
    "Phoneme",
    "Allophones",
    "Marginal",
    "SegmentClass",
    "Source",
]


def mini_allophoible_csv() -> str:
    """Builds a small PHOIBLE/Allophoible-format CSV covering 3 languages."""
    rows = []

    def add_row(inventory_id, iso, name, dialect, phoneme, allophones, marginal):
        segment_class, *feature_values = _SEGMENTS[phoneme]
        rows.append(
            {
                "InventoryID": inventory_id,
                "Glottocode": f"{iso}1234" if iso else "",
                "ISO6393": iso,
                "LanguageName": name,
                "SpecificDialect": dialect,
                "GlyphID": "+".join(f"{ord(c):04X}" for c in phoneme),
                "Phoneme": phoneme,
                "Allophones": allophones,
                "Marginal": marginal,
                "SegmentClass": segment_class,
                "Source": "test",
                **dict(zip(FEATURES, feature_values)),
            }
        )

    for (inventory_id, iso, name, dialect), inventory in _INVENTORIES.items():
        for phoneme, allophones in inventory.items():
            add_row(inventory_id, iso, name, dialect, phoneme, allophones, "FALSE")
    # Marginal rows provide standalone feature definitions for allophone-only segments
    # (as the full Allophoible does via other languages' inventories).
    add_row(4, "mis", "FeatureBank", "", "ð", "ð", "TRUE")
    add_row(4, "mis", "FeatureBank", "", "β", "β", "TRUE")
    add_row(4, "mis", "FeatureBank", "", "i̯", "i̯", "TRUE")
    frame = pd.DataFrame(rows, columns=METADATA_COLUMNS + FEATURES)
    buffer = StringIO()
    frame.to_csv(buffer, index=False)
    return buffer.getvalue()


CLASSIFIER_FEATURES = [name for name in FEATURES if name != "tone"]


def mini_config_dict(
    phoneme_layer: str = "shared",
    embedding_composition: bool = False,
    model_type: str = "pre-ln-transformer",
):
    """A small Config dict compatible with the mini feature table."""
    classes = [{"name": name, "dependencies": ["OUTPUT"]} for name in CLASSIFIER_FEATURES]
    classes.append({"name": "phoneme", "dependencies": ["OUTPUT"]})
    projection = {
        "classes": classes,
        "feature_set": "phoible",
        "phoneme_layer": phoneme_layer,
        "acoustic_model_dropout": 0.0,
    }
    if embedding_composition:
        projection["embedding_composition"] = {"embedding_size": 32}
    if model_type == "pre-ln-transformer":
        acoustic_model = {
            "type": "pre-ln-transformer",
            "transformer": {
                "feedforward_neurons": 64,
                "heads": 2,
                "num_layers": 2,
                "dropout_rate": 0.0,
            },
            "frontend": {"architecture": "linear", "neurons": 32},
        }
    else:
        acoustic_model = {"type": "wav2vec2-pretrained", "model_id": "test-wav2vec2"}
    return {
        "nn": {
            "batch_size": 4,
            "batching_mode": "utterances",
            "projection": projection,
            "acoustic_model": acoustic_model,
            "optimizer": {"algorithm": "adam", "learning_rate": 0.001},
            "loss": {"type": "CTC"},
            "lr_schedule": {"type": "warmup", "warmup_steps": 10, "constant_steps": 5, "factor": 2},
            "seed": 7,
        },
        "preprocessing": {"feature_type": "RAW", "resample": 16000},
        "data": {"languages": ["es", "it", "de"]},
    }


def build_cv_corpus(
    root: str,
    utterances_per_split=((("train", 3), ("dev", 2), ("test", 1))),
    audio_format: str = "wav",
) -> None:
    """Writes a tiny Common Voice-format corpus (msgpack + wav or mp3 clips)."""
    import os
    import wave

    import numpy as np

    from allophant_tpu.data.common_voice import (
        CommonVoiceCorpus,
        CommonVoiceCorpusMeta,
        Transcription,
    )
    from allophant_tpu.data.g2p import PhonemeTranscription, TaggedTranscription
    from allophant_tpu.data.speech_corpus import LanguageData, LanguageInfo

    rng = np.random.default_rng(0)
    phoneme_sets = {"es": ["a", "o", "n"], "it": ["a", "s", "i"]}
    for split, count in utterances_per_split:
        languages = []
        for language, phonemes in phoneme_sets.items():
            transcriptions = []
            for index in range(count):
                utterance = f"{language}_{split}_{index}"
                transcriptions.append(
                    Transcription(
                        "text", utterance, "client", None, None, None,
                        PhonemeTranscription(["text"], [[TaggedTranscription(list(phonemes), None)]]),
                    )
                )
                clips = os.path.join(root, language, "clips")
                os.makedirs(clips, exist_ok=True)
                samples = rng.uniform(-0.3, 0.3, 1600 + 160 * index).astype(np.float32)
                if audio_format == "mp3":
                    from allophant_tpu.native.audio_codecs import encode_mp3

                    encode_mp3(os.path.join(clips, f"{utterance}.mp3"), samples, 16000)
                else:
                    data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
                    with wave.open(os.path.join(clips, f"{utterance}.wav"), "wb") as file:
                        file.setnchannels(1)
                        file.setsampwidth(2)
                        file.setframerate(16000)
                        file.writeframes(data.tobytes())
            languages.append(
                LanguageData(LanguageInfo(language, sorted(phonemes), [{}]), transcriptions)
            )
        corpus = CommonVoiceCorpus(
            root, languages, CommonVoiceCorpusMeta("cv-mini", audio_format=audio_format)
        )
        corpus.save(root, split)
