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


#: Per-language phoneme pools for the learnable tone corpus: subsets of the
#: mini-Allophoible inventories above, large enough that chance PER is ~100%.
TONE_PHONEME_POOLS = {
    "es": ["a", "e", "i", "o", "u", "p", "t", "k", "m", "n", "s"],
    "it": ["a", "e", "i", "o", "u", "t", "k", "b", "d", "m", "n", "z"],
}


def tone_frequency_map(phonemes) -> dict:
    """Assigns each phoneme a pure-tone frequency, evenly spaced on the mel
    scale between 300 and 7000 Hz so a 40-filter log-Mel frontend resolves
    every pair into distinct filterbank signatures."""
    import numpy as np

    def hz_to_mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def mel_to_hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    ordered = sorted(set(phonemes))
    mels = np.linspace(hz_to_mel(300.0), hz_to_mel(7000.0), len(ordered))
    return {phoneme: float(mel_to_hz(mel)) for phoneme, mel in zip(ordered, mels)}


def build_tone_corpus(
    root: str,
    utterances_per_split=((("train", 64), ("dev", 8), ("test", 16))),
    phonemes_per_utterance=(4, 8),
    tone_ms: int = 120,
    sample_rate: int = 16_000,
    seed: int = 0,
) -> None:
    """Writes a *learnable* synthetic Common Voice corpus: each utterance is a
    random phoneme sequence rendered as a concatenation of pure tones, one
    distinct frequency per phoneme. A small model can learn the tone->phoneme
    mapping, so train/test PER collapses far below chance — the signal the
    convergence drill (tools/convergence_drill.py) asserts on."""
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

    rng = np.random.default_rng(seed)
    frequencies = tone_frequency_map(
        phoneme for pool in TONE_PHONEME_POOLS.values() for phoneme in pool
    )
    tone_samples = int(sample_rate * tone_ms / 1000)
    time_axis = np.arange(tone_samples) / sample_rate
    # 5 ms cosine ramps avoid clicks smearing energy across the spectrum.
    ramp = np.ones(tone_samples)
    edge = int(0.005 * sample_rate)
    window = 0.5 - 0.5 * np.cos(np.linspace(0.0, np.pi, edge))
    ramp[:edge] = window
    ramp[-edge:] = window[::-1]

    def render(sequence) -> np.ndarray:
        tones = [
            (0.25 * np.sin(2.0 * np.pi * frequencies[phoneme] * time_axis) * ramp)
            for phoneme in sequence
        ]
        audio = np.concatenate(tones)
        return (audio + rng.normal(0.0, 0.01, audio.shape)).astype(np.float32)

    low, high = phonemes_per_utterance
    for split, count in utterances_per_split:
        languages = []
        for language, pool in TONE_PHONEME_POOLS.items():
            transcriptions = []
            clips = os.path.join(root, language, "clips")
            os.makedirs(clips, exist_ok=True)
            for index in range(count):
                utterance = f"{language}_{split}_{index}"
                sequence = list(rng.choice(pool, size=int(rng.integers(low, high + 1))))
                transcriptions.append(
                    Transcription(
                        "text", utterance, "client", None, None, None,
                        PhonemeTranscription(["text"], [[TaggedTranscription(sequence, None)]]),
                    )
                )
                data = (np.clip(render(sequence), -1, 1) * 32767).astype("<i2")
                with wave.open(os.path.join(clips, f"{utterance}.wav"), "wb") as file:
                    file.setnchannels(1)
                    file.setsampwidth(2)
                    file.setframerate(sample_rate)
                    file.writeframes(data.tobytes())
            languages.append(
                LanguageData(LanguageInfo(language, sorted(pool), [{}]), transcriptions)
            )
        corpus = CommonVoiceCorpus(
            root, languages, CommonVoiceCorpusMeta("cv-tones", audio_format="wav")
        )
        corpus.save(root, split)


def tone_corpus_config(epochs: int = 24, batch_size: int = 8) -> dict:
    """Config for the tone corpus: log-Mel frontend + the mini transformer."""
    config = mini_config_dict()
    config["nn"]["batch_size"] = batch_size
    config["nn"]["maximum_iterations"] = epochs
    # Constant Adam LR: the Noam trajectory is differential-tested elsewhere;
    # the drill wants the fastest stable collapse on a tiny model.
    config["nn"]["optimizer"] = {"algorithm": "adam", "learning_rate": 0.003}
    del config["nn"]["lr_schedule"]
    config["data"]["languages"] = ["es", "it"]
    config["preprocessing"] = {
        "feature_type": "FILTERBANKS",
        "window": {"frame_duration": 25, "frame_stride": 10},
        "resample": 16_000,
        "num_filters": 40,
    }
    return config


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
