#!/usr/bin/env python3
"""Measures host input-pipeline throughput (audio-seconds fed per second).

The training device step consumes ~660x real-time (160 audio-s per ~242 ms step,
tools/bench_train_step.py), so the host pipeline — audio decode + sinc resample +
label indexing + padded batch assembly, reference batching.py:162-217 with
DataLoader worker processes — must sustain >= ~660 audio-s/s to keep the chip
busy. This tool drives the real production path (TranscribedDataset -> Batcher,
the same objects the training loop uses) over a synthetic on-disk Common
Voice-format corpus and reports audio-s/s for:

- wav-16k:        stdlib WAV read, no resampling
- wav-32k:        WAV read + 32 kHz -> 16 kHz sinc resample (torchaudio-exact)
- mp3-32k:        libmpg123 decode + resample (skipped if the codec is absent)
- precomputed:    ragged-store feature read (offline-preprocessed fast path)

Usage: python tools/bench_input_pipeline.py [utterances_per_language] [seconds_per_utterance] [workers]
"""

import json
import os
import sys
import time
import wave

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
sys.path.insert(0, os.path.join(_REPO_ROOT, "tests"))


def build_corpus(root: str, utterances: int, seconds: float, rate: int, audio_format: str) -> float:
    """Synthetic CV-format corpus; returns total audio seconds written."""
    from allophant_tpu.data.common_voice import (
        CommonVoiceCorpus,
        CommonVoiceCorpusMeta,
        Transcription,
    )
    from allophant_tpu.data.g2p import PhonemeTranscription, TaggedTranscription
    from allophant_tpu.data.speech_corpus import LanguageData, LanguageInfo

    rng = np.random.default_rng(0)
    phoneme_sets = {"es": ["a", "o", "n", "t", "s"], "it": ["a", "s", "i", "e", "m"]}
    # ~10 phonemes per second of speech, realistic CTC target density.
    labels_per_utterance = max(4, int(seconds * 10))
    total_seconds = 0.0
    languages = []
    for language, phonemes in phoneme_sets.items():
        clips = os.path.join(root, language, "clips")
        os.makedirs(clips, exist_ok=True)
        transcriptions = []
        for index in range(utterances):
            utterance = f"{language}_{index}"
            sequence = list(rng.choice(phonemes, size=labels_per_utterance))
            transcriptions.append(
                Transcription(
                    "text", utterance, "client", None, None, None,
                    PhonemeTranscription(["text"], [[TaggedTranscription(sequence, None)]]),
                )
            )
            sample_count = int(seconds * rate) + 160 * index  # varied lengths
            total_seconds += sample_count / rate
            samples = rng.uniform(-0.3, 0.3, sample_count).astype(np.float32)
            if audio_format == "mp3":
                from allophant_tpu.native.audio_codecs import encode_mp3

                encode_mp3(os.path.join(clips, f"{utterance}.mp3"), samples, rate)
            else:
                data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
                with wave.open(os.path.join(clips, f"{utterance}.wav"), "wb") as file:
                    file.setnchannels(1)
                    file.setsampwidth(2)
                    file.setframerate(rate)
                    file.writeframes(data.tobytes())
        languages.append(
            LanguageData(LanguageInfo(language, sorted(phonemes), [{}]), transcriptions)
        )
    corpus = CommonVoiceCorpus(root, languages, CommonVoiceCorpusMeta("bench", audio_format=audio_format))
    corpus.save(root, "train")
    return total_seconds


def build_dataset(root: str, workers: int):
    from allophant_tpu.config import Config
    from allophant_tpu.data.batching import Batcher
    from allophant_tpu.data.common_voice import CommonVoiceCorpus
    from allophant_tpu.data.dataset import BatchType, SamplesProcessor, TranscribedDataset
    from allophant_tpu.phonetics.features import PhoneticAttributeIndexer
    from fixtures import mini_allophoible_csv, mini_config_dict

    config = Config.load(mini_config_dict())
    indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
    corpus = CommonVoiceCorpus.from_file(root, "train", resample=16_000)
    processor = SamplesProcessor.from_config(config, 16_000, indexer)
    dataset = TranscribedDataset(BatchType.INDEXED, corpus, processor, index_start_offset=1)
    batcher = Batcher(16, config.nn.batching_mode, data_workers=workers)
    return dataset, batcher


def drain(dataset, batcher, seed: int = 0) -> float:
    start = time.perf_counter()
    fed_samples = 0
    for batch in batcher.batches(dataset, shuffle=True, seed=seed):
        fed_samples += int(np.asarray(batch.lengths).sum())
    elapsed = time.perf_counter() - start
    return fed_samples / 16_000 / elapsed


def bench_precomputed(root: str, scratch: str, workers: int) -> float:
    """Offline-preprocess features into the ragged store, then feed from it."""
    from allophant_tpu.data.dataset import BatchType, TranscribedDataset
    from allophant_tpu.data.store import (
        RaggedFeatureWriter,
        preprocessed_features_or_lengths,
        write_meta,
    )

    dataset, batcher = build_dataset(root, workers)
    corpus = dataset.corpus
    writer = RaggedFeatureWriter(scratch, "train", "all", feature_size=1)
    for index in range(len(corpus)):
        item = corpus[index]
        audio, _rate = corpus.audio_for(item)
        writer.append(dataset._processor.feature_function(audio))
    writer.close()
    write_meta(scratch, 1)
    features = preprocessed_features_or_lengths(
        scratch, {"train": ["all"]}, lengths_only=False
    )["train"].features
    precomputed = TranscribedDataset(
        BatchType.INDEXED,
        corpus,
        dataset._processor,
        index_start_offset=1,
        features=list(features),
    )
    return drain(precomputed, batcher, seed=1)


def main() -> None:
    import tempfile

    utterances = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    results = {}
    with tempfile.TemporaryDirectory() as scratch:
        for name, rate, audio_format in [
            ("wav-16k", 16_000, "wav"),
            ("wav-32k", 32_000, "wav"),
            ("mp3-32k", 32_000, "mp3"),
        ]:
            root = os.path.join(scratch, name)
            os.makedirs(root)
            try:
                build_corpus(root, utterances, seconds, rate, audio_format)
            except Exception as error:
                results[name] = f"skipped ({error})"
                continue
            dataset, batcher = build_dataset(root, workers)
            drain(dataset, batcher)  # warm caches (resampler kernels, file cache)
            results[name] = round(drain(dataset, batcher), 1)
            if name == "wav-32k":
                store = os.path.join(scratch, "store")
                results["precomputed"] = round(bench_precomputed(root, store, workers), 1)

    cores = len(os.sched_getaffinity(0))
    print(json.dumps({"audio_s_per_s": results, "host_cores": cores, "workers": workers}))


if __name__ == "__main__":
    main()
