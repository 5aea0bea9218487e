"""Data layer tests: audio IO/resampling, corpora, batching, stores, preprocessing."""

import math
import os
import wave

import numpy as np
import pytest

from allophant_tpu.config import BatchingMode, Config
from allophant_tpu.data import audio as audio_io
from allophant_tpu.data.batch import RawLabeledBatch
from allophant_tpu.data.batching import (
    Batcher,
    LanguageOversamplingSampler,
    MaxFrameBatchSampler,
    build_batch,
)
from allophant_tpu.data.dataset import BatchType, PhoneticallySegmentedDataset, Sample, SamplesProcessor
from allophant_tpu.data.preprocessing import FeatureFunction, pre_emphasis
from allophant_tpu.data.speech_corpus import LanguageData, LanguageInfo, MultilingualSplits
from allophant_tpu.data.store import RaggedFeatureWriter, preprocessed_features_or_lengths, write_meta
from allophant_tpu.data.ucla import UCLAPhoneticCorpus
from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer

from fixtures import mini_allophoible_csv, mini_config_dict


def _write_wav(path, samples: np.ndarray, rate: int = 16000):
    data = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as file:
        file.setnchannels(1)
        file.setsampwidth(2)
        file.setframerate(rate)
        file.writeframes(data.tobytes())


class TestAudio:
    def test_wav_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        samples = rng.uniform(-0.5, 0.5, 800).astype(np.float32)
        path = tmp_path / "test.wav"
        _write_wav(path, samples)
        loaded, rate = audio_io.load_wav(str(path))
        assert rate == 16000
        assert loaded.shape == (1, 800)
        np.testing.assert_allclose(loaded[0], samples, atol=1e-4)  # int16 quantization

    def test_resample_length_formula(self):
        audio = np.zeros((1, 44100), dtype=np.float32)
        resampled = audio_io.resample_sinc(audio, 44100, 16000)
        assert resampled.shape[-1] == math.ceil(16000 * 44100 / 44100)

        for length in [1000, 12345, 44100]:
            out = audio_io.resample_sinc(np.zeros((1, length), dtype=np.float32), 44100, 16000)
            assert out.shape[-1] == math.ceil(16000 * length / 44100)

    def test_resample_preserves_sine(self):
        rate_in, rate_out = 48000, 16000
        t_in = np.arange(rate_in) / rate_in
        freq = 440.0
        sine = np.sin(2 * np.pi * freq * t_in).astype(np.float32)[None]
        resampled = audio_io.resample_sinc(sine, rate_in, rate_out)[0]
        t_out = np.arange(len(resampled)) / rate_out
        expected = np.sin(2 * np.pi * freq * t_out)
        # Ignore filter edges.
        core = slice(100, -100)
        assert np.abs(resampled[core] - expected[core]).max() < 0.01

    def test_probe_wav(self, tmp_path):
        path = tmp_path / "probe.wav"
        _write_wav(path, np.zeros(32000, dtype=np.float32))
        duration, rate = audio_io.probe_duration(str(path))
        assert duration == pytest.approx(2.0)
        assert rate == 16000
        assert audio_io.estimated_resampled_length(duration, rate, 16000) == 32000


@pytest.fixture
def ucla_dir(tmp_path):
    """Tiny UCLA-format corpus: 2 languages x 2 utterances with real WAVs."""
    rng = np.random.default_rng(0)
    for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s"])]:
        base = tmp_path / language
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
                _write_wav(
                    base / "audio" / f"{utterance}.wav",
                    rng.uniform(-0.3, 0.3, 1600 + 320 * index).astype(np.float32),
                )
    return str(tmp_path)


class TestUCLACorpus:
    def test_load_and_audio(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        assert corpus.languages == ["ita", "spa"]
        assert len(corpus) == 4
        audio, rate = corpus.audio(0)
        assert rate == 16000
        assert audio.shape[0] == 1
        assert corpus.inventory("spa") == ["a", "n", "t"]

    def test_lengths_from_headers(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        lengths = {code: list(gen) for code, gen in corpus.read_lengths()}
        assert lengths["ita"] == [1600, 1920]

    def test_subset_preserves_audio_settings(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        subset = corpus.subset(["spa"])
        assert subset.languages == ["spa"]
        assert subset.audio_info.sample_rate == 16000
        assert subset.phoneme_sources == corpus.phoneme_sources
        _, rate = subset.audio(0)
        assert rate == 16000

    def test_end_to_end_batching(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        processor = SamplesProcessor.from_config(config, 16000, indexer)
        dataset = PhoneticallySegmentedDataset(BatchType.RAW, corpus, processor)

        batcher = Batcher(2, BatchingMode.UTTERANCES, data_workers=0)
        batches = list(batcher.batches(dataset))
        assert len(batches) == 2
        batch = batches[0]
        assert isinstance(batch, RawLabeledBatch)
        assert batch.audio_features.shape[1] % 128 == 0  # bucketed length
        assert batch.utterance_ids == ["ita_0", "ita_1"]
        assert batch.raw_labels[0][0] == ["a", "s"]

        # Language-split iteration (for composition decoding).
        splits = list(batches[0].split_by_language())
        assert len(splits) == 1
        language_id, sub = splits[0]
        assert corpus.language(language_id) == "ita"

    def test_process_workers_match_synchronous_batches(self, ucla_dir):
        """data_workers >= 1 builds batches in forked worker processes; the batch
        sequence must be identical to the synchronous path (same order, same
        arrays)."""
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        processor = SamplesProcessor.from_config(config, 16000, indexer)
        dataset = PhoneticallySegmentedDataset(
            BatchType.INDEXED, corpus, processor, index_start_offset=1
        )

        synchronous = list(
            Batcher(2, BatchingMode.UTTERANCES, data_workers=0).batches(
                dataset, shuffle=True, seed=11
            )
        )
        pooled = list(
            Batcher(2, BatchingMode.UTTERANCES, data_workers=2).batches(
                dataset, shuffle=True, seed=11
            )
        )
        assert len(pooled) == len(synchronous)
        for expected, actual in zip(synchronous, pooled):
            np.testing.assert_array_equal(expected.audio_features, actual.audio_features)
            np.testing.assert_array_equal(expected.lengths, actual.lengths)
            np.testing.assert_array_equal(expected.language_ids, actual.language_ids)
            assert set(expected.attribute_indices) == set(actual.attribute_indices)
            for name in expected.attribute_indices:
                np.testing.assert_array_equal(
                    expected.attribute_indices[name], actual.attribute_indices[name]
                )
                np.testing.assert_array_equal(
                    expected.label_lengths[name], actual.label_lengths[name]
                )

    def test_indexed_batches_have_labels(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        processor = SamplesProcessor.from_config(config, 16000, indexer)
        dataset = PhoneticallySegmentedDataset(BatchType.INDEXED, corpus, processor, index_start_offset=1)
        batcher = Batcher(4, BatchingMode.UTTERANCES, data_workers=0)
        [batch] = list(batcher.batches(dataset))
        assert "phoneme" in batch.attribute_indices
        assert "nasal" in batch.attribute_indices
        # spa labels: a t n -> nasal - - + with blank offset 1 -> ids >= 1.
        spa_rows = [row for row in range(4) if batch.language_ids[row] == corpus.language_id("spa")]
        row = spa_rows[0]
        count = batch.label_lengths["nasal"][row]
        assert count == 3
        assert (batch.attribute_indices["nasal"][row][:count] >= 1).all()


class TestSamplers:
    def test_oversampling_counts(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        sampler = LanguageOversamplingSampler(corpus, 0.5, shuffle=True, rng=np.random.default_rng(0))
        indices = list(sampler)
        assert len(indices) == len(sampler)
        # All emitted indices are valid.
        assert all(0 <= index < len(corpus) for index in indices)

    def test_max_frame_packing(self):
        lengths = np.array([100, 200, 300, 50, 400])
        sampler = range(5)
        batches = list(MaxFrameBatchSampler(sampler, 600, lengths))
        for batch in batches:
            max_length = max(int(lengths[i]) for i in batch)
            assert len(batch) * max_length <= 600
        assert sorted(index for batch in batches for index in batch) == list(range(5))

    def test_max_frame_packing_budgets_padded_volume(self):
        # Each 33-frame utterance materializes as a 64-frame bucket row; the
        # budget must count the bucketed (actually allocated) volume, so only
        # two rows fit in 128 frames, not three.
        lengths = np.array([33, 33, 33])
        batches = list(MaxFrameBatchSampler(range(3), 128, lengths, length_multiple=64))
        assert [len(batch) for batch in batches] == [2, 1]

    def test_utterance_mode_shuffles(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        processor = SamplesProcessor.from_config(config, 16000, indexer)
        dataset = PhoneticallySegmentedDataset(BatchType.RAW, corpus, processor)
        batcher = Batcher(4, BatchingMode.UTTERANCES, data_workers=0)
        [shuffled] = list(batcher.batches(dataset, shuffle=True, seed=0))
        [sequential] = list(batcher.batches(dataset, shuffle=False))
        assert sorted(shuffled.utterance_ids) == sorted(sequential.utterance_ids)
        assert shuffled.utterance_ids != sequential.utterance_ids


class TestBuildBatch:
    def test_bucketing(self):
        samples = [
            Sample(np.ones(100, dtype=np.float32), 100, 0),
            Sample(np.ones(250, dtype=np.float32), 250, 1),
            Sample(np.ones(30, dtype=np.float32), 30, 0),
        ]
        batch = build_batch(samples, BatchType.UNLABELED, length_multiple=128, pad_batch_to_power_of_two=True)
        assert batch.audio_features.shape == (4, 256)  # 250 -> 256; 3 rows -> 4
        np.testing.assert_array_equal(batch.lengths[:3], [100, 250, 30])
        assert batch.lengths[3] == 0  # filler row: zero length -> zero row weight downstream

    def test_global_pad_target_accepts_same_bucket(self):
        # Multi-host pad targets can come from approximate MP3 header math: a
        # local sample a few frames past the raw target must still collate as
        # long as the rounded bucket fits it.
        samples = [Sample(np.ones(300, dtype=np.float32), 300, 0)]
        batch = build_batch(samples, BatchType.UNLABELED, length_multiple=128, pad_to_length=299)
        assert batch.audio_features.shape == (1, 384)
        with pytest.raises(ValueError):
            build_batch(samples, BatchType.UNLABELED, length_multiple=128, pad_to_length=128)

    def test_raw_batch_padding_aligns_labels(self):
        samples = [
            Sample(np.ones(10, dtype=np.float32), 10, 0, raw_labels=[["a"]], utterance_id="u0"),
            Sample(np.ones(20, dtype=np.float32), 20, 0, raw_labels=[["b"]], utterance_id="u1"),
            Sample(np.ones(30, dtype=np.float32), 30, 1, raw_labels=[["c"]], utterance_id="u2"),
        ]
        batch = build_batch(
            samples, BatchType.RAW, length_multiple=16, pad_batch_to_power_of_two=True
        )
        # Filler rows get empty labels/ids so per-row zips stay aligned.
        assert batch.audio_features.shape[0] == 4
        assert batch.raw_labels == [[["a"], ["b"], ["c"], []]]
        assert batch.utterance_ids == ["u0", "u1", "u2", ""]

    def test_indexed_labels_reject_multiple_engines(self, ucla_dir):
        corpus = UCLAPhoneticCorpus.load(ucla_dir, resample=16000)
        config = Config.load(mini_config_dict())
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv())
        processor = SamplesProcessor.from_config(config, 16000, indexer)
        dataset = PhoneticallySegmentedDataset(BatchType.INDEXED, corpus, processor)
        # Two transcriptions (as from a two-engine G2P ensemble) must fail loudly
        # instead of silently training on doubled CTC targets.
        with pytest.raises(ValueError, match="exactly one transcription"):
            dataset._indexed_labels(0, [["a"], ["a"]])


class TestStore:
    def test_ragged_roundtrip(self, tmp_path):
        root = str(tmp_path / "store")
        write_meta(root, feature_size=4)
        writer = RaggedFeatureWriter(root, "test", "spa", feature_size=4)
        arrays = [np.random.default_rng(i).standard_normal((length, 4)).astype(np.float32) for i, length in enumerate([5, 9, 2])]
        for array in arrays:
            writer.append(array)
        writer.close()

        data = preprocessed_features_or_lengths(root, {"test": ["spa"]}, lengths_only=False)
        np.testing.assert_array_equal(data["test"].lengths, [5, 9, 2])
        for original, restored in zip(arrays, data["test"].features):
            np.testing.assert_allclose(original, restored)

    def test_lengths_only(self, tmp_path):
        root = str(tmp_path / "store")
        from allophant_tpu.data.store import write_lengths

        write_lengths(root, "train", "spa", [10, 20])
        write_lengths(root, "train", "ita", [30])
        data = preprocessed_features_or_lengths(root, {"train": ["ita", "spa"]})
        np.testing.assert_array_equal(data["train"].lengths, [30, 10, 20])


class TestPreprocessing:
    def test_pre_emphasis(self):
        x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
        y = pre_emphasis(x, 0.97)
        # First sample reflect-padded: y[0] = x[1] - 0.97*x[0]? No: pad with x[1]
        # then y[t] = x[t] - 0.97 x[t-1] for t >= 1.
        np.testing.assert_allclose(y[1:], x[1:] - 0.97 * x[:-1], rtol=1e-6)
        assert len(y) == len(x)

    def test_raw_feature_function(self):
        config = Config.load(mini_config_dict())
        fn = FeatureFunction.from_config(config, 16000)
        audio = np.zeros((1, 480), dtype=np.float32)
        assert fn(audio).shape == (480,)
        assert fn.feature_size == 1
        assert fn.frame_count(480) == 480

    def test_filterbank_features(self):
        config_dict = mini_config_dict()
        config_dict["preprocessing"] = {
            "feature_type": "FILTERBANKS",
            "window": {"frame_duration": 25, "frame_stride": 10},
            "num_filters": 20,
            "resample": 16000,
        }
        config = Config.load(config_dict)
        fn = FeatureFunction.from_config(config, 16000)
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((1, 16000)).astype(np.float32)
        features = fn(audio)
        assert features.shape[1] == 20
        assert np.isfinite(features).all()
        # CMVN: approximately zero mean per filter.
        assert np.abs(features.mean(0)).max() < 1e-4
        # Frame math matches the STFT convention.
        assert features.shape[0] == fn.frame_count(16000)


class TestCommonVoicePersistence:
    def test_msgpack_roundtrip(self, tmp_path):
        from allophant_tpu.data.common_voice import (
            CommonVoiceCorpus,
            CommonVoiceCorpusMeta,
            Transcription,
        )
        from allophant_tpu.data.g2p import PhonemeTranscription, TaggedTranscription

        transcriptions = [
            Transcription(
                "hola", f"utt_{i}", "client", None, None, None,
                PhonemeTranscription(["hola"], [[TaggedTranscription(["o", "l", "a"], None)]]),
            )
            for i in range(3)
        ]
        corpus = CommonVoiceCorpus(
            str(tmp_path),
            [LanguageData(LanguageInfo("es", ["a", "l", "o"], [{}]), transcriptions)],
            CommonVoiceCorpusMeta("cv-test"),
        )
        corpus.save(str(tmp_path), "test")
        restored = CommonVoiceCorpus.from_file(str(tmp_path), "test")
        assert restored.languages == ["es"]
        assert len(restored) == 3
        entry = restored[0].entry
        assert entry.raw_sentence == "hola"
        assert list(entry.phonemes.flattened_transcriptions()) == [["o", "l", "a"]]
        assert restored.inventory("es") == ["a", "l", "o"]

    def test_only_primary_script_filter(self, tmp_path):
        from allophant_tpu.data.common_voice import (
            CommonVoiceCorpus,
            CommonVoiceCorpusMeta,
            Transcription,
        )
        from allophant_tpu.data.g2p import PhonemeTranscription, TaggedTranscription

        mixed = Transcription(
            "hello world", "utt_mixed", "client", None, None, None,
            PhonemeTranscription(
                ["hello", "world"],
                [[TaggedTranscription(["h"], None), TaggedTranscription(["w"], "en")]],
            ),
        )
        clean = Transcription(
            "hola", "utt_clean", "client", None, None, None,
            PhonemeTranscription(["hola"], [[TaggedTranscription(["o"], None)]]),
        )
        corpus = CommonVoiceCorpus(
            str(tmp_path),
            [LanguageData(LanguageInfo("es", ["h", "o", "w"], [{}]), [mixed, clean])],
            CommonVoiceCorpusMeta("cv-test"),
        )
        corpus.save(str(tmp_path), "train")
        restored = CommonVoiceCorpus.from_file(str(tmp_path), "train", only_primary_script=True)
        assert len(restored) == 1
        assert restored[0].entry.utterance_id == "utt_clean"

    def test_load_corpus_facade(self, tmp_path, ucla_dir):
        from allophant_tpu.data.corpus_loading import load_corpus

        splits = load_corpus(ucla_dir, "ucla-phonetic", resample=16000)
        assert len(splits.test) == 4
        assert len(splits.train) == 0


class TestMp3Codecs:
    """Native MP3 decode via libmpg123 (Common Voice clips are MP3; the
    reference goes through torchaudio's C++ backends)."""

    @pytest.fixture
    def codecs(self):
        from allophant_tpu.native import audio_codecs

        if not (audio_codecs.MPG123_AVAILABLE and audio_codecs.LAME_AVAILABLE):
            pytest.skip("system mpg123/lame libraries unavailable")
        return audio_codecs

    def test_round_trip_sine(self, codecs, tmp_path):
        rate = 16_000
        t = np.arange(rate) / rate
        sine = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / "tone.mp3")
        codecs.encode_mp3(path, sine, rate)
        audio, decoded_rate = codecs.decode_mp3(path)
        assert decoded_rate == rate
        assert audio.shape[0] == 1 and np.isfinite(audio).all()
        # Correlate against the original allowing for codec delay.
        window = len(sine) - 2000
        best = max(
            float(np.corrcoef(sine[:window], audio[0, shift : shift + window])[0, 1])
            for shift in range(0, 2000)
        )
        assert best > 0.99

    def test_probe_mp3_duration(self, codecs, tmp_path):
        rate = 16_000
        seconds = 2
        tone = (0.3 * np.sin(np.linspace(0, 880 * np.pi, rate * seconds))).astype(np.float32)
        path = str(tmp_path / "probe.mp3")
        codecs.encode_mp3(path, tone, rate)
        duration, probed_rate = audio_io.probe_mp3(path)
        assert probed_rate == rate
        # Header-based estimate: allow codec delay/frame padding slack.
        assert abs(duration - seconds) < 0.2

    def test_load_audio_dispatches_mp3(self, codecs, tmp_path):
        from allophant_tpu.data.audio import load_audio

        rate = 22_050
        noise = (np.random.default_rng(0).uniform(-0.3, 0.3, rate)).astype(np.float32)
        path = str(tmp_path / "clip.mp3")
        codecs.encode_mp3(path, noise, rate)
        audio, original_rate = load_audio(path, resample_to=16_000)
        assert original_rate == rate
        # ~1 s of 22.05 kHz audio resampled to 16 kHz (plus codec delay).
        assert audio.ndim == 2 and 15_000 < audio.shape[1] < 18_000

    def test_stereo_decode(self, codecs, tmp_path):
        rate = 16_000
        t = np.arange(rate) / rate
        left = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        right = (0.4 * np.sin(2 * np.pi * 600 * t)).astype(np.float32)
        path = str(tmp_path / "stereo.mp3")
        codecs.encode_mp3(path, np.stack((left, right)), rate)
        audio, _ = codecs.decode_mp3(path)
        assert audio.shape[0] == 2

    def test_missing_file_raises(self, codecs):
        with pytest.raises(FileNotFoundError):
            codecs.decode_mp3("/nonexistent/file.mp3")

    def test_common_voice_pipeline_with_mp3_clips(self, codecs, tmp_path):
        """Full CV batch pipeline over MP3 clips (real Common Voice releases
        ship MP3; reference loads them via torchaudio)."""
        from allophant_tpu.data.corpus_loading import load_corpus

        from fixtures import build_cv_corpus

        root = str(tmp_path / "cv")
        import os

        os.makedirs(root)
        build_cv_corpus(root, audio_format="mp3")
        splits = load_corpus(root, "common-voice", resample=16_000)
        corpus = splits.train
        audio, rate = corpus.audio(0)
        assert rate == 16_000 and audio.shape[-1] > 500
