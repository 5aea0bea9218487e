"""AOT serving-export tests: export -> serialize -> reload -> output parity."""

import numpy as np
import pytest

from fixtures import mini_allophoible_csv, mini_config_dict

from allophant_tpu import serving
from allophant_tpu.config import Config
from allophant_tpu.data.batch import Batch
from allophant_tpu.models.allophant import attribute_graph_from_config
from allophant_tpu.phonetics.features import LanguageInventories, PhoneticAttributeIndexer
from allophant_tpu.training import Estimator


@pytest.fixture(scope="module")
def tiny_setup():
    config = Config.load(mini_config_dict())
    inventories = LanguageInventories({0: ["a", "o", "n"], 1: ["a", "s", "i"]}, ["es", "it"])
    indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv(), inventories)
    graph = attribute_graph_from_config(config, indexer)
    estimator = Estimator.from_config(config, 1, 16_000, graph, indexer, load_pretrained_weights=False)
    return estimator, indexer


@pytest.fixture(scope="module")
def tiny_estimator(tiny_setup):
    return tiny_setup[0]


def _example_batch(batch_size=2, samples=640):
    rng = np.random.default_rng(4)
    audio = rng.standard_normal((batch_size, samples)).astype(np.float32)
    lengths = np.array([samples, samples - 128], dtype=np.int32)[:batch_size]
    language_ids = np.arange(batch_size, dtype=np.int32) % 2
    return audio, lengths, language_ids


def test_greedy_export_roundtrip_matches_live_predict(tiny_estimator, tmp_path):
    from allophant_tpu.ops.decode import greedy_decode_logits

    batch_size, samples = 2, 640
    exported = serving.export_transcriber(tiny_estimator, batch_size, samples, decode="greedy")
    path = str(tmp_path / "transcriber.stablehlo")
    serving.save_transcriber(exported, path)
    call = serving.load_transcriber(path)

    audio, lengths, language_ids = _example_batch(batch_size, samples)
    decoded, frame_lengths = call(audio, lengths, language_ids)

    # Live path: predict (time-first log-probs) + the same greedy decode.
    predictions = tiny_estimator.predict(
        Batch(audio, lengths, language_ids), log_probabilities=False
    )
    np.testing.assert_array_equal(np.asarray(frame_lengths), np.asarray(predictions.lengths))
    assert set(decoded) == set(predictions.outputs)
    for name, (tokens, counts) in decoded.items():
        live_logits = np.asarray(predictions.outputs[name]).transpose(1, 0, 2)
        live_tokens, _ts, live_counts, _s = greedy_decode_logits(
            live_logits, np.asarray(predictions.lengths)
        )
        np.testing.assert_array_equal(np.asarray(counts), np.asarray(live_counts))
        for row in range(batch_size):
            count = int(np.asarray(counts)[row])
            np.testing.assert_array_equal(
                np.asarray(tokens)[row, :count], np.asarray(live_tokens)[row, :count], err_msg=name
            )


def test_log_probs_export_matches_live_predict(tiny_estimator, tmp_path):
    batch_size, samples = 2, 640
    exported = serving.export_transcriber(tiny_estimator, batch_size, samples, decode="log_probs")
    path = str(tmp_path / "transcriber_lp.stablehlo")
    serving.save_transcriber(exported, path)
    call = serving.load_transcriber(path)

    audio, lengths, language_ids = _example_batch(batch_size, samples)
    outputs, frame_lengths = call(audio, lengths, language_ids)
    predictions = tiny_estimator.predict(Batch(audio, lengths, language_ids))
    for name, log_probs in outputs.items():
        log_probs = np.asarray(log_probs)
        # The live path pads inputs to its length bucket; frames past the
        # exported artifact's static shape are padding on both sides.
        live = np.asarray(predictions.outputs[name]).transpose(1, 0, 2)[:, : log_probs.shape[1]]
        np.testing.assert_allclose(log_probs, live, atol=1e-5, err_msg=name)


def test_export_shape_mismatch_raises(tiny_estimator, tmp_path):
    exported = serving.export_transcriber(tiny_estimator, 2, 640)
    path = str(tmp_path / "transcriber.stablehlo")
    serving.save_transcriber(exported, path)
    call = serving.load_transcriber(path)
    audio, lengths, language_ids = _example_batch(2, 320)  # wrong sample count
    with pytest.raises(Exception):
        call(audio, lengths, language_ids)


def test_invalid_decode_mode(tiny_estimator):
    with pytest.raises(ValueError):
        serving.make_serving_fn(tiny_estimator, decode="viterbi")


def test_beam_export_roundtrip_matches_live_beam(tiny_estimator, tmp_path):
    """`decode="beam"`: the exported artifact's (parents, emitted, scores)
    triple, pushed through the production host backtrace, reproduces the live
    DeviceBeamCTCDecoder's n-best exactly; attribute tracks stay greedy."""
    from allophant_tpu.ops.decode import DeviceBeamCTCDecoder, backtrace_beams

    batch_size, samples = 2, 640
    exported = serving.export_transcriber(tiny_estimator, batch_size, samples, decode="beam4")
    path = str(tmp_path / "transcriber_beam.stablehlo")
    serving.save_transcriber(exported, path)
    call = serving.load_transcriber(path)

    audio, lengths, language_ids = _example_batch(batch_size, samples)
    decoded, (parents, emitted, scores), frame_lengths = call(audio, lengths, language_ids)
    assert "phoneme" not in decoded and len(decoded) > 0

    collected, scores_host = backtrace_beams(
        np.asarray(parents), np.asarray(emitted), np.asarray(scores), np.asarray(frame_lengths)
    )

    predictions = tiny_estimator.predict(Batch(audio, lengths, language_ids))
    phoneme_classes = np.asarray(predictions.outputs["phoneme"]).shape[-1]
    live = DeviceBeamCTCDecoder([str(i) for i in range(phoneme_classes)], beam_width=4, n_best=2)
    live_out = live(
        np.asarray(predictions.outputs["phoneme"]).transpose(1, 0, 2),
        np.asarray(predictions.lengths),
    )
    for row in range(batch_size):
        order = np.argsort(-scores_host[row])[:2]
        for rank, beam in enumerate(order):
            sequence = collected[:, row, beam]
            tokens = sequence[sequence >= 0]
            np.testing.assert_array_equal(tokens, live_out[row][rank].tokens)
            assert scores_host[row, beam] == pytest.approx(live_out[row][rank].score, abs=1e-3)


def test_export_cli_roundtrip(tiny_setup, tmp_path):
    """`allophant export` end to end: checkpoint -> artifact -> loadable callable."""
    from allophant_tpu.cli import run as run_cli

    estimator, indexer = tiny_setup
    checkpoint_path = str(tmp_path / "model.ckpt")
    estimator.save(checkpoint_path, phonetic_indexer_state=indexer.state())
    artifact = str(tmp_path / "transcriber.stablehlo")
    run_cli.main(
        ["export", checkpoint_path, artifact, "--cpu", "-s", "2", "-d", "0.04", "--decode", "greedy"]
    )
    call = serving.load_transcriber(artifact)
    audio, lengths, language_ids = _example_batch(2, 640)
    decoded, frame_lengths = call(audio, lengths, language_ids)
    assert "phoneme" in decoded
    assert np.asarray(frame_lengths).shape == (2,)
