"""Tests for device ops: CTC loss parity vs torch, greedy/beam CTC decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from allophant_tpu.ops.ctc import ctc_loss_sum, ctc_loss_sum_heads, sequence_cross_entropy_sum
from allophant_tpu.ops.decode import BeamCTCDecoder, GreedyCTCDecoder


class TestCTCLoss:
    def test_matches_torch_ctc(self):
        import torch

        rng = np.random.default_rng(0)
        batch, time, classes, label_len = 3, 20, 7, 6
        logits = rng.standard_normal((batch, time, classes)).astype(np.float32)
        logit_lengths = np.array([20, 15, 12])
        labels = rng.integers(1, classes, (batch, label_len))
        label_lengths = np.array([6, 4, 3])
        for row, length in enumerate(label_lengths):
            labels[row, length:] = 0

        ours = float(
            ctc_loss_sum(
                jnp.asarray(logits), jnp.asarray(logit_lengths), jnp.asarray(labels), jnp.asarray(label_lengths)
            )
        )
        torch_loss = torch.nn.CTCLoss(reduction="sum", zero_infinity=True)
        log_probs = torch.log_softmax(torch.from_numpy(logits), -1).transpose(0, 1)
        expected = torch_loss(
            log_probs,
            torch.from_numpy(labels),
            torch.from_numpy(logit_lengths),
            torch.from_numpy(label_lengths),
        )
        assert ours == pytest.approx(float(expected), rel=1e-4)

    def test_zero_infinity(self):
        # Label longer than output: zero loss, not inf (reference loss_functions.py:22-24).
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((1, 3, 5)).astype(np.float32)
        labels = np.array([[1, 2, 3, 4, 1, 2]])
        loss = float(
            ctc_loss_sum(jnp.asarray(logits), jnp.asarray([3]), jnp.asarray(labels), jnp.asarray([6]))
        )
        assert loss == 0.0

    def test_zero_infinity_counts_required_blanks(self):
        """Infeasibility is exact: repeated labels need an intervening blank, so
        N labels with R repeats require N+R frames (torch zero_infinity zeroes
        exactly these inf losses)."""
        import torch

        rng = np.random.default_rng(4)
        classes = 5
        # (labels, logit_length): [a, a] needs 3 frames -> infeasible at T=2,
        # feasible at T=3; distinct labels [a, b] are feasible at T=2.
        cases = [
            (np.array([[2, 2]]), 2),
            (np.array([[2, 2]]), 3),
            (np.array([[2, 3]]), 2),
            (np.array([[2, 2, 2]]), 4),
            (np.array([[2, 2, 2]]), 5),
        ]
        for labels, logit_length in cases:
            logits = rng.standard_normal((1, logit_length, classes)).astype(np.float32)
            label_lengths = np.array([labels.shape[1]])
            ours = float(
                ctc_loss_sum(
                    jnp.asarray(logits),
                    jnp.asarray([logit_length]),
                    jnp.asarray(labels),
                    jnp.asarray(label_lengths),
                )
            )
            torch_loss = torch.nn.CTCLoss(reduction="sum", zero_infinity=True)
            log_probs = torch.log_softmax(torch.from_numpy(logits), -1).transpose(0, 1)
            expected = float(
                torch_loss(
                    log_probs,
                    torch.from_numpy(labels),
                    torch.tensor([logit_length]),
                    torch.from_numpy(label_lengths),
                )
            )
            assert ours == pytest.approx(expected, rel=1e-4), (labels, logit_length)

    def test_large_feasible_loss_not_zeroed(self):
        """A feasible alignment with a huge summed loss must survive (the old
        heuristic zeroed losses above 1e7)."""
        classes = 4
        time = 8
        # Extremely confident wrong predictions: loss is astronomically large
        # but the alignment [1] over 8 frames exists.
        logits = np.full((1, time, classes), -2e6, dtype=np.float32)
        logits[:, :, 3] = 2e6
        labels = np.array([[1]])
        loss = float(
            ctc_loss_sum(jnp.asarray(logits), jnp.asarray([time]), jnp.asarray(labels), jnp.asarray([1]))
        )
        assert loss > 1e7

    def test_sequence_cross_entropy(self):
        import torch

        rng = np.random.default_rng(2)
        logits = rng.standard_normal((2, 10, 4)).astype(np.float32)
        lengths = np.array([10, 6])
        labels = np.array([1, 3])
        ours = float(
            sequence_cross_entropy_sum(
                jnp.asarray(logits), jnp.asarray(lengths), jnp.asarray(labels)
            )
        )
        pooled = np.stack(
            [logits[0, :10].mean(0), logits[1, :6].mean(0)]
        )
        expected = torch.nn.CrossEntropyLoss(reduction="sum")(
            torch.from_numpy(pooled), torch.from_numpy(labels)
        )
        assert ours == pytest.approx(float(expected), rel=1e-4)


def _emissions_for(sequence, classes, time_per_token=2):
    """Builds log emissions that deterministically decode to `sequence` greedily."""
    frames = []
    for token in sequence:
        for _ in range(time_per_token):
            row = np.full(classes, -10.0, dtype=np.float32)
            row[token] = 0.0
            frames.append(row)
    return np.asarray(frames)[None]


class TestFusedCTC:
    """ctc_loss_sum_heads (single fused forward scan) against the per-head
    reference path, values and gradients."""

    @staticmethod
    def _random_heads(seed, batch=3, time=16):
        rng = np.random.default_rng(seed)
        heads = []
        # Deliberately heterogeneous: class counts, label widths, repeats,
        # empty labels, and an infeasible row.
        for name, classes, width in [("a", 7, 6), ("b", 3, 6), ("c", 25, 4)]:
            logits = rng.standard_normal((batch, time, classes)).astype(np.float32)
            labels = rng.integers(1, classes, (batch, width))
            labels[0, 1] = labels[0, 0]  # forced repeat
            label_lengths = rng.integers(0, width + 1, batch)
            for row, length in enumerate(label_lengths):
                labels[row, length:] = 0
            heads.append(
                (name, jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(label_lengths))
            )
        logit_lengths = jnp.asarray(rng.integers(4, time + 1, batch))
        return heads, logit_lengths

    def test_matches_per_head_reference(self):
        heads, logit_lengths = self._random_heads(0)
        fused = ctc_loss_sum_heads(heads, logit_lengths)
        for name, logits, labels, label_lengths in heads:
            expected = ctc_loss_sum(logits, logit_lengths, labels, label_lengths)
            assert float(fused[name]) == pytest.approx(float(expected), rel=1e-4, abs=1e-5)

    def test_infeasible_rows_zeroed(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((1, 3, 5)).astype(np.float32))
        labels = jnp.asarray([[1, 2, 3, 4, 1, 2]])
        fused = ctc_loss_sum_heads(
            [("only", logits, labels, jnp.asarray([6]))], jnp.asarray([3])
        )
        assert float(fused["only"]) == 0.0

    def test_row_weights(self):
        heads, logit_lengths = self._random_heads(2)
        weights = jnp.asarray([1.0, 0.0, 1.0])
        fused = ctc_loss_sum_heads(heads, logit_lengths, row_weights=weights)
        for name, logits, labels, label_lengths in heads:
            expected = ctc_loss_sum(
                logits, logit_lengths, labels, label_lengths, row_weights=weights
            )
            assert float(fused[name]) == pytest.approx(float(expected), rel=1e-4, abs=1e-5)

    def test_gradients_match(self):
        import jax

        heads, logit_lengths = self._random_heads(3)

        def fused_total(all_logits):
            rebuilt = [
                (name, all_logits[index], labels, label_lengths)
                for index, (name, _logits, labels, label_lengths) in enumerate(heads)
            ]
            # Heads have different class counts; pass as a list of arrays.
            losses = ctc_loss_sum_heads(rebuilt, logit_lengths)
            return sum(losses.values())

        def reference_total(all_logits):
            return sum(
                ctc_loss_sum(all_logits[index], logit_lengths, labels, label_lengths)
                for index, (_name, _logits, labels, label_lengths) in enumerate(heads)
            )

        inputs = [logits for _name, logits, _labels, _ll in heads]
        fused_grads = jax.grad(fused_total)(inputs)
        expected_grads = jax.grad(reference_total)(inputs)
        for ours, expected in zip(fused_grads, expected_grads):
            np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), atol=2e-4)

    def test_empty(self):
        assert ctc_loss_sum_heads([], jnp.asarray([3])) == {}

    def test_masked_class_label_matches_torch(self):
        """A label on a hard-masked class (allophone-style -1e9 logits): the fused
        forward computes the true huge-but-finite NLL like torch's CTCLoss, while
        optax's internal log_epsilon floor caps such rows near 1e5 (see the
        degenerate-input note in ops/ctc.py). Real labels are in-inventory by
        construction, so this regime is torch-parity insurance, not a train path."""
        import torch

        rng = np.random.default_rng(4)
        time, classes = 12, 5
        logits = rng.standard_normal((1, time, classes)).astype(np.float32)
        logits[:, :, 3] = -1e9
        labels = np.array([[2, 3, 1]], dtype=np.int64)
        fused = ctc_loss_sum_heads(
            [("h", jnp.asarray(logits), jnp.asarray(labels), jnp.asarray([3]))],
            jnp.asarray([time]),
        )
        log_probs = torch.log_softmax(torch.from_numpy(logits).double(), dim=-1)
        expected = torch.nn.CTCLoss(blank=0, reduction="sum", zero_infinity=True)(
            log_probs.transpose(0, 1),
            torch.from_numpy(labels),
            torch.tensor([time]),
            torch.tensor([3]),
        )
        assert float(fused["h"]) == pytest.approx(float(expected), rel=1e-5)
        # And the same inputs without the masked label agree with the unfused path.
        clean = np.array([[2, 1, 2]], dtype=np.int64)
        fused_clean = ctc_loss_sum_heads(
            [("h", jnp.asarray(logits), jnp.asarray(clean), jnp.asarray([3]))],
            jnp.asarray([time]),
        )
        unfused_clean = ctc_loss_sum(
            jnp.asarray(logits), jnp.asarray([time]), jnp.asarray(clean), jnp.asarray([3])
        )
        assert float(fused_clean["h"]) == pytest.approx(float(unfused_clean), rel=1e-6)


class TestGreedyDecoder:
    def test_collapse_and_blank_removal(self):
        decoder = GreedyCTCDecoder()
        # Sequence: a a blank b b -> tokens [a, b]
        emissions = _emissions_for([2, 2, 0, 3, 3], classes=5, time_per_token=1)
        [hypotheses] = decoder(emissions, np.array([5]))
        hypothesis = hypotheses[0]
        np.testing.assert_array_equal(hypothesis.tokens, [2, 3])
        # flashlight-compatible 1-based run-start timesteps.
        np.testing.assert_array_equal(hypothesis.timesteps, [1, 4])

    def test_respects_lengths(self):
        decoder = GreedyCTCDecoder()
        emissions = _emissions_for([2, 3, 4], classes=5, time_per_token=1)
        [hypotheses] = decoder(emissions, np.array([2]))
        np.testing.assert_array_equal(hypotheses[0].tokens, [2, 3])

    def test_repeated_with_blank_between(self):
        decoder = GreedyCTCDecoder()
        emissions = _emissions_for([2, 0, 2], classes=4, time_per_token=1)
        [hypotheses] = decoder(emissions, np.array([3]))
        np.testing.assert_array_equal(hypotheses[0].tokens, [2, 2])

    def test_batched(self):
        decoder = GreedyCTCDecoder()
        a = _emissions_for([1, 2], classes=4, time_per_token=2)[0]
        b = _emissions_for([3, 0], classes=4, time_per_token=2)[0]
        emissions = np.stack([a, b])
        results = decoder(emissions, np.array([4, 4]))
        np.testing.assert_array_equal(results[0][0].tokens, [1, 2])
        np.testing.assert_array_equal(results[1][0].tokens, [3])

    def test_collect_many_matches_per_head_collect(self):
        decoder = GreedyCTCDecoder()
        heads = {
            "a": _emissions_for([2, 2, 0, 3], classes=5, time_per_token=1),
            "b": _emissions_for([1, 0, 1, 4], classes=5, time_per_token=1),
            "c": _emissions_for([0, 3, 3, 0], classes=5, time_per_token=1),
        }
        lengths = np.array([4])
        dispatched = {name: decoder.dispatch(e, lengths) for name, e in heads.items()}
        fused = GreedyCTCDecoder.collect_many(dispatched)
        assert sorted(fused) == sorted(heads)
        for name in heads:
            expected = decoder.collect(decoder.dispatch(heads[name], lengths))
            for row_fused, row_expected in zip(fused[name], expected):
                assert len(row_fused) == len(row_expected)
                for h_fused, h_expected in zip(row_fused, row_expected):
                    np.testing.assert_array_equal(h_fused.tokens, h_expected.tokens)
                    np.testing.assert_array_equal(h_fused.timesteps, h_expected.timesteps)
                    assert h_fused.score == pytest.approx(h_expected.score)

    def test_collect_many_slim_serving_drain(self):
        """with_timesteps=False (the predict CLI's drain) returns identical
        tokens and scores through the single packed uint16 grid, with empty
        timesteps."""
        import jax
        from allophant_tpu.ops.decode import GreedyCTCDecoder

        rng = np.random.default_rng(2)
        batch, time, classes = 3, 12, 6
        decoder = GreedyCTCDecoder()
        dispatched = {}
        for name in ("alpha", "beta", "gamma"):
            logits = rng.standard_normal((batch, time, classes)).astype(np.float32)
            log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
            dispatched[name] = decoder.dispatch(log_probs, np.array([12, 7, 2]))
        full = GreedyCTCDecoder.collect_many(dict(dispatched))
        slim = GreedyCTCDecoder.collect_many(dict(dispatched), with_timesteps=False)
        for name in dispatched:
            for row in range(batch):
                np.testing.assert_array_equal(
                    slim[name][row][0].tokens, full[name][row][0].tokens
                )
                assert slim[name][row][0].score == pytest.approx(
                    full[name][row][0].score
                )
                assert slim[name][row][0].timesteps.size == 0

    def test_collect_many_empty_and_single(self):
        decoder = GreedyCTCDecoder()
        assert GreedyCTCDecoder.collect_many({}) == {}
        emissions = _emissions_for([2, 3], classes=4, time_per_token=1)
        dispatched = {"only": decoder.dispatch(emissions, np.array([2]))}
        [row] = GreedyCTCDecoder.collect_many(dispatched)["only"]
        np.testing.assert_array_equal(row[0].tokens, [2, 3])

    def test_score_is_sum_of_max(self):
        decoder = GreedyCTCDecoder()
        emissions = np.log(
            np.asarray([[[0.7, 0.2, 0.1], [0.6, 0.3, 0.1]]], dtype=np.float32)
        )
        [hypotheses] = decoder(emissions, np.array([2]))
        assert hypotheses[0].score == pytest.approx(np.log(0.7) + np.log(0.6), rel=1e-5)

    def test_logits_variant_matches_log_prob_variant(self):
        import jax

        from allophant_tpu.ops.decode import greedy_decode_logits, greedy_decode_padded

        rng = np.random.default_rng(7)
        logits = rng.standard_normal((4, 17, 9)).astype(np.float32) * 3.0
        lengths = np.array([17, 11, 5, 0])
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        tokens_ref, steps_ref, counts_ref, scores_ref = greedy_decode_padded(
            log_probs, jnp.asarray(lengths)
        )
        tokens, steps, counts, scores = greedy_decode_logits(
            jnp.asarray(logits), jnp.asarray(lengths)
        )
        np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens_ref))
        np.testing.assert_array_equal(np.asarray(steps), np.asarray(steps_ref))
        np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts_ref))
        np.testing.assert_allclose(
            np.asarray(scores), np.asarray(scores_ref), rtol=1e-5, atol=1e-5
        )

    def test_logits_variant_bf16_input(self):
        from allophant_tpu.ops.decode import greedy_decode_logits

        rng = np.random.default_rng(11)
        logits32 = rng.standard_normal((2, 9, 6)).astype(np.float32) * 2.0
        logits = jnp.asarray(logits32, dtype=jnp.bfloat16)
        lengths = jnp.asarray(np.array([9, 4]))
        tokens, _steps, counts, scores = greedy_decode_logits(logits, lengths)
        # argmax over bf16 logits matches f32 here (values well separated by seed
        # choice); scores come from the f32 accumulation path and must be finite.
        expected = np.asarray(logits, dtype=np.float32).argmax(-1)
        first = np.asarray(tokens)[0, : int(counts[0])]
        collapsed = [t for i, t in enumerate(expected[0, :9]) if (i == 0 or t != expected[0, i - 1]) and t != 0]
        np.testing.assert_array_equal(first, collapsed)
        assert np.isfinite(np.asarray(scores)).all()


class TestBeamDecoder:
    def test_agrees_with_greedy_on_peaked(self):
        greedy = GreedyCTCDecoder()
        beam = BeamCTCDecoder(["<blank>", "a", "b", "c"], beam_width=4)
        emissions = _emissions_for([1, 0, 2, 3], classes=4, time_per_token=1)
        greedy_tokens = greedy(emissions, np.array([4]))[0][0].tokens
        beam_tokens = beam(emissions, np.array([4]))[0][0].tokens
        np.testing.assert_array_equal(greedy_tokens, beam_tokens)

    def test_beam_sums_paths(self):
        # Classic case where beam (path-summing) beats greedy: two frames where
        # blank is individually most likely but token paths sum higher.
        log_probs = np.log(np.asarray([[[0.4, 0.6], [0.4, 0.6]]], dtype=np.float32))
        beam = BeamCTCDecoder(["<blank>", "a"], beam_width=4)
        result = beam(log_probs, np.array([2]))[0][0]
        # P(a) = 0.6*0.6 + 0.6*0.4 + 0.4*0.6 = 0.84 > P(empty) = 0.16
        np.testing.assert_array_equal(result.tokens, [1])
        assert result.score == pytest.approx(np.log(0.84), rel=1e-4)

    def test_n_best(self):
        log_probs = np.log(np.asarray([[[0.5, 0.3, 0.2], [0.5, 0.3, 0.2]]], dtype=np.float32))
        beam = BeamCTCDecoder(["<blank>", "a", "b"], beam_width=6, n_best=3)
        hypotheses = beam(log_probs, np.array([2]))[0]
        assert len(hypotheses) == 3
        scores = [hypothesis.score for hypothesis in hypotheses]
        assert scores == sorted(scores, reverse=True)


class TestDeviceBeamDecoder:
    def test_matches_host_beam_search(self):
        import jax
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        rng = np.random.default_rng(7)
        batch, time, classes = 4, 24, 8
        logits = rng.standard_normal((batch, time, classes)).astype(np.float32) * 2
        log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        lengths = np.array([24, 17, 9, 3])

        host = BeamCTCDecoder([str(i) for i in range(classes)], beam_width=8, n_best=2)
        device = DeviceBeamCTCDecoder([str(i) for i in range(classes)], beam_width=8, n_best=2)
        host_out = host(log_probs, lengths)
        device_out = device(log_probs, lengths)
        for row in range(batch):
            np.testing.assert_array_equal(host_out[row][0].tokens, device_out[row][0].tokens)
            assert host_out[row][0].score == pytest.approx(device_out[row][0].score, abs=1e-3)

    def test_timesteps_match_host_on_merged_prefixes(self):
        """n-best timesteps are part of the prediction format: merged prefixes
        must keep the best-scoring path's emission times in both beams."""
        import jax
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        rng = np.random.default_rng(11)
        batch, time, classes = 6, 16, 5
        # Near-uniform emissions maximize prefix merging (many paths tie into
        # the same short prefixes).
        logits = rng.standard_normal((batch, time, classes)).astype(np.float32) * 0.5
        log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        lengths = np.array([16, 12, 9, 16, 7, 4])

        host = BeamCTCDecoder([str(i) for i in range(classes)], beam_width=8, n_best=3)
        device = DeviceBeamCTCDecoder([str(i) for i in range(classes)], beam_width=8, n_best=3)
        host_out = host(log_probs, lengths)
        device_out = device(log_probs, lengths)
        for row in range(batch):
            for host_hyp, device_hyp in zip(host_out[row], device_out[row]):
                np.testing.assert_array_equal(host_hyp.tokens, device_hyp.tokens)
                np.testing.assert_array_equal(
                    host_hyp.timesteps,
                    device_hyp.timesteps,
                    err_msg=f"timestep mismatch in row {row}",
                )

    def test_merged_prefix_keeps_best_path_timesteps(self):
        """Hand-built merge: prefix (a,) is reachable by emitting `a` at t=0
        (strong) or t=1 (weak); the merged hypothesis must report t=1-based
        timestep of the stronger path."""
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        # t0: a likely, t1: blank likely (so late-a path is weaker).
        log_probs = np.log(
            np.array([[[0.2, 0.8], [0.7, 0.3]]], dtype=np.float32)
        )
        for decoder in (
            BeamCTCDecoder(["<blank>", "a"], beam_width=4),
            DeviceBeamCTCDecoder(["<blank>", "a"], beam_width=4),
        ):
            result = decoder(log_probs, np.array([2]))[0][0]
            assert result.tokens.tolist() == [1]
            assert result.timesteps.tolist() == [1]

    def test_beam_collect_many_matches_per_head_collect(self):
        """DeviceBeamCTCDecoder.collect_many (two stacked transfers for the
        whole beam wave, the `predict -b N` drain) reproduces per-head collect
        exactly — tokens, scores, timesteps, dead-beam filtering."""
        import jax
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        rng = np.random.default_rng(9)
        batch, time, classes = 4, 18, 6
        lengths = np.array([18, 12, 5, 2])
        decoders = {}
        dispatched = {}
        for name in ("alpha", "beta", "gamma"):
            logits = rng.standard_normal((batch, time, classes)).astype(np.float32)
            log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
            decoder = DeviceBeamCTCDecoder(
                [str(i) for i in range(classes)], beam_width=4, n_best=3
            )
            decoders[name] = decoder
            dispatched[name] = decoder.dispatch(log_probs, lengths)
        fused = DeviceBeamCTCDecoder.collect_many(dict(dispatched), decoders)
        for name, decoder in decoders.items():
            expected = decoder.collect(dispatched[name])
            assert len(fused[name]) == len(expected)
            for row_fused, row_expected in zip(fused[name], expected):
                assert len(row_fused) == len(row_expected)
                for h_fused, h_expected in zip(row_fused, row_expected):
                    np.testing.assert_array_equal(h_fused.tokens, h_expected.tokens)
                    np.testing.assert_array_equal(h_fused.timesteps, h_expected.timesteps)
                    assert h_fused.score == pytest.approx(h_expected.score)

    def test_device_backtrace_matches_host(self):
        """backtrace_beams_device (reverse lax.scan, the production collect
        path) reproduces the host backtrace_beams token grid exactly on random
        beam-search outputs with ragged lengths."""
        import jax
        from allophant_tpu.ops.decode import (
            backtrace_beams,
            backtrace_beams_device,
            beam_search_padded,
        )

        rng = np.random.default_rng(3)
        batch, time, classes = 5, 20, 7
        logits = rng.standard_normal((batch, time, classes)).astype(np.float32)
        log_probs = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        lengths = np.array([20, 15, 8, 3, 1])

        parents, emitted, scores = beam_search_padded(
            jnp.asarray(log_probs), jnp.asarray(lengths), beam_width=4
        )
        host_collected, _scores = backtrace_beams(
            np.asarray(parents), np.asarray(emitted), np.asarray(scores), lengths
        )
        device_collected = np.asarray(backtrace_beams_device(parents, emitted, lengths))
        np.testing.assert_array_equal(device_collected, host_collected)

    def test_beam_sums_paths_device(self):
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        # Two frames where greedy picks the label but path-summing favors blank
        # collapse differences (same case as the host test above).
        log_probs = np.log(np.array([[[0.4, 0.6], [0.6, 0.4]]], dtype=np.float32))
        decoder = DeviceBeamCTCDecoder(["<blank>", "a"], beam_width=4)
        result = decoder(log_probs, np.array([2]))[0][0]
        assert result.tokens.tolist() == [1]

    def test_empty_result(self):
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        # All-blank emissions decode to the empty sequence.
        log_probs = np.full((1, 5, 3), -10.0, dtype=np.float32)
        log_probs[:, :, 0] = -0.001
        decoder = DeviceBeamCTCDecoder(["<blank>", "a", "b"], beam_width=4)
        result = decoder(log_probs, np.array([5]))[0][0]
        assert result.tokens.size == 0


class TestDeviceBeamDeadSlots:
    def test_zero_length_returns_single_live_hypothesis(self):
        """Dead beam slots (score pinned at -1e30) are padding, not hypotheses:
        a zero-length utterance has exactly one live beam (the empty prefix),
        so n_best > 1 must not surface duplicates with sentinel scores."""
        import jax
        from allophant_tpu.ops.decode import DeviceBeamCTCDecoder

        rng = np.random.default_rng(3)
        log_probs = np.asarray(
            jax.nn.log_softmax(rng.standard_normal((2, 8, 5)).astype(np.float32), axis=-1)
        )
        decoder = DeviceBeamCTCDecoder([str(i) for i in range(5)], beam_width=4, n_best=3)
        out = decoder(log_probs, np.array([0, 8]))
        assert len(out[0]) == 1
        assert out[0][0].tokens.size == 0
        assert out[0][0].score == pytest.approx(0.0)
        for hypothesis in out[1]:
            assert hypothesis.score > -1e15


class TestBeamKernel:
    """Single-kernel Pallas beam search (ops/beam_kernel.py): integer-exact
    against the lax.scan formulation it replaces on TPU (interpret mode here;
    the device path is routed by decode.beam_search_device)."""

    def _compare(self, batch, time, classes, beam_width, lengths, seed, scale=2.0):
        import jax

        from allophant_tpu.ops.beam_kernel import beam_search_padded_pallas
        from allophant_tpu.ops.decode import beam_search_padded

        rng = np.random.default_rng(seed)
        logits = rng.standard_normal((batch, time, classes)).astype(np.float32) * scale
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        lengths = jnp.asarray(lengths, jnp.int32)
        expected = beam_search_padded(log_probs, lengths, beam_width=beam_width)
        got = beam_search_padded_pallas(
            log_probs, lengths, beam_width=beam_width, block_rows=2, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(expected[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(expected[1]), np.asarray(got[1]))
        np.testing.assert_allclose(np.asarray(expected[2]), np.asarray(got[2]), atol=1e-4)

    def test_matches_scan_search(self):
        self._compare(4, 48, 12, 4, [48, 31, 9, 1], seed=0)

    def test_matches_scan_near_uniform_merging(self):
        # Near-uniform emissions maximize prefix merges (the hash-collision path).
        self._compare(4, 32, 5, 4, [32, 32, 17, 32], seed=1, scale=0.3)

    def test_matches_scan_zero_length_rows(self):
        self._compare(2, 16, 7, 3, [0, 16], seed=2)

    def test_plan_fallback(self):
        from allophant_tpu.ops.beam_kernel import plan_beam_kernel

        # Bench shape fits with the full block.
        assert plan_beam_kernel(128, 512, 41) == 8
        # Full-Allophoible-scale class counts shrink the block instead of failing.
        assert plan_beam_kernel(128, 512, 2400) == 1
        # Absurd shapes fall back to the scan implementation.
        assert plan_beam_kernel(128, 16384, 2400) is None

    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="Mosaic compile/execution path; run with ALLOPHANT_TEST_TPU=1",
    )
    @pytest.mark.parametrize(
        "batch,time,classes",
        [(16, 256, 41), (8, 256, 600)],  # 8-row and (VMEM-shrunk) 2-row plans
    )
    def test_device_matches_scan(self, batch, time, classes):
        """On-device Mosaic execution agrees integer-exactly with the scan
        (interpret mode can hide lowering bugs: i1 selects, scatter, block
        rules — all hit during bring-up)."""
        import jax

        from allophant_tpu.ops.beam_kernel import beam_search_padded_pallas
        from allophant_tpu.ops.decode import beam_search_padded

        rng = np.random.default_rng(5)
        logits = rng.standard_normal((batch, time, classes)).astype(np.float32) * 2
        log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
        lengths = jnp.asarray(rng.integers(1, time + 1, batch).astype(np.int32))
        expected = jax.block_until_ready(beam_search_padded(log_probs, lengths, beam_width=4))
        got = jax.block_until_ready(beam_search_padded_pallas(log_probs, lengths, beam_width=4))
        np.testing.assert_array_equal(np.asarray(expected[0]), np.asarray(got[0]))
        np.testing.assert_array_equal(np.asarray(expected[1]), np.asarray(got[1]))
        np.testing.assert_allclose(np.asarray(expected[2]), np.asarray(got[2]), atol=1e-4)


class TestZeroMeanUnitVarNorm:
    def test_zero_length_filler_rows_keep_gradients_finite(self):
        """Batch-padding filler rows (length 0) must not inject NaNs: an
        unclamped 0/0 mean poisons *parameter* gradients via the backward
        matmuls even when the loss masks the row out (NaN * 0 = NaN)."""
        import jax
        from allophant_tpu.ops import masking

        def loss(weights, audio, lengths):
            mask = masking.mask_sequence(lengths, audio.shape[1])
            normed = masking.zero_mean_unit_var_norm(audio, lengths, mask)
            projected = normed @ weights
            row_weights = (lengths > 0).astype(audio.dtype)
            per_row = (projected**2).sum(axis=1)
            per_row = jnp.where(jnp.isfinite(per_row), per_row, 0.0)
            return (per_row * row_weights).sum()

        weights = jnp.full((8, 4), 0.5)
        audio = jnp.arange(16.0).reshape(2, 8)
        lengths = jnp.array([8, 0])
        value, gradient = jax.value_and_grad(loss)(weights, audio, lengths)
        assert bool(jnp.isfinite(value))
        assert bool(jnp.isfinite(gradient).all())
        # The real row still normalizes over its true length only.
        mask = masking.mask_sequence(jnp.array([4, 8]), 8)
        normed = masking.zero_mean_unit_var_norm(audio, jnp.array([4, 8]), mask)
        np.testing.assert_allclose(np.asarray(normed[0, :4]).mean(), 0.0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(normed[0, 4:]), 0.0)


class TestStridedConvMatmul:
    """ops/strided_conv.py must match the XLA convolution exactly in structure
    (same taps, same VALID-padding length math) for every feature-extractor
    layer shape the wav2vec2 conv stack uses."""

    @pytest.mark.parametrize(
        "kernel_size,stride,length",
        [(2, 2, 64), (3, 2, 64), (3, 2, 65), (4, 2, 50), (6, 2, 51), (10, 5, 163), (5, 3, 47), (3, 1, 20)],
    )
    def test_matches_xla_conv(self, kernel_size, stride, length):
        import jax
        from allophant_tpu.ops.strided_conv import strided_conv_matmul

        rng = np.random.default_rng(kernel_size * 100 + stride)
        c_in, c_out = 6, 5
        hidden = jnp.asarray(rng.standard_normal((2, length, c_in)), jnp.float32)
        kernel = jnp.asarray(rng.standard_normal((kernel_size, c_in, c_out)), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((c_out,)), jnp.float32)

        expected = jax.lax.conv_general_dilated(
            hidden,
            kernel,
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias

        with jax.default_matmul_precision("highest"):
            result = strided_conv_matmul(hidden, kernel, bias, stride)
        assert result.shape == expected.shape
        np.testing.assert_allclose(np.asarray(result), np.asarray(expected), rtol=1e-5, atol=1e-5)

    def test_no_bias_and_short_input(self):
        import jax
        from allophant_tpu.ops.strided_conv import strided_conv_matmul

        rng = np.random.default_rng(7)
        hidden = jnp.asarray(rng.standard_normal((1, 3, 4)), jnp.float32)
        kernel = jnp.asarray(rng.standard_normal((3, 4, 2)), jnp.float32)
        expected = jax.lax.conv_general_dilated(
            hidden, kernel, window_strides=(2,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        with jax.default_matmul_precision("highest"):
            result = strided_conv_matmul(hidden, kernel, None, 2)
        np.testing.assert_allclose(np.asarray(result), np.asarray(expected), rtol=1e-5, atol=1e-5)
        with pytest.raises(ValueError):
            strided_conv_matmul(hidden[:, :2], kernel, None, 2)
