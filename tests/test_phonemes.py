"""Tests for the native IPA segmenter and edit-distance engine.

Hand cases follow the documented semantics of the reference's Rust implementation
(/root/reference/src/ipa_segmenter.rs:143-164 test vectors and
/root/reference/src/edit_distance.rs DP/backtrace rules).
"""

import pytest

from allophant_tpu import phonemes
from allophant_tpu.phonemes import (
    Action,
    EditStatistics,
    IpaSegmenter,
    MissingSegmentError,
    PropertyWeighting,
    levensthein,
    levensthein_matrix,
    levensthein_operations,
    levensthein_statistics,
    to_substitutions,
)


def test_native_library_built():
    assert phonemes.NATIVE_AVAILABLE, "C++ core failed to build; tests running on fallback"


class TestSegmenter:
    def test_reference_vectors(self):
        segmenter = IpaSegmenter(["test", "te", "tool"])
        assert segmenter.segment("atoolbtestattet") == ["tool", "test", "te"]
        assert segmenter.segment("") == []
        assert segmenter.segment("Segments don't match here") == []
        with pytest.raises(MissingSegmentError):
            segmenter.segment_checked("atoolbtestatte")
        assert segmenter.segment_checked("testtoolte") == ["test", "tool", "te"]

    def test_leftmost_longest(self):
        segmenter = IpaSegmenter(["ab", "bcd", "abc"])
        # Leftmost match wins even if a longer match starts later.
        assert segmenter.segment("abcd") == ["abc"]
        segmenter = IpaSegmenter(["ab", "bcd"])
        assert segmenter.segment("abcd") == ["ab"]

    def test_include_missing(self):
        segmenter = IpaSegmenter(["a", "b"])
        assert segmenter.segment("xaby", include_missing=True) == ["x", "a", "b", "y"]
        assert segmenter.segment("ab", include_missing=True) == ["a", "b"]
        assert segmenter.segment("xy", include_missing=True) == ["xy"]

    def test_unicode_ipa(self):
        # Multi-byte IPA with ties and diacritics.
        segmenter = IpaSegmenter(["t͡ʃ", "t", "ʃ", "a", "ŋ"])
        assert segmenter.segment("t͡ʃaŋ") == ["t͡ʃ", "a", "ŋ"]
        assert segmenter.segment_checked("taʃ") == ["t", "a", "ʃ"]

    def test_segment_words(self):
        segmenter = IpaSegmenter(["a", "b", "ab"])
        assert segmenter.segment_words(["ab", "ba"]) == ["ab", "b", "a"]
        assert segmenter.segment_words_checked(["ab"]) == ["ab"]
        with pytest.raises(MissingSegmentError):
            segmenter.segment_words_checked(["ax"])

    def test_ipa_segments_property(self):
        segmenter = IpaSegmenter(["x", "y"])
        assert segmenter.ipa_segments == ["x", "y"]


class TestLevenshtein:
    def test_distance(self):
        assert levensthein(list("kitten"), list("sitting")) == 3
        assert levensthein([], []) == 0
        assert levensthein(list("abc"), []) == 3
        assert levensthein([], list("abc")) == 3
        assert levensthein(list("same"), list("same")) == 0

    def test_statistics_counts(self):
        stats = levensthein_statistics(list("kitten"), list("sitting"))
        # kitten -> sitting: 2 substitutions (k->s, e->i), 1 insertion (g), 4 correct.
        assert stats.substitutions == 2
        assert stats.insertions == 1
        assert stats.deletions == 0
        assert stats.correct == 4
        assert stats.word_error_rate() == pytest.approx(3 / 6)

    def test_statistics_identity(self):
        stats = levensthein_statistics(list("abc"), list("abc"))
        assert stats == EditStatistics(0, 0, 0, 3)

    def test_degenerate_rates_do_not_raise(self):
        """Empty references: insertions-only yields inf (matching the
        reference's Rust f64 division), all-zero yields 0.0 — never
        ZeroDivisionError (an empty reference with predictions is reachable
        through evaluate)."""
        import math

        insertions_only = EditStatistics(3, 0, 0, 0)
        assert insertions_only.word_error_rate() == math.inf
        assert insertions_only.insertion_rate() == math.inf
        empty = EditStatistics(0, 0, 0, 0)
        assert empty.word_error_rate() == 0.0
        assert empty.substitution_rate() == 0.0

    def test_statistics_empty(self):
        stats = levensthein_statistics([], list("ab"))
        assert stats == EditStatistics(2, 0, 0, 0)
        stats = levensthein_statistics(list("ab"), [])
        assert stats == EditStatistics(0, 2, 0, 0)

    def test_operations_roundtrip(self):
        expected = list("kitten")
        actual = list("sitting")
        operations, cost = levensthein_operations(expected, actual)
        assert cost == 3.0
        substitutions = to_substitutions(expected, actual, operations)
        # Applying the operations to `expected` must yield `actual`.
        rebuilt = expected[:]
        for action, a_index, b_index in reversed(operations):
            if action == Action.SUBSTITUTION:
                rebuilt[a_index] = actual[b_index]
            elif action == Action.DELETION:
                del rebuilt[a_index]
            else:
                rebuilt.insert(a_index + 1, actual[b_index])
        assert rebuilt == actual
        assert all(isinstance(entry[0], Action) for entry in substitutions)

    def test_matrix(self):
        matrix = levensthein_matrix(list("ab"), list("ac"))
        assert matrix.shape == (3, 3)
        assert matrix[0, 0] == 0
        assert matrix[2, 2] == 1  # one substitution
        assert list(matrix[0]) == [0, 1, 2]
        assert list(matrix[:, 0]) == [0, 1, 2]

    def test_statistics_matches_distance(self):
        import random

        rng = random.Random(7)
        alphabet = "abcde"
        for _ in range(50):
            a = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
            b = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
            stats = levensthein_statistics(a, b)
            distance = levensthein(a, b)
            assert stats.insertions + stats.deletions + stats.substitutions == distance
            # Path length bookkeeping: correct + subs + dels == len(a).
            assert stats.correct + stats.substitutions + stats.deletions == len(a)
            assert stats.correct + stats.substitutions + stats.insertions == len(b)


class TestAction:
    def test_from_int(self):
        assert Action.from_int(0) == Action.INSERTION
        assert Action.from_int(1) == Action.DELETION
        assert Action.from_int(2) == Action.SUBSTITUTION
        with pytest.raises(ValueError):
            Action.from_int(3)
        assert int(Action.SUBSTITUTION) == 2


class TestPropertyWeighting:
    def test_weighted_substitution(self):
        # Feature table: symbols -> binary feature vectors.
        table = {"a": [0, 0, 0], "b": [0, 0, 1], "c": [1, 1, 1]}
        weighting = PropertyWeighting(1.0, 1.0, table)
        # a -> b differs in 1 feature; a -> c differs in 3.
        matrix = weighting.levensthein_matrix(["a"], ["b"])
        assert matrix[1, 1] == 1.0
        matrix = weighting.levensthein_matrix(["a"], ["c"])
        # Substitution cost 3 > insertion + deletion (2), so the DP picks 2.
        assert matrix[1, 1] == 2.0

    def test_weighted_statistics(self):
        table = {"a": [0, 0], "b": [0, 1], "c": [1, 1]}
        weighting = PropertyWeighting(1.0, 1.0, table)
        stats = weighting.levensthein_statistics(["a", "b"], ["a", "c"])
        # b -> c differs in one feature: prefer substitution over ins+del.
        assert stats == EditStatistics(0, 0, 1, 1)

    def test_uniform_equivalence_when_all_features_differ_once(self):
        # With distinct one-hot rows every substitution costs 2; ins+del also 2 -
        # exercise tie-break (substitution preferred on ties).
        table = {s: [1 if i == k else 0 for i in range(4)] for k, s in enumerate("wxyz")}
        weighting = PropertyWeighting(1.0, 1.0, table)
        stats = weighting.levensthein_statistics(["w", "x"], ["w", "y"])
        assert stats.substitutions == 1
        assert stats.correct == 1


import numpy as np


class TestNativePythonEquivalence:
    """Property tests: the C++ core and the pure-Python fallback must agree on
    random inputs (the fallback silently takes over when the toolchain is
    missing, so divergence would corrupt evaluation numbers undetected)."""

    def test_levenshtein_random_equivalence(self):
        import allophant_tpu.phonemes as ph

        if not ph.NATIVE_AVAILABLE:
            pytest.skip("native core unavailable")
        rng = np.random.default_rng(42)
        alphabet = list("abcdefg")
        for _ in range(200):
            a = rng.choice(alphabet, size=rng.integers(0, 12)).tolist()
            b = rng.choice(alphabet, size=rng.integers(0, 12)).tolist()
            native = ph.levensthein(a, b)
            python = ph._python_distance(*ph._intern_ids(a, b))
            assert native == python, (a, b)

    def test_statistics_random_equivalence(self):
        import allophant_tpu.phonemes as ph

        if not ph.NATIVE_AVAILABLE:
            pytest.skip("native core unavailable")
        rng = np.random.default_rng(7)
        alphabet = list("abcd")
        for _ in range(100):
            a = rng.choice(alphabet, size=rng.integers(0, 10)).tolist()
            b = rng.choice(alphabet, size=rng.integers(0, 10)).tolist()
            stats = ph.levensthein_statistics(a, b)
            # I/D/S/C counts must be internally consistent with the distance
            # and the sequence lengths.
            assert stats.substitutions + stats.deletions + stats.correct == len(a)
            assert stats.substitutions + stats.insertions + stats.correct == len(b)
            assert (
                stats.substitutions + stats.deletions + stats.insertions
                == ph.levensthein(a, b)
            )

    def test_segmenter_matches_bruteforce(self):
        import allophant_tpu.phonemes as ph

        if not ph.NATIVE_AVAILABLE:
            pytest.skip("native core unavailable")

        def brute_force(text, patterns):
            # Greedy leftmost-longest reference implementation.
            out, pos = [], 0
            while pos < len(text):
                best = None
                for pattern in patterns:
                    if text.startswith(pattern, pos) and (
                        best is None or len(pattern) > len(best)
                    ):
                        best = pattern
                if best is None:
                    pos += 1  # silent skip
                else:
                    out.append(best)
                    pos += len(best)
            return out

        rng = np.random.default_rng(3)
        symbols = ["a", "b", "ab", "ba", "aab", "c", "cc"]
        segmenter = ph.IpaSegmenter(symbols)
        for _ in range(200):
            text = "".join(rng.choice(list("abc"), size=rng.integers(0, 15)))
            assert segmenter.segment(text) == brute_force(text, symbols), text


class TestNativeLoadMemoization:
    def test_failed_build_not_retried(self, monkeypatch):
        """A failed native build must be memoized — without the guard every
        edit-distance call re-hashes the C++ sources and re-spawns a compile."""
        from allophant_tpu.native import build

        calls = {"count": 0}

        def exploding_library_path():
            calls["count"] += 1
            raise RuntimeError("no compiler")

        monkeypatch.setattr(phonemes, "_LIB", None)
        monkeypatch.setattr(phonemes, "_LOAD_FAILED", False)
        monkeypatch.setattr(build, "library_path", exploding_library_path)
        assert phonemes.levensthein("abc", "abd") == 1
        assert phonemes.levensthein("abc", "bc") == 1
        assert calls["count"] == 1
