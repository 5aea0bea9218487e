"""Batched Levenshtein distance on device — the vectorized TPU scorer.

The reference computes per-utterance edit statistics through its Rust extension, one
O(m*n) DP per utterance on the host (SURVEY.md §3.4 eval hot loop). For corpus-level
PER only the *distance* is needed: with uniform costs the minimal edit distance equals
S + D + I, and the expected length equals S + D + C, so

    PER = sum(distance) / sum(expected_length)

— no backtrace required. This module computes distances for a whole padded batch of id
sequences in one jit-compiled program: a ``lax.scan`` over rows where each row is
vectorized over (batch x positions) and the insertion recurrence's serial dependency
is resolved with an associative prefix-min over ``t[k] - k``:

    row[j] = min_{k<=j} (t[k] + (j - k))  where  t = min(deletion, substitution)

The full I/D/S/C breakdown (needed for result-file statistics) still runs through the
native C++ engine per utterance; this op serves fast whole-corpus scoring and the
benchmark path."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("uniform",))
def batched_levenshtein_distances(
    sequences_a: jnp.ndarray,
    lengths_a: jnp.ndarray,
    sequences_b: jnp.ndarray,
    lengths_b: jnp.ndarray,
    uniform: bool = True,
) -> jnp.ndarray:
    """Levenshtein distances for a batch of padded int id sequences.

    ``sequences_a``: [B, M]; ``sequences_b``: [B, N]; returns [B] float32 distances.
    Padding values are ignored via the length vectors."""
    batch, max_m = sequences_a.shape
    max_n = sequences_b.shape[1]

    positions = jnp.arange(max_n + 1, dtype=jnp.float32)
    initial_row = jnp.broadcast_to(positions, (batch, max_n + 1))

    def step(row, index):
        symbol = sequences_a[:, index][:, None]  # [B, 1]
        substitution_cost = (symbol != sequences_b).astype(jnp.float32)  # [B, N]
        deletion = row + 1.0  # [B, N+1] (prev[j] + 1)
        substitution = row[:, :-1] + substitution_cost  # prev[j-1] + cost -> column j
        # t[j] = min(deletion[j], substitution[j]) for j >= 1; t[0] = prev[0] + 1.
        t = jnp.concatenate(
            (deletion[:, :1], jnp.minimum(deletion[:, 1:], substitution)), axis=1
        )
        # row[j] = j + min_{k<=j}(t[k] - k): associative prefix-min handles the
        # insertion chain without a serial loop over j.
        shifted = t - positions[None, :]
        prefix = jax.lax.associative_scan(jnp.minimum, shifted, axis=1)
        new_row = prefix + positions[None, :]
        # Rows beyond each sequence's length leave the DP state unchanged.
        active = (index < lengths_a)[:, None]
        return jnp.where(active, new_row, row), None

    final_row, _ = jax.lax.scan(step, initial_row, jnp.arange(max_m))
    return jnp.take_along_axis(final_row, lengths_b[:, None], axis=1)[:, 0]


def corpus_error_rate(
    expected_ids: np.ndarray,
    expected_lengths: np.ndarray,
    actual_ids: np.ndarray,
    actual_lengths: np.ndarray,
) -> float:
    """Micro (corpus-pooled) error rate: sum of distances over sum of expected
    lengths. ``expected`` plays the role of the reference transcript."""
    distances = batched_levenshtein_distances(
        jnp.asarray(expected_ids),
        jnp.asarray(expected_lengths),
        jnp.asarray(actual_ids),
        jnp.asarray(actual_lengths),
    )
    return float(np.asarray(distances).sum() / max(int(expected_lengths.sum()), 1))


def encode_token_batches(expected: list, actual: list, pad_multiple: int = 8):
    """Host-side: interns string tokens to shared ids and pads both sides into dense
    int32 batches for the device scorer. Returns (a_ids, a_lengths, b_ids, b_lengths)."""
    vocabulary: dict = {}

    def intern(sequence):
        ids = np.empty(len(sequence), dtype=np.int32)
        for position, token in enumerate(sequence):
            identifier = vocabulary.get(token)
            if identifier is None:
                identifier = len(vocabulary)
                vocabulary[token] = identifier
            ids[position] = identifier
        return ids

    expected_ids = [intern(sequence) for sequence in expected]
    actual_ids = [intern(sequence) for sequence in actual]

    def pack(rows):
        lengths = np.asarray([len(row) for row in rows], dtype=np.int32)
        width = max(int(lengths.max(initial=1)), 1)
        width = ((width + pad_multiple - 1) // pad_multiple) * pad_multiple
        packed = np.full((len(rows), width), -1, dtype=np.int32)
        for index, row in enumerate(rows):
            packed[index, : len(row)] = row
        return packed, lengths

    a_ids, a_lengths = pack(expected_ids)
    b_ids, b_lengths = pack(actual_ids)
    # Distinct padding ids on each side so padding never matches.
    b_ids[b_ids == -1] = -2
    return a_ids, a_lengths, b_ids, b_lengths
