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


@jax.jit
def batched_levenshtein_distances(
    sequences_a: jnp.ndarray,
    lengths_a: jnp.ndarray,
    sequences_b: jnp.ndarray,
    lengths_b: jnp.ndarray,
) -> jnp.ndarray:
    """Uniform-cost Levenshtein distances for a batch of padded int id sequences
    (weighted substitution costs live in the host ``PropertyWeighting`` engine).

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


@jax.jit
def batched_edit_statistics(
    sequences_a: jnp.ndarray,
    lengths_a: jnp.ndarray,
    sequences_b: jnp.ndarray,
    lengths_b: jnp.ndarray,
):
    """Full I/D/S/C edit statistics for a padded batch, on device.

    Anti-diagonal wavefront DP: cells on diagonal ``d`` (i + j = d) depend only on
    diagonals d-1 and d-2, so each scan step is fully vectorized over
    (batch x diagonal). Counters follow the reference backtrace's tie-break order
    (native engine / phonemes.py:_python_backtrace): prefer the cheaper of
    deletion/insertion (deletion on ties ... strictly: deletion iff cheaper),
    then substitution/match whenever the diagonal source is at most that cost.

    ``sequences_a`` is the expected side [B, M]; ``sequences_b`` the actual side
    [B, N]. Returns (insertions, deletions, substitutions, correct) int32 [B]."""
    batch, max_m = sequences_a.shape
    max_n = sequences_b.shape[1]
    rows = max_m + 1  # cells indexed by i along each diagonal

    index_i = jnp.arange(rows, dtype=jnp.int32)[None, :]  # [1, M+1]
    a_at = jnp.pad(sequences_a, ((0, 0), (1, 0)), constant_values=-3)  # a_at[:, i] = a[i-1]

    big = jnp.float32(1e9)

    def cell_update(d, cost_d1, cost_d2, counts_d1, counts_d2):
        """Computes diagonal d from d-1 (cost_d1) and d-2; returns (cost, counts)."""
        j = d - index_i  # [1, rows] column index per cell
        valid = (index_i <= jnp.minimum(d, max_m)) & (j >= 0) & (j <= max_n)

        # Sources: deletion (i-1, j) = d1[i-1]; insertion (i, j-1) = d1[i];
        # substitution (i-1, j-1) = d2[i-1].
        del_cost = jnp.pad(cost_d1, ((0, 0), (1, 0)), constant_values=big)[:, :rows]
        ins_cost = cost_d1
        sub_cost_src = jnp.pad(cost_d2, ((0, 0), (1, 0)), constant_values=big)[:, :rows]

        b_index = jnp.clip(j - 1, 0, max_n - 1)
        b_symbols = jnp.take_along_axis(
            sequences_b, jnp.broadcast_to(b_index, (batch, rows)), axis=1
        )
        mismatch = (a_at != b_symbols).astype(jnp.float32)

        new_cost = jnp.minimum(
            jnp.minimum(del_cost + 1.0, ins_cost + 1.0), sub_cost_src + mismatch
        )

        # Tie-break (reference backtrace): candidate = deletion if strictly cheaper
        # than insertion else insertion; diagonal wins when sub_source <= candidate.
        del_preferred = del_cost < ins_cost
        cand_cost = jnp.where(del_preferred, del_cost, ins_cost)
        take_diag = sub_cost_src <= cand_cost
        is_match = take_diag & (sub_cost_src == new_cost)

        ins1, del1, sub1, cor1 = counts_d1
        ins2, del2, sub2, cor2 = counts_d2

        def shifted(x):
            return jnp.pad(x, ((0, 0), (1, 0)))[:, :rows]

        def choose(diag, dele, ins):
            return jnp.where(
                take_diag, diag, jnp.where(del_preferred, dele, ins)
            )

        new_ins = choose(shifted(ins2), shifted(ins1), ins1 + 1)
        new_del = choose(shifted(del2), shifted(del1) + 1, del1)
        new_sub = choose(
            shifted(sub2) + (take_diag & ~is_match).astype(jnp.int32), shifted(sub1), sub1
        )
        new_cor = choose(shifted(cor2) + is_match.astype(jnp.int32), shifted(cor1), cor1)

        # Boundary cells: i == 0 -> all insertions; j == 0 -> all deletions.
        top_row = index_i == 0
        left_col = j == 0
        new_cost = jnp.where(top_row, j.astype(jnp.float32), new_cost)
        new_cost = jnp.where(left_col, index_i.astype(jnp.float32), new_cost)
        zeros = jnp.zeros_like(new_ins)
        new_ins = jnp.where(top_row, j, jnp.where(left_col, zeros, new_ins))
        new_del = jnp.where(left_col, index_i, jnp.where(top_row, zeros, new_del))
        new_sub = jnp.where(top_row | left_col, zeros, new_sub)
        new_cor = jnp.where(top_row | left_col, zeros, new_cor)

        new_cost = jnp.where(valid, new_cost, big)
        return new_cost, (new_ins, new_del, new_sub, new_cor)

    zero_counts = jnp.zeros((batch, rows), jnp.int32)
    zero_result = jnp.zeros((batch, 1), jnp.int32)
    init_cost = jnp.full((batch, rows), big).at[:, 0].set(0.0)  # diagonal 0: cell (0,0)
    state = (
        init_cost,
        jnp.full((batch, rows), big),
        (zero_counts, zero_counts, zero_counts, zero_counts),
        (zero_counts, zero_counts, zero_counts, zero_counts),
        (zero_result, zero_result, zero_result, zero_result),  # result accumulator
    )
    target_diag = lengths_a + lengths_b  # [B]
    gather_i = lengths_a[:, None]  # [B, 1]

    def step(carry, d):
        cost_d1, cost_d2, counts_d1, counts_d2, result = carry
        new_cost, new_counts = cell_update(d, cost_d1, cost_d2, counts_d1, counts_d2)
        hit = (d == target_diag)[:, None]  # [B, 1]
        result = tuple(
            jnp.where(hit, jnp.take_along_axis(new_array, gather_i, axis=1), old)
            for new_array, old in zip(new_counts, result)
        )
        return (new_cost, cost_d1, new_counts, counts_d1, result), None

    diagonals = jnp.arange(1, max_m + max_n + 1, dtype=jnp.int32)
    (final_cost, _c2, _n1, _n2, result), _ = jax.lax.scan(step, state, diagonals)
    insertions, deletions, substitutions, correct = (value[:, 0] for value in result)
    # Degenerate empty-vs-empty pairs hit diagonal 0, never scanned: all-zero is
    # already correct there.
    return insertions, deletions, substitutions, correct
