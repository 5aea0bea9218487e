"""CTC decoding: fully-vectorized greedy decode plus a host-side prefix beam search.

Counterpart of /root/reference/allophant/predictions.py:189-235 (flashlight-compatible
greedy decoder and torchaudio/flashlight ``ctc_decoder`` beam). Greedy decoding runs
entirely on device as a jittable batched op (argmax -> run-start detection -> stable
compaction), replacing the reference's per-utterance Python loop; the beam search is a
host-side lexicon-free CTC prefix beam with log-add merging, matching the flashlight
configuration the reference uses (lexicon-free, ``log_add=True``, sil == blank)."""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from allophant_tpu.ops import masking


class CTCHypothesis(NamedTuple):
    """flashlight-compatible hypothesis: token ids, words (unused), score, 1-based
    run-start timesteps."""

    tokens: np.ndarray
    words: List[str]
    score: float
    timesteps: np.ndarray


@jax.jit
def greedy_decode_padded(log_emissions: jnp.ndarray, lengths: jnp.ndarray, blank_index: int = 0):
    """Batched greedy CTC decode on device.

    ``log_emissions``: [B, T, C]; returns (tokens [B, T], timesteps [B, T],
    token_counts [B], scores [B]) where each row's first ``token_counts[b]`` entries
    are the collapsed non-blank tokens (rest padded with -1)."""
    best = log_emissions.max(axis=-1)
    indices = log_emissions.argmax(axis=-1)
    time = indices.shape[1]
    valid = masking.mask_sequence(lengths, time)

    previous = jnp.concatenate((jnp.full_like(indices[:, :1], -1), indices[:, :-1]), axis=1)
    run_start = (indices != previous) & valid
    keep = run_start & (indices != blank_index)

    # Stable compaction: keys put kept positions first in time order.
    positions = jnp.arange(time)[None, :]
    sort_keys = jnp.where(keep, positions, time + positions)
    order = jnp.argsort(sort_keys, axis=1)
    tokens = jnp.take_along_axis(jnp.where(keep, indices, -1), order, axis=1)
    timesteps = jnp.take_along_axis(jnp.where(keep, positions + 1, 0), order, axis=1)
    counts = keep.sum(axis=1)
    scores = jnp.where(valid, best, 0.0).sum(axis=1)
    return tokens, timesteps, counts, scores


class GreedyCTCDecoder:
    """Greedy decoder with the reference's call contract: batch-first log emissions +
    lengths -> per-utterance single-hypothesis lists."""

    def __init__(self, blank_index: int = 0):
        self._blank_index = blank_index

    def __call__(self, log_emissions, lengths) -> List[List[CTCHypothesis]]:
        log_emissions = jnp.asarray(log_emissions)
        lengths = jnp.asarray(lengths)
        tokens, timesteps, counts, scores = greedy_decode_padded(
            log_emissions, lengths, self._blank_index
        )
        tokens = np.asarray(tokens)
        timesteps = np.asarray(timesteps)
        counts = np.asarray(counts)
        scores = np.asarray(scores)
        outputs = []
        for row in range(tokens.shape[0]):
            count = int(counts[row])
            outputs.append(
                [CTCHypothesis(tokens[row, :count], [], float(scores[row]), timesteps[row, :count])]
            )
        return outputs


@dataclasses.dataclass
class _Beam:
    prefix: tuple
    log_blank: float  # log prob of prefix ending in blank
    log_non_blank: float  # log prob of prefix ending in its last token
    timesteps: tuple

    def total(self) -> float:
        return np.logaddexp(self.log_blank, self.log_non_blank)


def _log_add(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    return float(np.logaddexp(a, b))


class BeamCTCDecoder:
    """Lexicon-free CTC prefix beam search with log-add merging (host-side).

    Matches the flashlight decoder configuration used by the reference
    (predictions.py:210-226): no lexicon/LM, silence == blank, n-best output."""

    def __init__(self, tokens: List[str], beam_width: int, n_best: int = 1, blank_index: int = 0):
        self._tokens = tokens
        self._beam_width = beam_width
        self._n_best = n_best
        self._blank_index = blank_index

    def _decode_single(self, log_probs: np.ndarray) -> List[CTCHypothesis]:
        time, classes = log_probs.shape
        # prefix -> [log_blank, log_non_blank, timesteps]
        beams = {(): [0.0, -math.inf, ()]}
        for t in range(time):
            frame = log_probs[t]
            # Prune classes for speed: top candidates per frame.
            candidates = np.argsort(frame)[::-1][: max(self._beam_width, 8)]
            next_beams: dict = {}

            def merge(prefix, log_blank, log_non_blank, timesteps):
                entry = next_beams.get(prefix)
                if entry is None:
                    next_beams[prefix] = [log_blank, log_non_blank, timesteps]
                else:
                    entry[0] = _log_add(entry[0], log_blank)
                    entry[1] = _log_add(entry[1], log_non_blank)

            for prefix, (log_blank, log_non_blank, timesteps) in beams.items():
                total = _log_add(log_blank, log_non_blank)
                for token in candidates:
                    token_log = float(frame[token])
                    if token == self._blank_index:
                        merge(prefix, total + token_log, -math.inf, timesteps)
                    elif prefix and token == prefix[-1]:
                        # Repeat: extends the non-blank path without growing the
                        # prefix; growing requires an intervening blank.
                        merge(prefix, -math.inf, log_non_blank + token_log, timesteps)
                        new_prefix = prefix + (token,)
                        merge(new_prefix, -math.inf, log_blank + token_log, timesteps + (t + 1,))
                    else:
                        new_prefix = prefix + (token,)
                        merge(new_prefix, -math.inf, total + token_log, timesteps + (t + 1,))

            # Keep the best `beam_width` prefixes.
            scored = sorted(
                next_beams.items(), key=lambda item: _log_add(item[1][0], item[1][1]), reverse=True
            )[: self._beam_width]
            beams = dict(scored)

        hypotheses = []
        for prefix, (log_blank, log_non_blank, timesteps) in sorted(
            beams.items(), key=lambda item: _log_add(item[1][0], item[1][1]), reverse=True
        )[: self._n_best]:
            hypotheses.append(
                CTCHypothesis(
                    np.asarray(prefix, dtype=np.int64),
                    [],
                    _log_add(log_blank, log_non_blank),
                    np.asarray(timesteps, dtype=np.int64),
                )
            )
        return hypotheses

    def __call__(self, log_emissions, lengths=None) -> List[List[CTCHypothesis]]:
        log_emissions = np.asarray(log_emissions)
        batch = log_emissions.shape[0]
        outputs = []
        for row in range(batch):
            length = int(lengths[row]) if lengths is not None else log_emissions.shape[1]
            outputs.append(self._decode_single(log_emissions[row, :length]))
        return outputs
