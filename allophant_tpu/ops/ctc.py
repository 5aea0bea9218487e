"""Loss functions: CTC and mean-pooled sequence cross entropy.

Counterpart of /root/reference/allophant/loss_functions.py. The reference uses
``nn.CTCLoss(reduction="sum", zero_infinity=True)`` over log-softmaxed logits with
blank index 0; here CTC is optax's lax.scan-based implementation with the
``zero_infinity`` semantics reproduced (utterances whose label sequence cannot be
aligned — longer than the output — contribute zero loss, reference
loss_functions.py:19-27)."""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from allophant_tpu.ops import masking

# Log-domain "zero probability". Large finite negative (not -inf) so logsumexp
# gradients stay finite; repeated additive propagation over T frames cannot
# overflow f32 (~1e30 + 500 * 30 << 3.4e38).
_LOG_ZERO = -1e30

# Unroll factor of the fused CTC forward scan (see _ctc_forward_fused).
# Measured (tools/ab_train_step.py unroll, same-process interleaved rounds):
# unroll=4 is 11 ms/step WORSE than 1 at the flagship config (254 vs 243 ms
# median) — the wider loop body scheduled worse than the loop overhead it saved.
FORWARD_SCAN_UNROLL = 1

# Degenerate-input semantics of the two CTC implementations (identical on every
# input whose labels have nonzero probability, i.e. all real batches — asserted
# by the multichip dryrun's fused-vs-unfused gate):
# - labels forced through a hard-masked class (the allophone layer's -1e9 fill;
#   -FLT_MAX in the reference, acoustic_model.py:75-87): the fused forward
#   computes the true NLL (~1e9 per masked emission), matching torch;
#   optax.ctc_loss's internal log_epsilon=-1e5 floor leaks probability mass
#   through its "impossible" states and caps such rows near 1e5. Real training
#   labels are in-inventory by construction (never masked), so the paths only
#   differ on inputs the reference cannot produce either.


def ctc_loss_sum(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths: jnp.ndarray,
    blank_id: int = 0,
    row_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Summed CTC loss over a batch.

    ``logits``: [B, T, K] raw logits (softmax applied internally); ``labels``: [B, N]
    padded label ids (blank offset already applied, 0 reserved for blank).
    ``row_weights`` ([B], 0/1) excludes batch-padding filler rows from the sum."""
    logit_paddings = (~masking.mask_sequence(logit_lengths, logits.shape[1])).astype(jnp.float32)
    label_paddings = (~masking.mask_sequence(label_lengths, labels.shape[1])).astype(jnp.float32)
    per_sequence = optax.ctc_loss(
        logits.astype(jnp.float32), logit_paddings, labels, label_paddings, blank_id=blank_id
    )
    # zero_infinity semantics (torch zeroes exactly the inf losses): a sequence has
    # no valid alignment iff it needs more frames than the output provides — one per
    # label plus a mandatory blank between equal consecutive labels. optax returns
    # large finite garbage instead of inf there, so infeasibility is computed
    # exactly; non-finite losses (classes masked to zero probability) are also
    # zeroed, matching torch where those come out inf.
    label_valid = masking.mask_sequence(label_lengths, labels.shape[1])
    repeats = ((labels[:, 1:] == labels[:, :-1]) & label_valid[:, 1:]).sum(axis=-1)
    infeasible = label_lengths + repeats > logit_lengths
    per_sequence = jnp.where(infeasible | ~jnp.isfinite(per_sequence), 0.0, per_sequence)
    if row_weights is not None:
        per_sequence = per_sequence * row_weights
    return per_sequence.sum()


def _ctc_forward_fused(
    emit_lp: jnp.ndarray,
    blank_lp: jnp.ndarray,
    allow_skip: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    label_lengths: jnp.ndarray,
) -> jnp.ndarray:
    """CTC forward algorithm over pre-gathered label log-probs for R fused rows.

    ``emit_lp``: [R, T, N] log-probs of each (padded) label at each frame;
    ``blank_lp``: [R, T] blank log-probs; ``allow_skip``: [R, N] whether the
    skip transition into label position i is legal (l_i != l_{i-1});
    lengths: [R]. Returns [R] negative log-likelihoods.

    States are the blank-interleaved sequence [b, l_1, b, ..., l_N, b]
    (S = 2N + 1): even states are blanks, odd state 2i+1 emits l_{i+1}. One
    ``lax.scan`` over T advances ALL rows — callers fuse every classifier
    head's batch into R = H*B rows, replacing H sequential scans (the
    dominant non-matmul latency of the multi-task training step) with one.
    """
    rows, time, num_labels = emit_lp.shape
    states = 2 * num_labels + 1

    # [R, T, S] interleaved state log-probs: even <- blank, odd <- labels.
    state_lp = jnp.full((rows, time, states), _LOG_ZERO, jnp.float32)
    state_lp = state_lp.at[:, :, 0::2].set(blank_lp[:, :, None])
    state_lp = state_lp.at[:, :, 1::2].set(emit_lp)

    # Skip transition (s-2 -> s) legality per state: only odd (emitting) states
    # with a distinct previous label. [R, S] additive mask in log domain.
    skip_mask = jnp.full((rows, states), _LOG_ZERO, jnp.float32)
    skip_mask = skip_mask.at[:, 1::2].set(jnp.where(allow_skip, 0.0, _LOG_ZERO))

    # Pre-frame prior: all mass on the leading blank state. Consuming frame 0
    # through the ordinary step reproduces the textbook initialization
    # (alpha_0(0) = lp(blank), alpha_0(1) = lp(l_1)) while letting a padded
    # frame 0 be an identity step like any other.
    position = jnp.arange(states)[None, :]
    initial = jnp.where(position == 0, 0.0, jnp.full((rows, states), _LOG_ZERO, jnp.float32))

    def logaddexp3(a, b, c):
        peak = jnp.maximum(jnp.maximum(a, b), c)
        return peak + jnp.log(
            jnp.exp(a - peak) + jnp.exp(b - peak) + jnp.exp(c - peak)
        )

    frame_valid = masking.mask_sequence(logit_lengths, time)  # [R, T]

    def step(alpha, inputs):
        lp_t, valid_t = inputs
        stay = alpha
        advance = jnp.concatenate(
            (jnp.full((rows, 1), _LOG_ZERO, jnp.float32), alpha[:, :-1]), axis=1
        )
        skip = (
            jnp.concatenate(
                (jnp.full((rows, 2), _LOG_ZERO, jnp.float32), alpha[:, :-2]), axis=1
            )
            + skip_mask
        )
        updated = logaddexp3(stay, advance, skip) + lp_t
        # Padded frames are identity steps, matching optax's logit_paddings.
        return jnp.where(valid_t[:, None], updated, alpha), None

    # Module-level unroll so tools/ab_train_step.py can A/B factors in one
    # process (see FORWARD_SCAN_UNROLL: unrolling measured slower here).
    final, _ = jax.lax.scan(
        step,
        initial,
        (jnp.swapaxes(state_lp, 0, 1), jnp.swapaxes(frame_valid, 0, 1)),
        unroll=FORWARD_SCAN_UNROLL,
    )

    row_index = jnp.arange(rows)
    last_blank = final[row_index, 2 * label_lengths]
    last_label = jnp.where(
        label_lengths > 0,
        final[row_index, jnp.maximum(2 * label_lengths - 1, 0)],
        _LOG_ZERO,
    )
    peak = jnp.maximum(last_blank, last_label)
    return -(peak + jnp.log(jnp.exp(last_blank - peak) + jnp.exp(last_label - peak)))


def ctc_loss_sum_heads(
    heads: Sequence[Tuple[str, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    logit_lengths: jnp.ndarray,
    blank_id: int = 0,
    row_weights: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """Summed CTC losses for several classifier heads over one batch, computed
    with a single fused forward scan.

    ``heads``: sequence of (name, logits [B, T, C_head], labels [B, N_head],
    label_lengths [B]); ``logit_lengths``: [B] shared frame lengths (all heads
    decode the same encoder output). Returns {name: summed loss}, each equal to
    ``ctc_loss_sum`` for that head (same zero_infinity semantics and
    ``row_weights`` handling, reference loss_functions.py:19-27).

    The per-head work that parallelizes trivially (log_softmax over classes,
    gathering each label's log-prob) happens vectorized per head; the
    inherently sequential forward recurrence runs once over H*B fused rows
    instead of H separate T-step scans.
    """
    if not heads:
        return {}
    max_labels = max(labels.shape[1] for _name, _logits, labels, _ll in heads)
    time = heads[0][1].shape[1]
    if any(logits.shape[1] != time for _name, logits, _labels, _ll in heads):
        raise ValueError("All fused CTC heads must share the same frame count")

    emit_rows = []
    blank_rows = []
    allow_rows = []
    label_length_rows = []
    for _name, logits, labels, label_lengths in heads:
        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        emit = jnp.take_along_axis(log_probs, labels[:, None, :], axis=-1)  # [B, T, N]
        if labels.shape[1] < max_labels:
            emit = jnp.pad(
                emit, ((0, 0), (0, 0), (0, max_labels - labels.shape[1])),
                constant_values=_LOG_ZERO,
            )
            labels = jnp.pad(labels, ((0, 0), (0, max_labels - labels.shape[1])))
        previous = jnp.concatenate(
            (jnp.full_like(labels[:, :1], -1), labels[:, :-1]), axis=1
        )
        emit_rows.append(emit)
        blank_rows.append(log_probs[:, :, blank_id])
        allow_rows.append(labels != previous)
        label_length_rows.append(label_lengths)

    batch = heads[0][1].shape[0]
    negative_ll = _ctc_forward_fused(
        jnp.concatenate(emit_rows, axis=0),
        jnp.concatenate(blank_rows, axis=0),
        jnp.concatenate(allow_rows, axis=0),
        jnp.tile(logit_lengths, len(heads)),
        jnp.concatenate(label_length_rows, axis=0),
    )

    losses: Dict[str, jnp.ndarray] = {}
    for index, (name, _logits, labels, label_lengths) in enumerate(heads):
        per_sequence = negative_ll[index * batch : (index + 1) * batch]
        label_valid = masking.mask_sequence(label_lengths, labels.shape[1])
        repeats = ((labels[:, 1:] == labels[:, :-1]) & label_valid[:, 1:]).sum(axis=-1)
        infeasible = label_lengths + repeats > logit_lengths
        # Same zeroing rule as ``ctc_loss_sum``: the exact infeasibility mask plus
        # a non-finite guard. _LOG_ZERO (1e30-scale) propagation reaches a row's
        # final states only when no valid alignment exists — exactly the rows the
        # mask zeroes — while any feasible row's NLL is bounded by
        # T * max(-log_prob), which even with -1e9 allophone-masked emissions
        # stays ~1e13, 17 orders of magnitude below the _LOG_ZERO scale. No
        # magnitude cutoff is needed to separate the two.
        per_sequence = jnp.where(infeasible | ~jnp.isfinite(per_sequence), 0.0, per_sequence)
        if row_weights is not None:
            per_sequence = per_sequence * row_weights
        losses[name] = per_sequence.sum()
    return losses


def sequence_cross_entropy_sum(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths=None,
    label_smoothing: float = 0.0,
    row_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Summed cross entropy over mean-pooled (masked) frame logits; one label per
    utterance (reference loss_functions.py:30-44 feeds pooled logits)."""
    mask = masking.mask_sequence(logit_lengths, logits.shape[1]).astype(logits.dtype)
    # Clamped denominator: batch-padding filler rows can downsample to zero
    # frames, and 0/0 = NaN would survive the zero row weight below (NaN * 0).
    pooled = (logits * mask[:, :, None]).sum(axis=1) / jnp.maximum(
        logit_lengths[:, None], 1
    ).astype(logits.dtype)
    num_classes = pooled.shape[-1]
    log_probs = jax.nn.log_softmax(pooled.astype(jnp.float32), axis=-1)
    targets = jnp.squeeze(labels, axis=-1) if labels.ndim > 1 else labels
    one_hot = jax.nn.one_hot(targets, num_classes)
    if label_smoothing > 0:
        one_hot = one_hot * (1.0 - label_smoothing) + label_smoothing / num_classes
    per_row = -(one_hot * log_probs).sum(axis=-1)
    if row_weights is not None:
        per_row = per_row * row_weights
    return per_row.sum()
