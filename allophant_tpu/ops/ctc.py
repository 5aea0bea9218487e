"""Loss functions: CTC and mean-pooled sequence cross entropy.

Counterpart of /root/reference/allophant/loss_functions.py. The reference uses
``nn.CTCLoss(reduction="sum", zero_infinity=True)`` over log-softmaxed logits with
blank index 0; here CTC is optax's lax.scan-based implementation with the
``zero_infinity`` semantics reproduced (utterances whose label sequence cannot be
aligned — longer than the output — contribute zero loss, reference
loss_functions.py:19-27)."""

from __future__ import annotations

import jax.numpy as jnp
import optax

from allophant_tpu.ops import masking


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
    import jax

    mask = masking.mask_sequence(logit_lengths, logits.shape[1]).astype(logits.dtype)
    pooled = (logits * mask[:, :, None]).sum(axis=1) / logit_lengths[:, None].astype(logits.dtype)
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
