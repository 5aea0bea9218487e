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
) -> jnp.ndarray:
    """Summed CTC loss over a batch.

    ``logits``: [B, T, K] raw logits (softmax applied internally); ``labels``: [B, N]
    padded label ids (blank offset already applied, 0 reserved for blank)."""
    logit_paddings = (~masking.mask_sequence(logit_lengths, logits.shape[1])).astype(jnp.float32)
    label_paddings = (~masking.mask_sequence(label_lengths, labels.shape[1])).astype(jnp.float32)
    per_sequence = optax.ctc_loss(
        logits.astype(jnp.float32), logit_paddings, labels, label_paddings, blank_id=blank_id
    )
    # zero_infinity: labels longer than the output sequence (or labels over classes
    # the model masked to ~zero probability) yield no valid alignment; zero them out
    # (matches torch's zero_infinity=True, where such losses come out inf).
    invalid = (
        (label_lengths > logit_lengths) | ~jnp.isfinite(per_sequence) | (per_sequence > 1e7)
    )
    per_sequence = jnp.where(invalid, 0.0, per_sequence)
    return per_sequence.sum()


def sequence_cross_entropy_sum(
    logits: jnp.ndarray,
    logit_lengths: jnp.ndarray,
    labels: jnp.ndarray,
    label_lengths=None,
    label_smoothing: float = 0.0,
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
    return -(one_hot * log_probs).sum()
