"""Distributed training step: multi-task CTC objective, grad accumulation, optimizer.

Counterpart of the reference's training inner loop (estimator.py:687-798), recast as a
single jit-compiled SPMD program:

- Objective: sum of per-classifier CTC losses over the batch divided by the total
  label count, plus ``allophone_l2_alpha * l2_penalty`` (the reference runs a separate
  backward for the penalty; a single objective yields identical gradients).
- Gradient accumulation is a ``lax.scan`` over microbatches inside jit (the reference
  drains a Python list of batches), so accumulation costs no host round trips.
- Gradient clipping by global norm, then optax (Adam + Noam-plateau schedule).
- Data parallelism: the step runs under a (data, model) mesh with batch arrays sharded
  on the data axis and replicated parameters; XLA inserts the gradient psums."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from allophant_tpu.config import (
    Architecture,
    CTCLossConfig,
    SequenceCrossEntropyLossConfig,
)
from allophant_tpu.models.allophant import AllophantModel
from allophant_tpu.models.projection import BUFFERS
from allophant_tpu.ops.ctc import ctc_loss_sum_heads, sequence_cross_entropy_sum


def create_optimizer(architecture: Architecture, d_model: int) -> optax.GradientTransformation:
    """Builds the optax chain from the architecture config: optional global-norm
    clipping, then the configured optimizer with the warmup schedule (reference
    config.py:107-343, estimator.py:981-985)."""
    if architecture.lr_schedule is not None:
        learning_rate: Any = architecture.lr_schedule.schedule(d_model)
    else:
        learning_rate = architecture.optimizer.learning_rate

    transforms = []
    if architecture.clip_norm is not None:
        transforms.append(optax.clip_by_global_norm(architecture.clip_norm))
    transforms.append(architecture.optimizer.make(learning_rate))
    return optax.chain(*transforms)


@dataclasses.dataclass(frozen=True)
class LossPlan:
    """Static per-classifier loss selection derived from the projection config."""

    ctc_heads: Tuple[str, ...]
    cross_entropy_heads: Tuple[Tuple[str, float], ...]  # (name, label_smoothing)
    allophone_l2_alpha: float
    has_allophone_penalty: bool


def build_loss_plan(architecture: Architecture, has_allophone: bool) -> LossPlan:
    ctc_heads = []
    cross_entropy_heads = []
    for entry in architecture.projection.classes:
        if isinstance(entry.loss, SequenceCrossEntropyLossConfig):
            cross_entropy_heads.append((entry.name, entry.loss.label_smoothing))
        else:
            ctc_heads.append(entry.name)
    return LossPlan(
        tuple(ctc_heads),
        tuple(cross_entropy_heads),
        architecture.projection.allophone_l2_alpha,
        has_allophone,
    )


def multitask_loss(
    model: AllophantModel,
    variables: Dict,
    params: Dict,
    batch: Dict[str, jnp.ndarray],
    loss_plan: LossPlan,
    dropout_rng=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Computes the training objective on one microbatch.

    ``batch`` keys: audio [B, T], lengths [B], language_ids [B], and per-head
    ``labels_<name>`` [B, N] / ``label_lengths_<name>`` [B]. With no ``dropout_rng``
    the forward pass is deterministic (validation, reference estimator.py:589-674)."""
    merged = {**variables, "params": params}
    predictions = model.apply(
        merged,
        batch["audio"],
        batch["lengths"],
        batch["language_ids"],
        deterministic=dropout_rng is None,
        rngs=None if dropout_rng is None else {"dropout": dropout_rng},
    )
    outputs = predictions.outputs

    # 0/1 weights excluding batch-padding filler rows from every loss.
    row_weights = batch.get("row_weights")

    total_loss = jnp.zeros((), jnp.float32)
    total_length = jnp.zeros((), jnp.float32)
    # All CTC heads share one fused forward scan (H*B rows) instead of H
    # sequential T-step scans — the recurrence is the step's dominant
    # non-matmul latency at 37 heads.
    head_losses: Dict[str, jnp.ndarray] = dict(
        ctc_loss_sum_heads(
            [
                (name, outputs[name], batch[f"labels_{name}"], batch[f"label_lengths_{name}"])
                for name in loss_plan.ctc_heads
            ],
            predictions.lengths,
            row_weights=row_weights,
        )
    )
    for name in loss_plan.ctc_heads:
        total_loss += head_losses[name]
        total_length += batch[f"label_lengths_{name}"].sum()
    for name, smoothing in loss_plan.cross_entropy_heads:
        labels = batch[f"labels_{name}"]
        loss = sequence_cross_entropy_sum(
            outputs[name],
            predictions.lengths,
            labels,
            label_smoothing=smoothing,
            row_weights=row_weights,
        )
        head_losses[name] = loss
        total_loss += loss
        total_length += labels.shape[0] if row_weights is None else row_weights.sum()

    objective = total_loss / jnp.maximum(total_length, 1.0)

    if loss_plan.has_allophone_penalty:
        penalty = model.apply(merged, method="l2_penalty")
        objective = objective + loss_plan.allophone_l2_alpha * penalty

    metrics = {"loss": total_loss, "label_count": total_length, **head_losses}
    return objective, metrics


@dataclasses.dataclass(frozen=True)
class FreezePlan:
    """Static gradient-masking plan for parameter groups of the acoustic model.

    Each entry maps a parameter subtree prefix (under ``params``) to an unfreeze
    step: ``None`` keeps the group frozen for the whole run; an integer unfreezes it
    once the global update step reaches that value (reference ``UnfreezeSchedule``,
    acoustic_model.py:856-905). Groups not listed are always trainable."""

    groups: Tuple[Tuple[Tuple[str, ...], Optional[int]], ...] = ()

    def __bool__(self) -> bool:
        return bool(self.groups)


def build_freeze_plan(acoustic_config) -> FreezePlan:
    """Derives the freeze plan from a ``Wav2Vec2PretrainedConfig`` (freeze flags +
    optional unfreeze schedule); other acoustic models train all parameters.

    Reference semantics (pinned by tests/test_reference_model_differential.py):
    the unfreeze schedule only *thaws* groups the freeze flags froze
    (UnfreezeSchedule calls ``_freeze_module(trainable=True)`` after N steps,
    acoustic_model.py:879-897) — a schedule entry without the matching freeze
    flag never freezes anything, so it contributes nothing to the plan."""
    from allophant_tpu.config import Wav2Vec2PretrainedConfig

    if not isinstance(acoustic_config, Wav2Vec2PretrainedConfig):
        return FreezePlan()
    groups = []
    for subtree, frozen, schedule_steps in acoustic_config.freeze_groups():
        if frozen:
            groups.append((("acoustic_model", subtree), schedule_steps))
    return FreezePlan(tuple(groups))


def apply_freeze_plan(grads, plan: FreezePlan, step):
    """Zeroes gradients of frozen groups; step-scheduled groups use a dynamic
    ``step >= threshold`` factor so unfreezing does not retrigger compilation."""
    if not plan:
        return grads
    factors = {
        prefix: (
            jnp.zeros((), jnp.float32)
            if threshold is None
            else (step >= threshold).astype(jnp.float32)
        )
        for prefix, threshold in plan.groups
    }

    def scale(path, leaf):
        names = tuple(getattr(entry, "key", getattr(entry, "name", entry)) for entry in path)
        for prefix, factor in factors.items():
            if names[: len(prefix)] == prefix:
                return leaf * factor
        return leaf

    return jax.tree_util.tree_map_with_path(scale, grads)


def make_eval_step(model: AllophantModel, loss_plan: LossPlan) -> Callable:
    """Returns a jittable deterministic validation step: (params, buffers, batch) ->
    {loss_sum, label_count, per-head loss sums} (reference estimator.py:589-674)."""

    def eval_step(params, other_variables, batch):
        _objective, metrics = multitask_loss(model, other_variables, params, batch, loss_plan)
        return metrics

    return eval_step


def make_train_step(
    model: AllophantModel,
    optimizer: optax.GradientTransformation,
    loss_plan: LossPlan,
    freeze_plan: FreezePlan = FreezePlan(),
) -> Callable:
    """Returns a jittable train step over (params, opt_state, buffers, microbatches).

    ``microbatches`` is a pytree of arrays with a leading accumulation axis [A, ...];
    gradients are accumulated with ``lax.scan`` and applied once. ``global_step``
    drives the unfreeze schedule (ignored without one)."""

    def train_step(params, opt_state, other_variables, microbatches, step_rng, global_step=0):
        grad_fn = jax.value_and_grad(
            lambda p, micro, rng: multitask_loss(model, other_variables, p, micro, loss_plan, rng),
            has_aux=True,
        )

        head_names = list(loss_plan.ctc_heads) + [name for name, _ in loss_plan.cross_entropy_heads]
        metric_names = ["loss", "label_count", *head_names]

        def accumulate(carry, microbatch_and_rng):
            grads_acc, metrics_acc = carry
            microbatch, rng = microbatch_and_rng
            (objective, metrics), grads = grad_fn(params, microbatch, rng)
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            metrics_acc = {
                name: metrics_acc[name] + metrics[name].astype(jnp.float32)
                for name in metric_names
            }
            return (grads_acc, metrics_acc), objective

        accumulation = jax.tree_util.tree_map(lambda x: x.shape[0], microbatches)
        num_micro = jax.tree_util.tree_leaves(accumulation)[0]
        rngs = jax.random.split(step_rng, num_micro)
        zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        zero_metrics = {name: jnp.zeros((), jnp.float32) for name in metric_names}
        (grads, summed), objectives = jax.lax.scan(
            accumulate,
            (zero_grads, zero_metrics),
            (microbatches, rngs),
        )
        # Average accumulated gradients over microbatches (each microbatch objective is
        # already label-count normalized, matching the reference's per-minibatch mean
        # backward then single optimizer step).
        grads = jax.tree_util.tree_map(lambda g: g / num_micro, grads)
        grads = apply_freeze_plan(grads, freeze_plan, global_step)

        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        loss_sum = summed["loss"]
        length_sum = summed["label_count"]
        metrics = {
            "loss_sum": loss_sum,
            "label_count": length_sum,
            "mean_loss": loss_sum / jnp.maximum(length_sum, 1.0),
            "grad_norm": optax.global_norm(grads),
            # Per-head loss sums feed the reference-style per-classifier
            # training statistics (EpochStatistics.classifier_losses).
            **{name: summed[name] for name in head_names},
        }
        return new_params, new_opt_state, metrics

    return train_step
