#!/usr/bin/env python3
"""Benchmarks one flagship training step on the current backend.

Measures the jit-compiled SPMD step (all heads, CTC objective, Adam,
gradient accumulation as a lax.scan, per-layer rematerialization) at the
configuration of ARCHITECTURE.md's measured-throughput table. First compile
of the full training step takes minutes cold; the persistent compilation
cache makes reruns near-instant.

Usage: python tools/bench_train_step.py [accumulation] [batch] [seconds]
       python tools/bench_train_step.py [...] --profile
With --profile, wraps timed steps in a ``jax.profiler.trace`` window and
prints the top device ops by total time (parsed from the trace protobuf's
trace-events JSON), attributing the step to kernels/fusions.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "allophant_tpu_xla"))

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from allophant_tpu.demo import build_flagship
from allophant_tpu.training.train_step import (
    build_freeze_plan,
    build_loss_plan,
    create_optimizer,
    make_train_step,
)


from allophant_tpu.training.profiling import report_device_ops


def _patch_sum_loss() -> None:
    """Replaces the fused CTC-heads loss inside the train step with a masked sum of
    squared logits: identical model forward/backward and head count, zero CTC
    forward scans. The full-step minus sum-loss delta is the cost of the CTC
    recurrences (forward + their backward scans)."""
    import allophant_tpu.training.train_step as train_step_module

    def sum_loss_heads(heads, logit_lengths, blank_id=0, row_weights=None):
        from allophant_tpu.ops import masking

        losses = {}
        for name, logits, _labels, _label_lengths in heads:
            mask = masking.mask_sequence(logit_lengths, logits.shape[1])
            scaled = (logits.astype(jnp.float32) * 1e-3) ** 2
            per_row = (scaled * mask[:, :, None]).sum(axis=(1, 2))
            if row_weights is not None:
                per_row = per_row * row_weights
            losses[name] = per_row.sum()
        return losses

    train_step_module.ctc_loss_sum_heads = sum_loss_heads


def main() -> None:
    """Extra decomposition flags (each isolates one suspect of the step time):
    --sum-loss    replace every CTC head loss with a masked sum of squared logits
                  (same model forward/backward, no CTC forward scans)
    --heads N     keep only the first N CTC heads in the loss (scaling with the
                  number of fused CTC rows)
    --no-opt      skip optimizer.update/apply_updates (gradients only)
    """
    profile = "--profile" in sys.argv
    sum_loss = "--sum-loss" in sys.argv
    no_opt = "--no-opt" in sys.argv
    head_limit = None
    if "--heads" in sys.argv:
        head_limit = int(sys.argv[sys.argv.index("--heads") + 1])
    positional = []
    skip_next = False
    for value in sys.argv[1:]:
        if skip_next:
            skip_next = False
            continue
        if value == "--heads":
            skip_next = True
        elif not value.startswith("--"):
            positional.append(value)
    accumulation = int(positional[0]) if len(positional) > 0 else 2
    batch = int(positional[1]) if len(positional) > 1 else 8
    seconds = float(positional[2]) if len(positional) > 2 else 10.0

    config, indexer, built = build_flagship(dtype=jnp.bfloat16, remat=True)
    variables = built.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=3200)
    params = variables.pop("params")
    architecture = config.nn
    loss_plan = build_loss_plan(architecture, has_allophone=True)
    if head_limit is not None:
        import dataclasses

        loss_plan = dataclasses.replace(loss_plan, ctc_heads=loss_plan.ctc_heads[:head_limit])
    if sum_loss:
        _patch_sum_loss()
    if no_opt:
        import optax

        # Measures the step without Adam moments / clipping / schedule: the update
        # is all-zero (still two tree passes, a lower bound on any optimizer).
        optimizer = optax.set_to_zero()
    else:
        optimizer = create_optimizer(architecture, built.d_model)
    opt_state = optimizer.init(params)
    freeze_plan = build_freeze_plan(architecture.acoustic_model)
    # No donation so `run()` can reuse the same params across timing iterations
    # (the production loop donates; peak HBM here is correspondingly higher).
    step = jax.jit(make_train_step(built.model, optimizer, loss_plan, freeze_plan))

    samples = int(16_000 * seconds)
    rng = np.random.default_rng(0)
    microbatches = {
        "audio": jnp.asarray(rng.standard_normal((accumulation, batch, samples)).astype(np.float32)),
        "lengths": jnp.full((accumulation, batch), samples, jnp.int32),
        "language_ids": jnp.zeros((accumulation, batch), jnp.int32),
    }
    for name in loss_plan.ctc_heads:
        microbatches[f"labels_{name}"] = jnp.asarray(
            rng.integers(1, 4, (accumulation, batch, 30)).astype(np.int32)
        )
        microbatches[f"label_lengths_{name}"] = jnp.full((accumulation, batch), 30, jnp.int32)

    key = jax.random.key(1, impl="rbg")  # same typed rbg dropout key as training/run.py

    def run():
        start = time.perf_counter()
        _params, _opt, metrics = step(params, opt_state, variables, microbatches, key)
        float(metrics["mean_loss"])  # fences execution
        return time.perf_counter() - start

    first = run()
    print(f"first step (incl. compile): {first:.1f}s", flush=True)
    best = min(run() for _ in range(5))
    audio_seconds = accumulation * batch * seconds
    print(f"train step: {best * 1e3:.0f} ms ({audio_seconds / best:.0f}x real-time)", flush=True)
    if profile:
        trace_dir = "/tmp/allophant_train_trace"
        profile_steps = 3
        with jax.profiler.trace(trace_dir):
            for _ in range(profile_steps):
                run()
        report_device_ops(trace_dir, profile_steps)


if __name__ == "__main__":
    main()
