#!/usr/bin/env python3
"""bf16-vs-f32 training trajectory comparison (VERDICT r4 item 5).

Training computes in bf16 when the config AMP flag is on (the "mixed" preset,
training/estimator.py:226-233 — the analogue of the reference's
torch.cuda.amp autocast, reference estimator.py:803-806). Serving precision
was grounded with a decision study; this grounds TRAINING precision the same
way: loss and grad-norm trajectories over a few hundred steps of the
production flagship train step, identical seeds and data, in three runs:

  bf16       — production mixed-precision step (bf16 matmuls, f32 loss tail)
  f32        — full float32 step (the reference's non-AMP numerics)
  f32-seedB  — float32 with a different dropout stream: the SEED-NOISE control.

The claim to verify: |bf16 - f32| trajectory divergence is within the
seed-noise band |f32(A) - f32(B)| — i.e. bf16 training is indistinguishable
from a different random draw of the same f32 training process. Dropout masks
differ across precisions anyway (bf16 runs the in-kernel dropout plan, f32 may
route to the einsum fallback), so the seed control is the honest yardstick.

Data: a pool of 8 fixed synthetic microbatches cycled round-robin — training
dynamics (not single-batch overfit) with perfectly repeatable inputs.

Usage: python tools/ab_train_precision.py [steps=300] [batch=8] [seconds=10]
(~25 min on one v5e chip: three sequential runs plus compiles). Results are
recorded in ARCHITECTURE.md next to the serving decision table.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "allophant_tpu_xla"),
)
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

POOL = 8  # fixed microbatches cycled round-robin


def build_batches(indexer, plan_nodes, batch: int, seconds: float, seed: int):
    """POOL microbatches of synthetic audio + in-inventory labels (same
    construction as parity_check._overfit_flagship_iter)."""
    rng = np.random.default_rng(seed)
    samples = int(16_000 * seconds)
    label_length = 30
    language_pools = {
        language_id: np.fromiter(mapping.keys(), dtype=np.int64) + 1
        for language_id, mapping in indexer.language_allophones.allophones.items()
    }
    batches = []
    for _ in range(POOL):
        language_ids = rng.integers(0, 4, batch).astype(np.int32)[None]
        micro = {
            "audio": jnp.asarray(rng.standard_normal((1, batch, samples)).astype(np.float32)),
            "lengths": jnp.full((1, batch), samples, jnp.int32),
            "language_ids": jnp.asarray(language_ids),
        }
        for node in plan_nodes:
            if node.has_allophone:
                labels = np.empty((1, batch, label_length), np.int32)
                for row in range(batch):
                    pool = language_pools[int(language_ids[0, row])]
                    labels[0, row] = rng.choice(pool, size=label_length)
            else:
                labels = rng.integers(1, node.output_size, (1, batch, label_length)).astype(
                    np.int32
                )
            micro[f"labels_{node.name}"] = jnp.asarray(labels)
            micro[f"label_lengths_{node.name}"] = jnp.full((1, batch), label_length, jnp.int32)
        batches.append(micro)
    return batches


def run_variant(name: str, dtype, steps: int, batch: int, seconds: float, rng_seed: int):
    """One full training run; returns (losses, grad_norms) arrays."""
    config, indexer, built = build_flagship(dtype=dtype, remat=True)
    variables = built.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=3200)
    params = variables.pop("params")
    architecture = config.nn
    loss_plan = build_loss_plan(architecture, has_allophone=True)
    optimizer = create_optimizer(architecture, built.d_model)
    opt_state = optimizer.init(params)
    freeze_plan = build_freeze_plan(architecture.acoustic_model)
    step = jax.jit(
        make_train_step(built.model, optimizer, loss_plan, freeze_plan), donate_argnums=(0, 1)
    )
    batches = build_batches(indexer, built.model.plan.nodes, batch, seconds, seed=0)

    base_key = jax.random.key(rng_seed, impl="rbg")
    losses = np.empty(steps, np.float64)
    grad_norms = np.empty(steps, np.float64)
    start = time.perf_counter()
    for index in range(steps):
        key = jax.random.fold_in(base_key, index)
        params, opt_state, metrics = step(
            params, opt_state, variables, batches[index % POOL], key
        )
        losses[index] = float(metrics["mean_loss"])
        grad_norms[index] = float(metrics["grad_norm"])
        if index == 0:
            print(
                f"[{name}] step 1/{steps}: loss {losses[0]:.3f}"
                f" (compile+step {time.perf_counter() - start:.0f}s)",
                flush=True,
            )
    print(
        f"[{name}] {steps} steps: loss {losses[0]:.3f} -> {losses[-1]:.3f},"
        f" grad-norm {grad_norms[0]:.3f} -> {grad_norms[-1]:.3f}"
        f" ({time.perf_counter() - start:.0f}s)",
        flush=True,
    )
    del step, params, opt_state, variables, batches
    jax.clear_caches()
    return losses, grad_norms


def band(a: np.ndarray, b: np.ndarray, window: int = 20) -> tuple:
    """Max and mean absolute relative divergence of smoothed trajectories."""
    kernel = np.ones(window) / window
    sa = np.convolve(a, kernel, mode="valid")
    sb = np.convolve(b, kernel, mode="valid")
    relative = np.abs(sa - sb) / np.maximum(np.abs(sb), 1e-9)
    return float(relative.max()), float(relative.mean())


def main() -> int:
    positional = [arg for arg in sys.argv[1:] if not arg.startswith("--")]
    steps = int(positional[0]) if len(positional) > 0 else 300
    batch = int(positional[1]) if len(positional) > 1 else 8
    seconds = float(positional[2]) if len(positional) > 2 else 10.0
    dump = None
    for arg in sys.argv[1:]:
        if arg.startswith("--dump="):
            dump = arg.split("=", 1)[1]

    runs = {
        "bf16": run_variant("bf16", jnp.bfloat16, steps, batch, seconds, rng_seed=1),
        "f32": run_variant("f32", jnp.float32, steps, batch, seconds, rng_seed=1),
        "f32-seedB": run_variant("f32-seedB", jnp.float32, steps, batch, seconds, rng_seed=2),
    }
    if dump:
        import json

        with open(dump, "w", encoding="utf-8") as file:
            json.dump(
                {
                    name: {"loss": losses.tolist(), "grad_norm": norms.tolist()}
                    for name, (losses, norms) in runs.items()
                },
                file,
            )

    for metric_index, metric in enumerate(("loss", "grad-norm")):
        precision_max, precision_mean = band(
            runs["bf16"][metric_index], runs["f32"][metric_index]
        )
        seed_max, seed_mean = band(runs["f32-seedB"][metric_index], runs["f32"][metric_index])
        verdict = "WITHIN" if precision_max <= max(seed_max * 1.5, 0.02) else "EXCEEDS"
        print(
            f"{metric:>9s}: |bf16-f32| smoothed band max {100 * precision_max:.2f}%"
            f" mean {100 * precision_mean:.2f}% | seed-noise band max {100 * seed_max:.2f}%"
            f" mean {100 * seed_mean:.2f}% -> mid-run divergence {verdict} seed noise"
        )
        # Converged-state agreement: the last 50 smoothed windows. Transient
        # mid-descent excursions (bf16 rounding can tip a marginal step the
        # f32 run avoids, then recover) matter less than where training lands.
        tail_max, tail_mean = band(
            runs["bf16"][metric_index][-70:], runs["f32"][metric_index][-70:]
        )
        tail_seed_max, _ = band(
            runs["f32-seedB"][metric_index][-70:], runs["f32"][metric_index][-70:]
        )
        print(
            f"{metric:>9s}: converged tail |bf16-f32| mean {100 * tail_mean:.2f}%"
            f" max {100 * tail_max:.2f}% (seed-noise max {100 * tail_seed_max:.2f}%)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
