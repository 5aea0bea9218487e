#!/usr/bin/env python3
"""Same-process A/B timing of train-step variants (tunnel-noise-proof).

Separate bench processes vary by ~±20 ms on the tunneled TPU backend (observed
239 vs 254 vs 259 ms for identical code), which swamps 10-20 ms optimizations.
This harness compiles every variant once in one process and times them in
interleaved rounds, reporting per-variant medians — differences then reflect the
program, not the session.

Variants: remat residual sets (BASE vs EXTENDED, models/wav2vec2.py) and the
fused-CTC scan unroll factor (ops/ctc.py). Add more as needed.

Usage: python tools/ab_train_step.py [accumulation] [batch] [seconds] [rounds]
"""

import os
import statistics
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
from allophant_tpu.models.wav2vec2 import (
    REMAT_SAVE_NAMES_BASE,
    REMAT_SAVE_NAMES_EXTENDED,
)
from allophant_tpu.training.train_step import (
    build_freeze_plan,
    build_loss_plan,
    create_optimizer,
    make_train_step,
)


def build_step(remat_save_names):
    config, indexer, built = build_flagship(
        dtype=jnp.bfloat16, remat=True, remat_save_names=remat_save_names
    )
    variables = built.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=3200)
    params = variables.pop("params")
    architecture = config.nn
    loss_plan = build_loss_plan(architecture, has_allophone=True)
    optimizer = create_optimizer(architecture, built.d_model)
    opt_state = optimizer.init(params)
    freeze_plan = build_freeze_plan(architecture.acoustic_model)
    step = jax.jit(make_train_step(built.model, optimizer, loss_plan, freeze_plan))
    return step, params, opt_state, variables, loss_plan


def main() -> None:
    accumulation = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 7

    samples = int(16_000 * seconds)
    rng = np.random.default_rng(0)

    variants = {}
    for name, save_names in [
        ("remat-base", REMAT_SAVE_NAMES_BASE),
        ("remat-extended", REMAT_SAVE_NAMES_EXTENDED),
    ]:
        step, params, opt_state, variables, loss_plan = build_step(save_names)
        microbatches = {
            "audio": jnp.asarray(
                rng.standard_normal((accumulation, batch, samples)).astype(np.float32)
            ),
            "lengths": jnp.full((accumulation, batch), samples, jnp.int32),
            "language_ids": jnp.zeros((accumulation, batch), jnp.int32),
        }
        for head in loss_plan.ctc_heads:
            microbatches[f"labels_{head}"] = jnp.asarray(
                rng.integers(1, 4, (accumulation, batch, 30)).astype(np.int32)
            )
            microbatches[f"label_lengths_{head}"] = jnp.full((accumulation, batch), 30, jnp.int32)
        key = jax.random.key(1, impl="rbg")

        def run(step=step, params=params, opt_state=opt_state, variables=variables, micro=microbatches, key=key):
            start = time.perf_counter()
            _p, _o, metrics = step(params, opt_state, variables, micro, key)
            float(metrics["mean_loss"])  # fences execution through the tunnel
            return time.perf_counter() - start

        compile_time = run()
        print(f"[{name}] first step (incl. compile): {compile_time:.1f}s", flush=True)
        variants[name] = run

    times = {name: [] for name in variants}
    for _ in range(rounds):
        for name, run in variants.items():
            times[name].append(run())

    audio_seconds = accumulation * batch * seconds
    for name, samples_list in times.items():
        median = statistics.median(samples_list)
        best = min(samples_list)
        print(
            f"[{name}] median {median * 1e3:.0f} ms (best {best * 1e3:.0f},"
            f" {audio_seconds / median:.0f}x real-time) over {rounds} interleaved rounds",
            flush=True,
        )


if __name__ == "__main__":
    main()
