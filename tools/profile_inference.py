#!/usr/bin/env python3
"""Per-op device profile of the batched inference path bench.py measures.

Runs the flagship transcription step (XLS-R encoder + all heads + greedy
phoneme decode) a few times under ``jax.profiler.trace`` and prints the top
device ops by total time, attributing the serving throughput number to
kernels/fusions (same trace parsing as tools/bench_train_step.py --profile).

Usage: python tools/profile_inference.py [batch] [seconds]
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
from allophant_tpu.ops.decode import greedy_decode_logits
from allophant_tpu.training.profiling import report_device_ops


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    samples = int(16_000 * seconds)

    config, indexer, built = build_flagship(dtype=jnp.bfloat16)
    variables = built.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=3200)
    model = built.model

    @jax.jit
    def transcribe(variables, audio, lengths, language_ids):
        predictions = model.apply(variables, audio, lengths, language_ids, predict=True)
        tokens, _timesteps, counts, _scores = greedy_decode_logits(
            predictions.outputs["phoneme"], predictions.lengths
        )
        return tokens, counts

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32))
    lengths = jnp.full((batch,), samples, dtype=jnp.int32)
    language_ids = jnp.zeros((batch,), dtype=jnp.int32)

    def run():
        start = time.perf_counter()
        tokens, _counts = transcribe(variables, audio, lengths, language_ids)
        np.asarray(tokens)
        return time.perf_counter() - start

    first = run()
    print(f"first run (incl. compile): {first:.1f}s", flush=True)
    best = min(run() for _ in range(4))
    print(f"per-batch: {best * 1e3:.0f} ms ({batch * seconds / best:.0f} audio-sec/s)", flush=True)

    trace_dir = "/tmp/allophant_infer_trace"
    profile_steps = 3
    with jax.profiler.trace(trace_dir):
        for _ in range(profile_steps):
            run()
    report_device_ops(trace_dir, profile_steps)


if __name__ == "__main__":
    main()
