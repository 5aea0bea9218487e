#!/usr/bin/env python3
"""Serving-throughput comparison across precision presets on one chip.

Measures the single-head transcription loop (encoder + all heads + greedy
decode of the phoneme track, bench.py's pipelined methodology) for each
serving preset, printing audio-s/s per preset. Used to pick the shipped
default (VERDICT r4 item 1)."""

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
from allophant_tpu.ops.decode import greedy_decode_logits

PRESETS = {
    "float32": dict(dtype=jnp.float32),
    "float32_high": dict(dtype=jnp.float32, f32_matmul_precision="high"),
    "mixed": dict(dtype=jnp.bfloat16, head_dtype=jnp.float32),
    "bfloat16": dict(dtype=jnp.bfloat16),
}


def main() -> None:
    which = [name for name in sys.argv[1:] if name in PRESETS] or list(PRESETS)
    numeric = [arg for arg in sys.argv[1:] if arg not in PRESETS]
    batch = int(numeric[0]) if numeric else 128
    seconds = float(numeric[1]) if len(numeric) > 1 else 10.0
    samples = int(16_000 * seconds)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32))
    lengths = jnp.full((batch,), samples, dtype=jnp.int32)
    language_ids = jnp.zeros((batch,), dtype=jnp.int32)

    for name in which:
        kwargs = PRESETS[name]
        config, indexer, built = build_flagship(**kwargs)
        variables = built.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=3200)
        model = built.model

        @jax.jit
        def transcribe(variables, audio, lengths, language_ids):
            predictions = model.apply(variables, audio, lengths, language_ids, predict=True)
            tokens, _ts, counts, _s = greedy_decode_logits(
                predictions.outputs["phoneme"], predictions.lengths
            )
            return tokens, counts

        def run(num_batches: int) -> float:
            start = time.perf_counter()
            results = [
                transcribe(variables, audio, lengths, language_ids) for _ in range(num_batches)
            ]
            for tokens, _counts in results:
                np.asarray(tokens)
            return (time.perf_counter() - start) / num_batches

        warmup = run(1)  # warmup/compile (includes compile time)
        probe = run(1)
        # Slow presets (full f32 runs minutes per batch) get fewer batches per
        # rep so one pass through all presets stays bounded.
        if probe > 10.0:
            elapsed = probe
        elif probe > 2.0:
            elapsed = min(run(2) for _ in range(2))
        else:
            elapsed = min(run(4) for _ in range(4))
        rtf = batch * seconds / elapsed
        print(f"[{name:>12s}] {rtf:8.1f} audio-s/s ({rtf / 50:.2f}x of 50x target)", flush=True)


if __name__ == "__main__":
    main()
