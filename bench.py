"""Benchmark: batched inference throughput of the flagship model on one chip.

Measures audio-seconds transcribed per wall-clock second (real-time factor) for the
full pipeline the reference's predict path runs: XLS-R 300m encoder + all attribute
heads + phone logits with embedding composition, plus on-device greedy CTC decode of
the phoneme track. Prints one JSON line; ``vs_baseline`` is measured RTF divided by
the 50x-real-time-per-chip target (BASELINE.json)."""

import json
import sys
import time

import numpy as np

BASELINE_RTF = 50.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from allophant_tpu.demo import build_flagship
    from allophant_tpu.ops.decode import greedy_decode_padded

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    samples = int(16_000 * seconds)

    config, indexer, built = build_flagship(dtype=jnp.bfloat16)
    variables = built.init(jax.random.PRNGKey(0), sample_batch_size=1, sample_length=3200)
    model = built.model

    @jax.jit
    def transcribe(variables, audio, lengths, language_ids):
        predictions = model.apply(variables, audio, lengths, language_ids, predict=True)
        log_probs = jax.nn.log_softmax(predictions.outputs["phoneme"], axis=-1)
        return greedy_decode_padded(log_probs, predictions.lengths)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32))
    lengths = jnp.full((batch,), samples, dtype=jnp.int32)
    language_ids = jnp.zeros((batch,), dtype=jnp.int32)

    def run_once():
        tokens, timesteps, counts, scores = transcribe(variables, audio, lengths, language_ids)
        # Force full device execution + host transfer (block_until_ready alone may not
        # fence on tunneled backends).
        return np.asarray(tokens), np.asarray(counts)

    # Warmup / compile.
    run_once()

    iterations = 5
    start = time.perf_counter()
    for _ in range(iterations):
        result = run_once()
    elapsed = time.perf_counter() - start

    audio_seconds = batch * seconds * iterations
    rtf = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "batched_transcription_rtf",
                "value": round(rtf, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(rtf / BASELINE_RTF, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
