#!/usr/bin/env python3
"""Attributes the greedy->beam serving gap (VERDICT r4 item 3).

BENCH_r03: all-heads greedy 2,841 audio-s/s vs beam 2,285 — a ~110 ms/batch gap
at batch 128 x 10 s with three candidate causes: the device beam scan, the host
n-best backtrace, and the n-best JSONL serialization. Each is measured alone
here with the tunnel-safe methodology (scalar-fenced device timing; dispatch
pipelining for steady-state loops)."""

import json
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


def fence(value) -> None:
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(value)[0]))


def timed(fn, *args, reps=8):
    """Median wall time of fn(*args) with a scalar fence per rep."""
    fence(fn(*args))  # compile
    times = []
    for _ in range(reps):
        start = time.perf_counter()
        fence(fn(*args))
        times.append(time.perf_counter() - start)
    return float(np.median(times))


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    seconds = 10.0
    time_steps = 512
    classes = int(sys.argv[2]) if len(sys.argv) > 2 else 41
    beam_width = 4

    from allophant_tpu.ops.decode import beam_search_padded, greedy_decode_logits

    rng = np.random.default_rng(0)
    log_probs = jnp.asarray(
        jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((batch, time_steps, classes)).astype(np.float32)),
            axis=-1,
        )
    )
    frame_lengths = jnp.full((batch,), 499, jnp.int32)

    greedy = jax.jit(lambda lp, fl: greedy_decode_logits(lp, fl))
    beam = jax.jit(
        lambda lp, fl: beam_search_padded(lp, fl, beam_width=beam_width)
    )

    greedy_ms = timed(greedy, log_probs, frame_lengths) * 1e3
    beam_ms = timed(beam, log_probs, frame_lengths) * 1e3
    print(f"device greedy     [B={batch} T={time_steps} C={classes}]: {greedy_ms:7.2f} ms")
    print(f"device beam scan  [B={batch} T={time_steps} C={classes}]: {beam_ms:7.2f} ms")

    from allophant_tpu.ops.beam_kernel import beam_search_padded_pallas

    beam_pallas = jax.jit(
        lambda lp, fl: beam_search_padded_pallas(lp, fl, beam_width=beam_width)
    )
    try:
        pallas_ms = timed(beam_pallas, log_probs, frame_lengths) * 1e3
        print(f"device beam pallas[B={batch} T={time_steps} C={classes}]: {pallas_ms:7.2f} ms")
        scan_out = jax.block_until_ready(beam(log_probs, frame_lengths))
        kernel_out = jax.block_until_ready(beam_pallas(log_probs, frame_lengths))
        exact = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(scan_out[:2], kernel_out[:2])
        ) and np.allclose(np.asarray(scan_out[2]), np.asarray(kernel_out[2]), atol=1e-4)
        print(f"kernel-vs-scan on-device agreement: {exact}")
    except Exception as error:  # noqa: BLE001
        print(f"pallas beam FAILED: {str(error).splitlines()[0][:160]}")

    # Host backtrace (bench.py's vectorized version).
    sys.path.insert(0, _REPO_ROOT)
    parents, emitted, scores = jax.block_until_ready(beam(log_probs, frame_lengths))
    parents_np = np.asarray(parents)
    emitted_np = np.asarray(emitted)
    scores_np = np.asarray(scores)
    lengths_np = np.asarray(frame_lengths)

    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", os.path.join(_REPO_ROOT, "bench.py"))

    def backtrace(parents, emitted, scores, frame_lengths, n_best=4):
        time_steps, batch_rows, k_beams = emitted.shape
        rows = np.arange(batch_rows)[:, None]
        cursor = np.tile(np.arange(k_beams, dtype=np.int64)[None, :], (batch_rows, 1))
        collected = np.full((time_steps, batch_rows, k_beams), -1, np.int64)
        for t in range(time_steps - 1, -1, -1):
            valid = t < frame_lengths[:, None]
            token = emitted[t, rows, cursor]
            collected[t] = np.where(valid, token, -1)
            cursor = np.where(valid, parents[t, rows, cursor], cursor)
        order = np.argsort(-scores, axis=1)[:, :n_best]
        results = []
        for row in range(batch_rows):
            n_best_list = []
            for beam_id in order[row]:
                sequence = collected[:, row, beam_id]
                n_best_list.append(
                    (sequence[sequence >= 0].tolist(), float(scores[row, beam_id]))
                )
            results.append(n_best_list)
        return results

    start = time.perf_counter()
    reps = 8
    for _ in range(reps):
        n_best = backtrace(parents_np, emitted_np, scores_np, lengths_np)
    backtrace_ms = (time.perf_counter() - start) / reps * 1e3
    print(f"host backtrace [B={batch}]: {backtrace_ms:7.2f} ms")

    # n-best JSONL serialization for the phoneme track alone.
    table = np.array([f"p{i}" for i in range(classes)], dtype=object)
    start = time.perf_counter()
    for _ in range(reps):
        with open(os.devnull, "w", encoding="utf-8") as sink:
            for row in range(batch):
                record = {
                    "utterance_id": str(row),
                    "phoneme": [table[tokens].tolist() for tokens, _s in n_best[row]],
                }
                sink.write(json.dumps(record, ensure_ascii=False))
                sink.write("\n")
    jsonl_ms = (time.perf_counter() - start) / reps * 1e3
    print(f"host n-best JSONL (phoneme track) [B={batch}]: {jsonl_ms:7.2f} ms")


if __name__ == "__main__":
    main()
