"""Sweep (heads_per_block, query_block) configs for the query-blocked one-shot
attention kernel on the real TPU (the long-utterance path, T > MAX_HEADBLOCK_TIME).

Times each candidate with the scan-amortized recipe from
`.claude/skills/verify/SKILL.md` (loop inside one jit with a threaded data
dependency so XLA cannot hoist the body; scalar fetch fences the tunnel).
Run while the TPU is otherwise idle; candidates that overflow VMEM fail compile
with an HTTP 500 from the remote compiler and are reported as FAILED.

Usage: python tools/tune_qblock_attention.py [T] [batch]
"""

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

from allophant_tpu.ops import oneshot_attention as osa

STEPS = 20


def main() -> None:
    time_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 2560
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    heads, head_dim = 16, 64
    model_dim = heads * head_dim

    rng = np.random.default_rng(0)
    query, key, value = (
        jnp.asarray(rng.standard_normal((batch, time_frames, model_dim)), dtype=jnp.bfloat16)
        for _ in range(3)
    )
    bias = jnp.zeros((batch, time_frames), jnp.float32)

    candidates = [
        (16, 128), (8, 256), (8, 128), (4, 512), (4, 320), (2, 320),
        (4, 256), (2, 256), (4, 128),
    ]
    # Bypass the production VMEM fit model: let each candidate reach the
    # compiler and fail there if it genuinely does not fit, so the sweep
    # discovers the true frontier rather than the model's estimate of it.
    osa._QBLOCK_VMEM_BUDGET = 64_000_000
    results = {}
    for heads_per_block, query_block in candidates:
        if (
            heads % heads_per_block
            or time_frames % query_block
            or (heads_per_block * head_dim) % 128
            or query_block % 8
        ):
            continue
        osa._QBLOCK_CANDIDATES = ((heads_per_block, query_block),)

        @jax.jit
        def run(q, k, v, b):
            def body(carry, _):
                out = osa._oneshot_forward(carry, k, v, b, 0.125, heads)
                # Thread a dependency so XLA cannot hoist the loop body.
                return out, ()

            final, _ = jax.lax.scan(body, q, None, length=STEPS)
            return final.astype(jnp.float32).sum()

        label = f"hpb={heads_per_block} qb={query_block}"
        try:
            np.asarray(run(query, key, value, bias))  # compile + warmup
            start = time.perf_counter()
            np.asarray(run(query, key, value, bias))
            elapsed = (time.perf_counter() - start) / STEPS
            results[label] = elapsed
            print(f"{label}: {elapsed * 1e3:7.3f} ms/call", flush=True)
        except Exception as error:  # noqa: BLE001 - report and continue the sweep
            print(f"{label}: FAILED {type(error).__name__}: {str(error)[:120]}", flush=True)
    if results:
        best = min(results, key=results.get)
        print(f"best: {best} ({results[best] * 1e3:.3f} ms/call)")


if __name__ == "__main__":
    main()
