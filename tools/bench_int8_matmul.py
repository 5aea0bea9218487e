"""Microbenchmark: int8 vs bf16 matmul throughput on one chip.

Decides whether an int8 quantized-inference path is worth building: TPU v5e's
MXU peaks at ~2x the bf16 rate for int8 operands. Measures three variants at
the flagship FFN shape ([B*T, D] x [D, 4D]):

1. bf16 x bf16 -> f32
2. int8 x int8 -> int32 (weights AND activations pre-quantized)
3. dynamic: bf16 activations quantized per-row on the fly, int8 matmul,
   dequantized with per-row x per-column scales (the real serving pattern)

Timing follows the verify-skill recipe: N back-to-back dispatches inside one
jit via lax.scan with a threaded data dependency, fenced by a scalar fetch.

Measured on this chip (2026-08-18): bf16 1.235 ms (222.6 TFLOP/s),
int8_static 1.021 ms (269.2 TFLOP/s, only 1.21x — XLA's int8 lowering does
not reach the nominal 2x MXU peak), int8_dynamic 1.851 ms (148.5 TFLOP/s,
SLOWER than bf16: the per-row quantize pass re-reads and re-writes the whole
activation, and that bandwidth exceeds the matmul's savings). Conclusion: an
int8 inference path is not worth its accuracy risk here — the serving-shaped
dynamic variant loses outright, and even pre-quantized activations buy <1.25x.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_scan(step, operand, iters=32, reps=5):
    """Median wall-clock per step of `step` scanned `iters` times in one jit."""

    @jax.jit
    def run(x):
        def body(carry, _):
            carry = step(carry)
            return carry, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jax.tree_util.tree_map(lambda v: v.sum(), out)

    fenced = run(operand)
    jax.tree_util.tree_map(np.asarray, fenced)  # warmup + compile
    times = []
    for _ in range(reps):
        start = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, run(operand))
        times.append((time.perf_counter() - start) / iters)
    return min(times)


def main():
    rows, d_model, d_ff = 64 * 512, 1024, 4096
    rng = np.random.default_rng(0)
    x_f = rng.standard_normal((rows, d_model)).astype(np.float32)
    w_f = (rng.standard_normal((d_model, d_ff)) * 0.02).astype(np.float32)

    x_bf = jnp.asarray(x_f, jnp.bfloat16)
    w_bf = jnp.asarray(w_f, jnp.bfloat16)
    x_i8 = jnp.asarray(np.clip(np.round(x_f * 4), -127, 127), jnp.int8)
    w_i8 = jnp.asarray(np.clip(np.round(w_f * 512), -127, 127), jnp.int8)
    w_scale = jnp.asarray(np.abs(w_f).max(axis=0) / 127.0, jnp.float32)

    flops = 2 * rows * d_model * d_ff

    def bf16_step(x):
        y = jax.lax.dot_general(
            x, w_bf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # keep shape for scan carry: fold back to [rows, d_model]
        return (y[:, :d_model] * np.float32(1e-3)).astype(jnp.bfloat16)

    def int8_step(x):
        y = jax.lax.dot_general(
            x, w_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return jnp.clip(y[:, :d_model] >> 8, -127, 127).astype(jnp.int8)

    def dynamic_step(x):
        # per-row dynamic activation quantization (serving pattern)
        row_scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True), 1e-6) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / row_scale), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            q, w_i8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        out = y.astype(jnp.float32) * row_scale * w_scale[None, :]
        return (out[:, :d_model] * np.float32(1e-3)).astype(jnp.bfloat16)

    for name, step, operand in (
        ("bf16", bf16_step, x_bf),
        ("int8_static", int8_step, x_i8),
        ("int8_dynamic", dynamic_step, x_bf),
    ):
        seconds = _time_scan(step, operand)
        print(f"{name:13s} {seconds * 1e3:7.3f} ms  {flops / seconds / 1e12:7.1f} TFLOP/s")


if __name__ == "__main__":
    main()
