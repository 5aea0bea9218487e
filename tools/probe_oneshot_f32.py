#!/usr/bin/env python3
"""On-device compile/latency probe for one-shot attention plans.

Calibrates the scoped-VMEM fit model in ``plan_oneshot`` (the Mosaic scoped
allocation limit is 16 MB; what counts against it — double-buffered io tiles,
one or two f32 score-sized scratch tiles — is established empirically here, not
assumed). Forces a specific plan by monkeypatching the mode thresholds."""

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

HEADS, HEAD_DIM = 16, 64


def run(batch, time_steps, dtype, plan_mode):
    model_dim = HEADS * HEAD_DIM
    rng = np.random.default_rng(0)
    shape = (batch, time_steps, model_dim)
    q = jnp.asarray(rng.standard_normal(shape), dtype)
    k = jnp.asarray(rng.standard_normal(shape), dtype)
    v = jnp.asarray(rng.standard_normal(shape), dtype)
    bias = jnp.zeros((batch, time_steps), jnp.float32)

    old = (osa.MAX_ONESHOT_TIME, osa.MAX_HEADBLOCK_TIME)
    if plan_mode == "headblock":
        osa.MAX_ONESHOT_TIME = 0
    elif plan_mode == "qblock":
        osa.MAX_ONESHOT_TIME = 0
        osa.MAX_HEADBLOCK_TIME = 0
    try:
        fn = jax.jit(lambda q, k, v, bias: osa._oneshot_forward(q, k, v, bias, 0.125, HEADS))
        np.asarray(fn(q, k, v, bias))  # compile + fence
        start = time.perf_counter()
        iterations = 10
        for _ in range(iterations):
            out = fn(q, k, v, bias)
        np.asarray(out)
        elapsed = (time.perf_counter() - start) / iterations
        print(
            f"batch={batch} T={time_steps} dtype={jnp.dtype(dtype).name} plan={plan_mode}:"
            f" OK {elapsed * 1e3:.2f} ms/iter",
            flush=True,
        )
    except Exception as error:  # noqa: BLE001
        message = str(error).split("\n")[0][:140]
        print(
            f"batch={batch} T={time_steps} dtype={jnp.dtype(dtype).name} plan={plan_mode}:"
            f" FAIL {message}",
            flush=True,
        )
    finally:
        osa.MAX_ONESHOT_TIME, osa.MAX_HEADBLOCK_TIME = old


if __name__ == "__main__":
    cases = [
        (16, 768, jnp.bfloat16, "full"),
        (16, 1536, jnp.bfloat16, "headblock"),
        (16, 1024, jnp.float32, "headblock"),
        (16, 1280, jnp.float32, "headblock"),
        (16, 1536, jnp.float32, "qblock"),
        (128, 512, jnp.float32, "qblock"),
    ]
    for case in cases:
        run(*case)
