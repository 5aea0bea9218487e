"""Fast exact-GELU for the TPU VPU.

The reference applies torch's exact (erf-based) GELU throughout wav2vec2
(HF ``Wav2Vec2FeedForward``; conv extractor activations). On TPU,
``jax.nn.gelu(approximate=False)`` lowers to an f32 erf polynomial plus a true
division, which is the single most expensive elementwise op in the encoder
(~1.3 ms per layer over the [B, T, 4096] FFN activation at batch 64).

``fast_gelu`` evaluates erf(x/sqrt(2)) as tanh(p(x)) with an odd degree-7
polynomial p fitted on [0, 6] (least squares against scipy's erf; x**2 clamped
at 36 so the tail saturates correctly). Max |gelu error| is 2.4e-5 in f32: bf16
outputs differ from the exact formulation by at most 1 ulp, except in the deep
negative tail (x < -2.5, where |gelu| < 3e-5 is itself below bf16 resolution of
the surrounding O(1) activations) where the error is bounded by 3e-5 absolute.
Cost: one tanh and five multiply-adds, no erf, no division.

For f32 activations the exact erf form is used instead: f32 parity against the
reference (HF torch activations) is part of the test surface and a 2.4e-5
deviation would show up there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Least-squares fit of erf(x / sqrt(2)) ~= tanh(x * (C1 + x^2 (C3 + x^2 (C5 + x^2 C7))))
# over x in [0, 6]; max erf error 1.4e-5, max gelu output error 2.4e-5.
_C1 = np.float32(7.978187993e-01)
_C3 = np.float32(3.654991252e-02)
_C5 = np.float32(-1.958085291e-04)
_C7 = np.float32(-1.356392330e-05)
_HALF = np.float32(0.5)
_ONE = np.float32(1.0)
_CLAMP = np.float32(36.0)  # p(x) is only valid on [-6, 6]; tanh saturates beyond
_INV_SQRT2 = np.float32(2.0**-0.5)


def _gelu_exact_f32(x: jnp.ndarray) -> jnp.ndarray:
    return _HALF * x * (_ONE + jax.lax.erf(x * _INV_SQRT2))


def fast_gelu(value: jnp.ndarray) -> jnp.ndarray:
    """Exact-GELU semantics, fast on TPU for sub-f32 dtypes.

    bf16/f16 inputs: tanh-polynomial erf in f32, indistinguishable from exact
    GELU at output precision (at most 1-ulp rounding flips). f32 and wider:
    falls back to the true erf form so numerical-parity tests see exact values.
    """
    if value.dtype in (jnp.float32, jnp.float64):
        return _gelu_exact_f32(value)
    x = value.astype(jnp.float32)
    x2 = jnp.minimum(x * x, _CLAMP)
    p = x * (_C1 + x2 * (_C3 + x2 * (_C5 + x2 * _C7)))
    return (_HALF * x * (_ONE + jnp.tanh(p))).astype(value.dtype)
