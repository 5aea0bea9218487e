"""Strided 1D convolution as stride-grouped matmuls (MXU-friendly).

The wav2vec2 feature extractor's middle layers (512 -> 512 channels, kernel 3
or 2, stride 2 — reference acoustic_model.py:775-835 wrapping the HF conv
stack) lower to XLA convolutions that run at ~130-150 TFLOP/s on this chip,
well under the ~200+ TFLOP/s the same contraction reaches as a plain matmul
(the conv tiling can't use the full 128x128 MXU tile when the window slides).

Because the stride divides the sequence into disjoint sample groups, a
VALID-padding strided conv is exactly a sum of ``ceil(K / stride)`` matmuls
over a stride-grouped relayout (a pad-or-slice copy whenever ``rows * stride``
differs from ``T`` — the common case for these layers, and exactly the
relayout cost the measured regression below traces back to):

    grouped[b, r, :] = concat(x[b, r*s], ..., x[b, r*s + s - 1])    # [B, R, s*C]
    out[b, t] = sum_g grouped[b, t + g, :taps_g * C] @ W_g

where ``W_g`` stacks kernel taps ``[g*s, min(K, (g+1)*s))``. For the stride-2
layers this is one [B, T', 2C] x [2C, C'] matmul (kernel 2: the whole conv)
plus, for kernel 3, a second [B, T', C] x [C, C'] matmul for the odd tap —
identical FLOPs to the convolution, all of them on dense MXU tiles.

**Measured result: do not wire this into the encoder.** End-to-end flagship
inference (bench.py, batch 128 x 10 s, bf16) regressed from 3,384 to 2,760
audio-sec/s with this path substituted for the stride>1 conv layers: the
reshape/pad/shifted-slice relayouts on the early layers' multi-GB activations
(layer 1 input is [128, 32k, 512] bf16 ≈ 4.2 GB) cost more HBM bandwidth than
the denser MXU tiling saves. Kept (with exact-equivalence tests in
tests/test_ops.py) as a documented negative study alongside the int8 matmul
one (tools/bench_int8_matmul.py); a future fused Pallas formulation would need
to consume the grouped layout directly without the relayout round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp


def strided_conv_matmul(hidden, kernel, bias, stride: int, *, dtype=None):
    """VALID-padding 1D convolution via stride-grouped matmuls.

    Args:
        hidden: [B, T, C_in] input activations.
        kernel: [K, C_in, C_out] convolution kernel (``nn.Conv`` layout).
        bias: [C_out] bias or None.
        stride: convolution stride (must be >= 1).
        dtype: compute dtype; kernel/bias are cast to it (flax ``nn.Conv``
            promotion semantics). Defaults to ``hidden.dtype``.

    Returns:
        [B, (T - K) // stride + 1, C_out] outputs, matching
        ``nn.Conv(padding="VALID", strides=(stride,))``.
    """
    k, c_in, c_out = kernel.shape
    batch, t, _ = hidden.shape
    out_len = (t - k) // stride + 1
    if out_len < 1:
        raise ValueError(f"input length {t} shorter than kernel {k}")
    compute_dtype = dtype or hidden.dtype
    hidden = hidden.astype(compute_dtype)
    kernel = kernel.astype(compute_dtype)

    groups = -(-k // stride)
    rows = out_len + groups - 1
    needed = rows * stride
    if needed > t:
        hidden = jnp.pad(hidden, ((0, 0), (0, needed - t), (0, 0)))
    elif needed < t:
        hidden = hidden[:, :needed]
    grouped = hidden.reshape(batch, rows, stride * c_in)

    out = None
    for group in range(groups):
        taps = min(k - group * stride, stride)
        weights = kernel[group * stride : group * stride + taps].reshape(taps * c_in, c_out)
        window = grouped[:, group : group + out_len, : taps * c_in]
        term = window @ weights
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias.astype(compute_dtype)
    return out
