"""Pallas kernel: fused first-layer wav2vec2 frame encoding.

The reference's first feature-extractor conv (kernel 10, stride 5, 1 -> 512
channels, followed by LayerNorm and exact GELU — HF Wav2Vec2 "layer"-norm mode,
reference acoustic_model.py:775-835 wrapping transformers' feature extractor) is the
slowest op on TPU when expressed as a convolution: the contraction dimension is 10,
so the MXU runs ~8% occupied while the [B, T/5, 512] activation makes three
round-trips through HBM (conv -> layer norm -> GELU).

This kernel uses a layout-native formulation: the audio is deinterleaved host-side
(in XLA) into 10 tap streams S[b, k, f] = audio[b, 5 f + k] so every kernel operand
has frames in the 128-wide lane dimension. Each output tile is one MXU contraction
W^T [C, 10] x S [10, TILE], then layer norm (channel = sublane reduction), exact
GELU and a tile-local transpose to [T', C] happen in the same VMEM tile — one HBM
write for the whole conv+LN+GELU block."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Frames per grid step (lane-dimension extent of one tile). The working set per
# step is ~[C, TILE] f32 accumulator + double-buffered in/out tiles; 512 keeps it
# comfortably under the 16 MB VMEM budget.
_TILE_FRAMES = 512


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf approximation. Pallas TPU has no erf
    primitive, so exact-GELU parity is kept via this polynomial; the division uses
    the VPU's fast approximate reciprocal (total error ~1e-3, below the bf16 output
    resolution; ~18% faster kernel — it is division-bound otherwise)."""
    sign = jnp.sign(x)
    x = jnp.abs(x)
    t = pl.reciprocal(1.0 + 0.3275911 * x, approx=True)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-x * x))


def _kernel(streams_ref, w_ref, bias_ref, scale_ref, ln_bias_ref, out_ref, *, eps):
    """One [C, TILE] tile: the K=10 contraction on the MXU + layer norm + exact
    GELU on the VPU (a rank-1 VPU accumulation was ~2x slower)."""
    acc = (
        jnp.dot(w_ref[:], streams_ref[0], preferred_element_type=jnp.float32)
        + bias_ref[:]
    )  # [C, TILE]
    mean = acc.mean(axis=0, keepdims=True)
    centered = acc - mean
    variance = (centered * centered).mean(axis=0, keepdims=True)
    normalized = centered * jax.lax.rsqrt(variance + eps)
    normalized = normalized * scale_ref[:] + ln_bias_ref[:]
    gelu = 0.5 * normalized * (1.0 + _erf(normalized * (2.0**-0.5)))
    # Tile-local transpose to the [T', C] layout downstream convs consume — far
    # cheaper in VMEM than a 2 GB XLA transpose after the fact.
    out_ref[0] = gelu.T.astype(out_ref.dtype)


@functools.cache
def _use_interpret() -> bool:
    """Pallas TPU kernels need the interpreter on CPU (tests, virtual meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


def _reference_frame_conv(audio, kernel, bias, ln_scale, ln_bias, eps, out_dtype):
    """Pure-jnp forward with the same math as the kernel; used for the backward
    pass (pallas_call has no autodiff rule) and as a correctness oracle."""
    batch, samples = audio.shape
    groups = audio.reshape(batch, samples // 5, 5)
    frames = jnp.concatenate((groups[:, :-1], groups[:, 1:]), axis=-1)  # [B, F, 10]
    hidden = (
        jnp.dot(
            frames.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + bias.astype(jnp.float32)
    )
    mean = hidden.mean(axis=-1, keepdims=True)
    centered = hidden - mean
    variance = (centered * centered).mean(axis=-1, keepdims=True)
    normalized = centered * jax.lax.rsqrt(variance + eps)
    normalized = normalized * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    gelu = 0.5 * normalized * (1.0 + jax.lax.erf(normalized * (2.0**-0.5)))
    return gelu.astype(out_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _frame_conv(audio, kernel, bias, ln_scale, ln_bias, eps, out_dtype):
    return _pallas_frame_conv(audio, kernel, bias, ln_scale, ln_bias, eps, out_dtype)


def _frame_conv_fwd(audio, kernel, bias, ln_scale, ln_bias, eps, out_dtype):
    out = _pallas_frame_conv(audio, kernel, bias, ln_scale, ln_bias, eps, out_dtype)
    return out, (audio, kernel, bias, ln_scale, ln_bias)


def _frame_conv_bwd(eps, out_dtype, residuals, cotangent):
    _, vjp = jax.vjp(
        lambda *primals: _reference_frame_conv(*primals, eps, out_dtype), *residuals
    )
    return vjp(cotangent)


_frame_conv.defvjp(_frame_conv_fwd, _frame_conv_bwd)


@functools.partial(jax.jit, static_argnames=("eps", "out_dtype", "channels_first"))
def fused_frame_conv(
    audio: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    eps: float = 1e-5,
    out_dtype=jnp.bfloat16,
    channels_first: bool = False,
):
    """Fused conv(k=10, s=5, 1->C) + LayerNorm + exact GELU over raw audio.

    ``audio``: [B, T] float32; ``kernel``: [10, 1, C] (flax Conv layout) or
    [10, C]. Returns [B, T//5 - 1, C] (VALID padding, matching
    ``nn.Conv(padding="VALID")``), or [B, C, T//5 - 1] with ``channels_first``.
    Differentiable: the backward pass runs through an equivalent jnp
    implementation (custom VJP)."""
    samples = audio.shape[1]
    if kernel.ndim == 3:
        kernel = kernel[:, 0, :]

    # VALID conv never reads past the last full stride-5 window; drop the tail.
    if samples % 5:
        samples -= samples % 5
        audio = audio[:, :samples]
    out = _frame_conv(audio, kernel, bias, ln_scale, ln_bias, eps, out_dtype)
    if channels_first:
        return out.transpose(0, 2, 1)
    return out


def _pallas_frame_conv(audio, kernel, bias, ln_scale, ln_bias, eps, out_dtype):
    batch, samples = audio.shape
    channels = kernel.shape[1]
    num_groups = samples // 5
    num_frames = num_groups - 1
    padded_frames = ((num_frames + _TILE_FRAMES - 1) // _TILE_FRAMES) * _TILE_FRAMES
    grid_t = padded_frames // _TILE_FRAMES

    # Tap streams: S[b, k, f] = audio[b, 5 f + k]; rows 5..9 are the stride-ahead
    # taps (group f + 1). Frames land in the lane dimension everywhere.
    groups = audio.reshape(batch, num_groups, 5)
    pad = padded_frames - num_frames
    base = jnp.pad(groups[:, :-1], ((0, 0), (0, pad), (0, 0))).transpose(0, 2, 1)
    ahead = jnp.pad(groups[:, 1:], ((0, 0), (0, pad), (0, 0))).transpose(0, 2, 1)
    streams = jnp.concatenate((base, ahead), axis=1)  # [B, 10, P]

    w_t = kernel.T.astype(jnp.float32)  # [C, 10], channels in sublanes
    bias_col = bias.astype(jnp.float32)[:, None]
    scale_col = ln_scale.astype(jnp.float32)[:, None]
    ln_bias_col = ln_bias.astype(jnp.float32)[:, None]

    # Precision pinned to the model dtype's scope (see
    # oneshot_attention._kernel_precision_scope): Mosaic rejects the ambient
    # 3-pass HIGH the float32_high serving preset would otherwise leak in here.
    # Keyed on out_dtype to reproduce the pre-preset trace-time behavior
    # exactly (f32 models traced this dot under HIGHEST, bf16 under DEFAULT).
    from allophant_tpu.ops.oneshot_attention import _kernel_precision_scope

    with _kernel_precision_scope(out_dtype):
        out = pl.pallas_call(
            functools.partial(_kernel, eps=eps),
            out_shape=jax.ShapeDtypeStruct((batch, padded_frames, channels), out_dtype),
            grid=(batch, grid_t),
            in_specs=[
                pl.BlockSpec((1, 10, _TILE_FRAMES), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM),
                pl.BlockSpec((channels, 10), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((channels, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((channels, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((channels, 1), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, _TILE_FRAMES, channels), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
            ),
            interpret=_use_interpret(),
        )(streams, w_t, bias_col, scale_col, ln_bias_col)
    return out[:, :num_frames]
