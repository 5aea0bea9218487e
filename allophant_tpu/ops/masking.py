"""Length/mask utilities for static-shape TPU batches.

Counterpart of the reference's dynamic-length plumbing (`allophant/utils.py:45-76`
``mask_sequence`` and `allophant/network/frontend.py:192-203` ``conv_length``), recast
for XLA: every sequence lives in a statically padded buffer and carries an integer
length; masks are computed from lengths inside jit."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def mask_sequence(lengths, max_length: int, inverse: bool = False, batch_first: bool = True):
    """Boolean [B, T] (or [T, B]) mask of valid positions from a length vector."""
    positions = jnp.arange(max_length)
    if batch_first:
        mask = positions[None, :] < lengths[:, None]
    else:
        mask = positions[:, None] < lengths[None, :]
    return ~mask if inverse else mask


def conv_output_length(lengths, kernel_size: int, stride: int = 1, padding: int = 0):
    """Output length of a 1D convolution: floor((len + padding - kernel) / stride) + 1.

    Matches torch Conv1d length math (reference frontend.py:192-203). Works on numpy
    arrays, jax arrays and plain ints."""
    return (lengths + padding - kernel_size) // stride + 1


def stacked_conv_output_lengths(
    lengths, kernels: Sequence[int], strides: Sequence[int], paddings: Sequence[int] | None = None
):
    if paddings is None:
        paddings = [0] * len(kernels)
    for kernel_size, stride, padding in zip(kernels, strides, paddings):
        lengths = conv_output_length(lengths, kernel_size, stride, padding)
    return lengths


def get_padding(kernel_size: int, stride: int = 1, stft_type: bool = False) -> Tuple[int, int]:
    """Symmetric-ish padding amounts used by the from-scratch frontend convolutions
    (reference padding.py:10-21)."""
    if stft_type:
        padding = kernel_size // 2
        if stride == 1:
            return (padding, padding - 1)
        return (padding, padding)
    if stride > 1:
        # Enough padding for a strided filter to reach the edge.
        return (kernel_size // 2, kernel_size - 1)
    padding = kernel_size // 2
    return (padding, padding)


def zero_mean_unit_var_norm(features, lengths, mask):
    """Per-utterance normalization over valid positions only (reference
    acoustic_model.py:762-767). ``features``: [B, T]; ``mask``: [B, T] bool.

    The denominator is clamped to 1: batch-padding filler rows have length 0,
    and a 0/0 mean would not just corrupt that row's (masked) forward values —
    its NaN activations reach *parameter* gradients through the backward matmuls
    even when the loss masks the row out (NaN · 0 = NaN)."""
    mask = mask.astype(features.dtype)
    lengths = jnp.maximum(lengths, 1).astype(features.dtype)
    means = (features * mask).sum(axis=1, keepdims=True) / lengths[:, None]
    deviations = (features - means) * mask
    variances = (deviations**2).sum(axis=1, keepdims=True) / lengths[:, None]
    return ((features - means) / jnp.sqrt(variances + 1e-7)) * mask


def pad_to_multiple(array: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Host-side helper: right-pads an axis to the next multiple (bucketing support)."""
    size = array.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return array
    widths = [(0, 0)] * array.ndim
    widths[axis] = (0, target - size)
    return np.pad(array, widths)
