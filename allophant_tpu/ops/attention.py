"""Fused multi-head attention dispatch.

The reference computes attention through torch ``nn.MultiheadAttention`` /
HF Wav2Vec2 attention, materializing the [B, H, T, T] score tensor. On TPU that
tensor dominates encoder HBM traffic (~1 GB f32 per layer at batch 64 x 500
frames), so inference routes through the Pallas TPU flash-attention kernel shipped
with JAX (tiled online softmax, scores never leave VMEM). Padding is expressed as
segment ids: valid frames are segment 1, padding segment 2, so valid queries never
attend to padding. The einsum path remains for CPU tests and for training with
attention dropout (the flash kernel has no weight-dropout support)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.cache
def _flash_available() -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa: F401

        return True
    except ImportError:
        return False


def _pad_to_block(time: int) -> int:
    """Padding to the next multiple of 128 (the minimum flash block size)."""
    return ((time + 127) // 128) * 128 - time


def _block_size(padded_time: int) -> int:
    """Largest flash block size that divides the padded sequence length."""
    for block in (512, 256, 128):
        if padded_time % block == 0:
            return block
    return padded_time  # < 128: single block


def fused_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    pad_mask,
    sm_scale: float,
) -> jnp.ndarray:
    """Attention over [B, T, H, D] inputs with a [B, T] validity mask (True =
    valid); returns [B, T, H, D]. Uses the TPU flash kernel when available."""
    batch, time, heads, head_dim = query.shape
    if not _flash_available():
        return reference_attention(query, key, value, pad_mask, sm_scale)

    from allophant_tpu.ops.oneshot_attention import oneshot_attention, plan_oneshot

    pad = _pad_to_block(time)
    if plan_oneshot(heads, head_dim, time + pad, query.dtype.itemsize) is not None:
        # Sequences up to ~3 min of audio: single-pass exact-softmax kernels
        # over the [B, T, H*hd] projection layout — no head transposes; the
        # score tile shrinks from full [T, T] through head-blocked to
        # query-blocked as T grows. ~3x faster than the flash path at T=512,
        # B=64 on v5e.
        q, k, v, bias = _oneshot_layout(query, key, value, pad_mask, pad)
        out = oneshot_attention(q, k, v, bias, sm_scale, heads)
        if pad:
            out = out[:, :time]
        return out.reshape(batch, time, heads, head_dim)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )
    q = jnp.transpose(query, (0, 2, 1, 3))
    k = jnp.transpose(key, (0, 2, 1, 3))
    v = jnp.transpose(value, (0, 2, 1, 3))
    if pad_mask is None:
        segments = jnp.ones((batch, time), jnp.int32)
    else:
        segments = jnp.where(pad_mask, 1, 2).astype(jnp.int32)
    if pad:
        widths = ((0, 0), (0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        segments = jnp.pad(segments, ((0, 0), (0, pad)), constant_values=2)

    # Default block sizes launch one grid cell per (batch, head) — at ASR shapes
    # (short T, many batch x head cells) the per-cell overhead dominates. Blocking
    # the batch dimension amortizes it (measured ~35 -> ~27 ms/layer at
    # B=64, H=16, T=512 on v5e).
    padded_time = time + pad
    block_q = _block_size(padded_time)
    block_k = _block_size(padded_time)
    # Batch blocking amortizes per-grid-cell overhead, but the kernel's VMEM
    # working set grows with block_b x T; scale it down for long sequences
    # (block_b * padded_time <= 4096 keeps ~2 MB tiles under the 16 MB budget).
    block_b = max(1, min(8, batch, 4096 // padded_time))
    while batch % block_b:
        block_b -= 1
    block_sizes = BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=block_b,
        block_q_major_dkv=block_q,
        block_k_major_dkv=block_k,
        block_k_dkv=block_k,
        block_q_dkv=block_q,
        block_k_major_dq=block_k,
        block_k_dq=block_k,
        block_q_dq=block_q,
    )
    from allophant_tpu.ops.oneshot_attention import _kernel_precision_scope

    with _kernel_precision_scope(q.dtype):
        out = flash_attention(
            q,
            k,
            v,
            segment_ids=SegmentIds(segments, segments),
            sm_scale=sm_scale,
            block_sizes=block_sizes,
        )
    if pad:
        out = out[:, :, :time]
    return jnp.transpose(out, (0, 2, 1, 3))


def reference_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    pad_mask,
    sm_scale: float,
    dropout_module=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Plain einsum attention (f32 softmax) with optional weight dropout."""
    logits = jnp.einsum("bthd,bshd->bhts", query * sm_scale, key)
    if pad_mask is not None:
        logits = jnp.where(pad_mask[:, None, None, :], logits, -1e9)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(query.dtype)
    if dropout_module is not None:
        weights = dropout_module(weights, deterministic=deterministic)
    return jnp.einsum("bhts,bshd->bthd", weights, value)


def _oneshot_layout(query, key, value, pad_mask, pad):
    """Shared one-shot kernel pre-processing: fold heads into [B, T, H*hd],
    express padding as an additive f32 key bias (0 valid / NEG_INF padded), and
    right-pad the time axis to the 128-aligned kernel length."""
    from allophant_tpu.ops.oneshot_attention import NEG_INF

    batch, time, heads, head_dim = query.shape
    model_dim = heads * head_dim
    q = query.reshape(batch, time, model_dim)
    k = key.reshape(batch, time, model_dim)
    v = value.reshape(batch, time, model_dim)
    if pad_mask is None:
        bias = jnp.zeros((batch, time), jnp.float32)
    else:
        bias = jnp.where(pad_mask, 0.0, NEG_INF).astype(jnp.float32)
    if pad:
        widths = ((0, 0), (0, pad), (0, 0))
        q = jnp.pad(q, widths)
        k = jnp.pad(k, widths)
        v = jnp.pad(v, widths)
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)
    return q, k, v, bias


def kernel_dropout_supported(heads: int, head_dim: int, time: int, item_bytes: int) -> bool:
    """True when training attention dropout can run inside the one-shot Pallas
    kernel: TPU backend and the padded sequence fits the full-tile plan. The
    caller draws the dropout PRNG key only on this path (the einsum fallback
    draws through ``nn.Dropout`` instead)."""
    if not _flash_available():
        return False
    from allophant_tpu.ops.oneshot_attention import plan_oneshot_dropout

    padded_time = time + _pad_to_block(time)
    return plan_oneshot_dropout(heads, head_dim, padded_time, item_bytes) is not None


def dropout_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    pad_mask,
    sm_scale: float,
    dropout_rng,
    dropout_rate: float,
) -> jnp.ndarray:
    """Attention with weight dropout drawn inside the one-shot kernel.

    The einsum path materializes the [B, H, T, T] dropout mask in HBM — u32
    draws plus a relayout copy, generated again inside the rematerialized
    backward (~29 ms/step at the flagship training shape with the rbg PRNG;
    ~3x that under threefry). Here the mask is a pure function of two i32
    seeds and the (batch, head) indices: the forward draws it in VMEM, and the
    custom_vjp backward regenerates it (reference HF attention-dropout
    semantics, torch F.dropout on softmaxed weights)."""
    from allophant_tpu.ops.oneshot_attention import oneshot_dropout_attention

    batch, time, heads, head_dim = query.shape
    pad = _pad_to_block(time)
    q, k, v, bias = _oneshot_layout(query, key, value, pad_mask, pad)
    seeds = jax.random.randint(dropout_rng, (2,), -(2**31), 2**31 - 1, dtype=jnp.int32)
    out = oneshot_dropout_attention(q, k, v, bias, seeds, sm_scale, heads, dropout_rate)
    if pad:
        out = out[:, :time]
    return out.reshape(batch, time, heads, head_dim)


def multi_head_attention(
    query: jnp.ndarray,
    key: jnp.ndarray,
    value: jnp.ndarray,
    pad_mask,
    sm_scale: float,
    dropout_module=None,
    deterministic: bool = True,
    dropout_rate: float = 0.0,
    dropout_rng=None,
) -> jnp.ndarray:
    """Dispatch: flash/one-shot kernel for deterministic attention on TPU,
    in-kernel dropout when the caller supplies ``dropout_rng`` (training on
    TPU within the full one-shot plan), einsum reference otherwise."""
    if deterministic or dropout_rate == 0.0 or dropout_module is None:
        return fused_attention(query, key, value, pad_mask, sm_scale)
    if dropout_rng is not None:
        return dropout_attention(
            query, key, value, pad_mask, sm_scale, dropout_rng, dropout_rate
        )
    return reference_attention(
        query, key, value, pad_mask, sm_scale, dropout_module, deterministic
    )
