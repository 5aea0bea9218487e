"""One-shot (non-flash) multi-head attention kernel for short sequences.

ASR utterances are short: 10 s of 16 kHz audio is ~500 wav2vec2 frames, so a
full [T, T] f32 score tile fits comfortably in VMEM and the online-softmax
machinery of flash attention (running max/sum, rescaling across key blocks) is
pure overhead. This kernel computes attention in one pass per batch element
(grid (B,) with all heads per cell up to ``MAX_ONESHOT_TIME`` frames; a
head-blocked grid (B, H/2) up to ``MAX_HEADBLOCK_TIME``):

    each cell loops over its heads:
        scores = q_h @ k_h^T * scale + key_bias     (MXU, f32 accumulate)
        p      = softmax(scores)                    (VPU, full [T, T] tile)
        out_h  = p @ v_h                            (MXU)

Crucially the kernel reads q/k/v in [B, T, H*hd] layout — exactly what the
projection matmuls produce — so the [B, T, H, hd] -> [B, H, T, hd] transposes
the flash kernel requires (three 65 MB copies per layer at batch 64) disappear.

Padding is an additive f32 key bias (0 valid / -1e9 padded), matching the
reference einsum formulation (`ops/attention.py:reference_attention`). Padded
*query* rows attend over the valid keys and produce garbage-in-garbage-out
values that downstream masking drops; a fully-padded (zero-length) batch
element normalizes around its own biased peak and produces the einsum path's
uniform garbage average (finite, so NaNs stay out of any unmasked reduction,
with a denominator clamp guarding the 0/0 corner).

The backward pass delegates to the flash/einsum path via ``jax.custom_vjp`` —
training differentiates the same math, inference never pays for transposes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9
_LOG2E = np.float32(1.4426950408889634)
# Softmax denominator clamp: a fully-padded (zero-length) row's weights all
# flush to 0; the clamp turns the would-be 0/0 into an all-zero output row.
_TINY_TOTAL = np.float32(1e-30)
# Mode ceilings are performance priors; compile legality is the calibrated
# scoped-VMEM fit below (``_full_plan_fits`` / ``_MAX_HEADBLOCK_TIME_BY_ITEMSIZE``),
# probed on device per dtype (tools/probe_oneshot_f32.py) because the 16 MB
# scoped-vmem stack accounts double-buffered io tiles plus score-sized scratch.
MAX_ONESHOT_TIME = 768
MAX_HEADBLOCK_TIME = 1536
# Full plan: double-buffered [T, D] q/k/v/out io tiles plus two f32 [T, T]
# scratch tiles (scores, exps). On-device calibration at D=1024: bf16 T=512
# (modeled 10.5 MB) compiles; bf16 T=768 (17.3 MB) and f32 T=512 (18.9 MB,
# reported as a 19.86 MB scoped allocation over the 16 MB limit) fail.
_FULL_PLAN_VMEM_BUDGET = 15_500_000
# Head-blocked ceilings per itemsize, probed on device at D=1024 (the byte
# model above mispredicts this mode — Mosaic's scratch accounting differs):
# bf16 compiles at T=1536; f32 compiles at T=1152 and fails at T=1280.
_MAX_HEADBLOCK_TIME_BY_ITEMSIZE = {2: 1536, 4: 1152}


def _full_plan_fits(model_dim: int, padded_time: int, item_bytes: int) -> bool:
    io_bytes = 2 * 4 * padded_time * model_dim * item_bytes
    scratch_bytes = 2 * padded_time * padded_time * 4
    return io_bytes + scratch_bytes <= _FULL_PLAN_VMEM_BUDGET
_HEADS_PER_BLOCK = 2
# Past the head-blocked limit, the query axis is additionally blocked: each grid
# cell computes [Tq, T] scores for its heads with the FULL key axis resident, so
# the softmax is still exact in one pass (no flash-style online rescaling). The
# [Tq, T] f32 score tile bounds VMEM: at Tq=256, T=6144 it is 6 MB + two
# [T, 128] k/v tiles (3 MB) — comfortably under the ~16 MB budget. Re-reading
# k/v once per query block costs T/Tq times more k/v DMA, which is negligible
# against the T^2 score work.
MAX_QBLOCK_TIME = 6144
_QUERY_BLOCK = 256
# (heads_per_block, query_block) preference order for the query-blocked path;
# the first candidate that divides the head/time axes, produces lane-legal
# (128-divisible) block widths, and fits the VMEM model wins. Ordered by
# measured speed at T=2560/batch=16 (tools/tune_qblock_attention.py sweep:
# (4,320) 6.570 ms, (4,256) 6.593, (2,320) 6.743, (2,256) 6.894, (8,128)
# 7.164, (4,128) 8.307). Module-level so offline tuning sweeps can override.
_QBLOCK_CANDIDATES = ((4, 320), (4, 256), (2, 320), (2, 256), (2, 128), (1, 128))
# VMEM budget for the fit model: k/v tiles (pipelined x2) plus 1.5x the f32
# score scratch must stay under this. Calibrated against on-device compile
# outcomes at T=2560: modeled 12.4 MB (hpb=8, qb=128) compiles, 13.1 MB
# (hpb=4, qb=512) overflows. Module-level for tuning sweeps.
_QBLOCK_VMEM_BUDGET = 12_500_000


def _kernel_precision_scope(dtype):
    """Trace-time matmul precision pin for kernel invocations. Mosaic lowers
    DEFAULT and HIGHEST dot precisions but not the 3-pass HIGH that an ambient
    ``jax.default_matmul_precision("high")`` (the ``float32_high`` serving
    preset) would request, so kernels pin their own precision instead of
    inheriting the caller's scope: full-precision dots for f32 operands, the
    native MXU path for bf16 — exactly the behavior the f32/bf16 model scopes
    produced before the preset existed."""
    return jax.default_matmul_precision(
        "highest" if jnp.dtype(dtype) == jnp.float32 else "default"
    )


def plan_oneshot(
    heads: int, head_dim: int, padded_time: int, item_bytes: int, strict_lanes: bool = True
):
    """Kernel plan for a padded [B, T, H*hd] attention, or None when no legal
    configuration exists. On real TPUs (``strict_lanes``), a block that
    partitions the minor axis must be 128-divisible (Mosaic lane width); a
    block covering the FULL minor axis is always legal. VMEM bounds the
    resident tiles. Callers fall back to the flash kernel on None; interpret
    mode (CPU tests) passes ``strict_lanes=False``."""

    def lane_legal(block_width: int) -> bool:
        return not strict_lanes or block_width % 128 == 0 or block_width == heads * head_dim

    model_dim = heads * head_dim
    if padded_time <= MAX_ONESHOT_TIME and (
        not strict_lanes or _full_plan_fits(model_dim, padded_time, item_bytes)
    ):
        return ("full", heads)  # block spans the whole [T, H*hd] tile
    headblock_ceiling = (
        _MAX_HEADBLOCK_TIME_BY_ITEMSIZE.get(item_bytes, MAX_HEADBLOCK_TIME)
        if strict_lanes
        else MAX_HEADBLOCK_TIME
    )
    # Shapes too big for full (f32 serving, long bf16) cascade here; shapes too
    # big for headblock (long f32) cascade on to the query-blocked plan.
    if padded_time <= headblock_ceiling:
        for heads_per_block in (_HEADS_PER_BLOCK, 1):
            if heads % heads_per_block == 0 and lane_legal(heads_per_block * head_dim):
                return ("headblock", heads_per_block)
    if padded_time <= MAX_QBLOCK_TIME:
        for candidate_heads, candidate_block in _QBLOCK_CANDIDATES:
            kv_bytes = 4 * padded_time * candidate_heads * head_dim * item_bytes
            score_bytes = candidate_block * padded_time * 4
            if (
                heads % candidate_heads == 0
                and lane_legal(candidate_heads * head_dim)
                and candidate_block % 8 == 0
                and padded_time % candidate_block == 0
                and kv_bytes + score_bytes * 3 // 2 <= _QBLOCK_VMEM_BUDGET
            ):
                return ("qblock", (candidate_heads, candidate_block))
        return None
    return None


def _keep_threshold(rate: float) -> np.uint32:
    """Attention-dropout keep threshold: a weight survives when its uniform u32
    draw is strictly below ``round((1 - rate) * 2^32)`` (resolution 2^-32)."""
    return np.uint32(min(2**32 - 1, int(round((1.0 - rate) * 2**32))))


# Scoped-VMEM budget for the dropout variant of the full one-shot kernel: the
# [T, T] u32 draw tile plus the exps copy push the plain full plan's envelope,
# so legality is a separate calibrated fit — modeled as double-buffered q/k/v/out
# io tiles plus three f32-sized [T, T] scratch tiles (scores, exps, draws).
# Calibrated against on-device compiles at D=1024: bf16 T=512 (modeled 11.5 MB)
# compiles; bf16 T=640 (15.4 MB) and f32 T=512 (19.9 MB) overflow the 16 MB
# scoped limit ("Scoped allocation with size 23.55M ... exceeded").
_DROPOUT_VMEM_BUDGET = 12_500_000


def plan_oneshot_dropout(heads: int, head_dim: int, padded_time: int, item_bytes: int):
    """Kernel plan for attention with in-kernel dropout, or None when the shape
    must fall back to the einsum dropout path (ops/attention.py does this
    automatically). Only the "full" variant supports dropout draws."""
    plan = plan_oneshot(heads, head_dim, padded_time, item_bytes)
    if plan is None or plan[0] != "full":
        return None
    model_dim = heads * head_dim
    io_bytes = 2 * 4 * padded_time * model_dim * item_bytes
    scratch_bytes = 3 * padded_time * padded_time * 4
    if io_bytes + scratch_bytes > _DROPOUT_VMEM_BUDGET:
        return None
    return plan


def _attention_dropout_kernel(
    seed_ref, bias_ref, q_ref, k_ref, v_ref, out_ref, *, heads, head_dim, sm_scale, rate
):
    """Full-tile attention with in-kernel weight dropout.

    The reference applies torch dropout to the softmaxed [B, H, T, T] weights
    (HF Wav2Vec2Attention). Materializing that mask in HBM (u32 bits + relayout
    copy + compare, twice under rematerialization) costs ~29 ms/step at the
    flagship training shape even with the cheap rbg PRNG; here the mask is
    drawn from the Mosaic PRNG directly in VMEM and never leaves the chip. The PRNG is re-seeded per
    (batch, head) — ``(seed0, seed1, b, h)`` — so the backward pass can
    regenerate the identical mask tile-by-tile (``_dropout_mask``).

    Dropout-on-probabilities folds into the unnormalized form: with keep mask
    m and keep probability k, out = ((m * exps) @ v) / (total * k), where total
    sums the UNmasked exps (softmax normalizes before dropout)."""
    bias = bias_ref[0] * _LOG2E
    batch_index = pl.program_id(0)
    threshold = _keep_threshold(rate)
    keep_prob = np.float32(float(threshold) / 2**32)
    for head in range(heads):
        lo = head * head_dim
        hi = lo + head_dim
        q = q_ref[0, :, lo:hi] * np.float32(sm_scale * _LOG2E)
        k = k_ref[0, :, lo:hi]
        v = v_ref[0, :, lo:hi]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        peak = jnp.max(scores + bias, axis=-1, keepdims=True)
        exps = jnp.exp2(scores - peak + bias)
        total = jnp.maximum(jnp.sum(exps, axis=-1, keepdims=True), _TINY_TOTAL)
        # Mosaic seeds take at most two i32s: fold (batch, head) into the first
        # (same mixing as _dropout_mask_kernel so the backward regenerates the
        # identical stream).
        pltpu.prng_seed(seed_ref[0] + batch_index * heads + head, seed_ref[1])
        random_bits = jax.lax.bitcast_convert_type(
            pltpu.prng_random_bits(scores.shape), jnp.uint32
        )
        exps = jnp.where(random_bits < threshold, exps, 0.0)
        probabilities = (exps / (total * keep_prob)).astype(v.dtype)
        context = jax.lax.dot_general(
            probabilities, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out_ref[0, :, lo:hi] = context.astype(out_ref.dtype)


def _dropout_mask_kernel(seed_ref, out_ref, *, heads):
    """Regenerates one head's dropout draws for the backward pass: identical
    seeding and draw shape to ``_attention_dropout_kernel``, so the bit stream
    matches the forward exactly."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * heads + pl.program_id(1), seed_ref[1])
    out_ref[0, 0] = jax.lax.bitcast_convert_type(
        pltpu.prng_random_bits(out_ref.shape[2:]), jnp.uint32
    )


def _dropout_mask_bits(seeds, batch, heads, time, interpret=False):
    """Raw per-(batch, head) dropout draws [B, H, T, T] u32 — compare against
    ``_keep_threshold(rate)`` for the keep mask."""
    return pl.pallas_call(
        functools.partial(_dropout_mask_kernel, heads=heads),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, heads),
            in_specs=[],
            out_specs=pl.BlockSpec(
                (1, 1, time, time), lambda b, h, seed_ref: (b, h, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((batch, heads, time, time), jnp.uint32),
        interpret=interpret,
    )(seeds)


def _attention_dropout_bwd_kernel(
    seed_ref,
    bias_ref,
    q_ref,
    k_ref,
    v_ref,
    g_ref,
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    heads,
    head_dim,
    total_heads,
    sm_scale,
    rate,
):
    """Fused attention-dropout backward: per (batch, head-block) cell, computes
    dq/dk/dv with the dropout mask regenerated in VMEM.

    The einsum vjp materializes the [B, H, T, T] logits, weights, mask, and two
    gradient tensors in HBM (~1 GB/layer at the flagship training shape); here
    every [T, T] tile lives in VMEM and HBM sees only the narrow [T, hd] q/k/v/g
    reads and dq/dk/dv writes. Seeding matches the forward
    (``seed0 + b * total_heads + global_head``), so the mask is bit-identical.

    Math (out = (m/keep ∘ softmax(s)) @ v, s = q kᵀ sm_scale):
        dv = (m/keep ∘ p)ᵀ @ g
        dp = m/keep ∘ (g @ vᵀ)
        ds = p ∘ (dp − ⟨dp, p⟩_row)          (softmax vjp)
        dq = ds @ k · sm_scale,  dk = dsᵀ @ q · sm_scale
    Padded keys have p = 0 and ds = 0, so their dk/dv rows vanish exactly.

    ``rate=None`` compiles the dropout-free variant (identity mask, no PRNG
    ops) — the backward of the plain ``oneshot_attention``."""
    bias = bias_ref[0] * _LOG2E
    if rate is not None:
        threshold = _keep_threshold(rate)
        inverse_keep = np.float32(2**32 / float(threshold))
    batch_index = pl.program_id(0)
    head_block = pl.program_id(1)
    for head in range(heads):
        lo = head * head_dim
        hi = lo + head_dim
        q = q_ref[0, :, lo:hi]
        k = k_ref[0, :, lo:hi]
        v = v_ref[0, :, lo:hi]
        g = g_ref[0, :, lo:hi]
        scores = jax.lax.dot_general(
            q * np.float32(sm_scale * _LOG2E),
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        peak = jnp.max(scores + bias, axis=-1, keepdims=True)
        exps = jnp.exp2(scores - peak + bias)
        total = jnp.maximum(jnp.sum(exps, axis=-1, keepdims=True), _TINY_TOTAL)
        probabilities = exps / total
        if rate is not None:
            global_head = head_block * heads + head
            pltpu.prng_seed(seed_ref[0] + batch_index * total_heads + global_head, seed_ref[1])
            random_bits = jax.lax.bitcast_convert_type(
                pltpu.prng_random_bits(scores.shape), jnp.uint32
            )
            mask_scale = jnp.where(random_bits < threshold, inverse_keep, 0.0)
            dropped = (probabilities * mask_scale).astype(g.dtype)
        else:
            dropped = probabilities.astype(g.dtype)
        # dv[t_k, d] = sum_tq dropped[tq, tk] g[tq, d]
        d_value = jax.lax.dot_general(
            dropped, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_ref[0, :, lo:hi] = d_value.astype(dv_ref.dtype)
        # dp[tq, tk] = mask_scale * (g @ v^T)
        d_probabilities = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if rate is not None:
            d_probabilities = d_probabilities * mask_scale
        row = jnp.sum(d_probabilities * probabilities, axis=-1, keepdims=True)
        d_scores = (probabilities * (d_probabilities - row)).astype(q.dtype)
        d_query = jax.lax.dot_general(
            d_scores, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, :, lo:hi] = (d_query * np.float32(sm_scale)).astype(dq_ref.dtype)
        d_key = jax.lax.dot_general(
            d_scores, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_ref[0, :, lo:hi] = (d_key * np.float32(sm_scale)).astype(dk_ref.dtype)


# Heads per backward grid cell: 2 x head_dim=64 keeps block widths lane-legal
# (128-divisible) on real TPUs.
_BWD_HEADS_PER_BLOCK = 2
# Scoped-VMEM budget for the backward kernel's fit model: ~6 live f32 [T, T]
# tiles (scores/exps/probabilities/bits/mask/d_probabilities, some aliased by
# Mosaic) plus the double-buffered narrow io tiles.
_DROPOUT_BWD_VMEM_BUDGET = 12_500_000


def _bwd_kernel_supported(heads: int, head_dim: int, time: int, item_bytes: int) -> bool:
    if heads % _BWD_HEADS_PER_BLOCK:
        return False
    if (_BWD_HEADS_PER_BLOCK * head_dim) % 128:
        return False
    io_bytes = 2 * 8 * time * _BWD_HEADS_PER_BLOCK * head_dim * item_bytes
    scratch_bytes = 6 * time * time * 4
    return io_bytes + scratch_bytes <= _DROPOUT_BWD_VMEM_BUDGET


def _oneshot_dropout_backward(
    query, key, value, cotangent, key_bias, seeds, sm_scale, heads, rate
):
    """Runs the fused backward kernel (``rate=None`` = no dropout); caller
    checks ``_bwd_kernel_supported``."""
    batch, time, model_dim = query.shape
    head_dim = model_dim // heads
    key_bias = key_bias[:, None, :]
    heads_per_block = _BWD_HEADS_PER_BLOCK
    bias_spec = pl.BlockSpec((1, 1, time), lambda b, h, seeds: (b, 0, 0), memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec(
        (1, time, heads_per_block * head_dim),
        lambda b, h, seeds: (b, 0, h),
        memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(
        _attention_dropout_bwd_kernel,
        heads=heads_per_block,
        head_dim=head_dim,
        total_heads=heads,
        sm_scale=np.float32(sm_scale),
        rate=rate,
    )
    shape = jax.ShapeDtypeStruct(query.shape, query.dtype)
    with _kernel_precision_scope(query.dtype):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(batch, heads // heads_per_block),
                in_specs=[bias_spec, tile_spec, tile_spec, tile_spec, tile_spec],
                out_specs=[tile_spec, tile_spec, tile_spec],
            ),
            out_shape=[shape, shape, shape],
        )(seeds, key_bias, query, key, value, cotangent)


def _attention_kernel(bias_ref, q_ref, k_ref, v_ref, out_ref, *, heads, head_dim, sm_scale):
    # Softmax runs in base 2: folding log2(e) into the scale and bias makes the
    # exp an exp2, which is cheaper on the VPU and bit-equivalent in f32.
    bias = bias_ref[0] * _LOG2E  # [1, T] f32, broadcasts over query rows
    for head in range(heads):
        lo = head * head_dim
        hi = lo + head_dim
        # The softmax scale multiplies the narrow [T, hd] query tile instead of
        # the [T, T] score tile, and the key bias rides the exp2 argument —
        # exp2(s - peak + bias) — so the score tile sees three VPU passes
        # (fused add+max, fused sub/add/exp2, sum) instead of four. The peak is
        # taken over the BIASED scores: an unbiased peak would be mathematically
        # equivalent but lets a garbage padded-key score dominate and underflow
        # every valid key's exp2 (the add fuses into the max reduction, so the
        # pass count is unchanged). Padded keys still flush to exactly 0:
        # s - peak is bounded while bias is -1e9 * log2e.
        q = q_ref[0, :, lo:hi] * np.float32(sm_scale * _LOG2E)
        k = k_ref[0, :, lo:hi]
        v = v_ref[0, :, lo:hi]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        peak = jnp.max(scores + bias, axis=-1, keepdims=True)
        exps = jnp.exp2(scores - peak + bias)
        # Clamp guards the 0/0 = NaN corner; a fully-padded row (zero-length
        # batch element) normalizes around its own biased peak and yields the
        # einsum path's uniform garbage average. Downstream length masks drop
        # those frames either way.
        total = jnp.maximum(jnp.sum(exps, axis=-1, keepdims=True), _TINY_TOTAL)
        # Normalization happens on the weight tile here (unlike the query-blocked
        # kernel below): deferring it past the matmul keeps ``total`` and an f32
        # context temp live across the dot, which overflows the 16 MB scoped-VMEM
        # stack at [B=128, T=512] — and this whole-T kernel is MXU-bound anyway.
        probabilities = (exps / total).astype(v.dtype)
        context = jax.lax.dot_general(
            probabilities, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out_ref[0, :, lo:hi] = context.astype(out_ref.dtype)


def _qblock_attention_kernel(bias_ref, q_ref, k_ref, v_ref, out_ref, *, heads, head_dim, sm_scale):
    """One query block x full key axis per cell: exact softmax, no rescaling."""
    bias = bias_ref[0] * _LOG2E  # [1, T]
    for head in range(heads):
        lo = head * head_dim
        hi = lo + head_dim
        # Scale on the narrow q tile + bias folded into the exp2 argument with
        # a BIASED peak — one fewer full VPU pass over the [Tq, T] score
        # tile (see _attention_kernel).
        q = q_ref[0, :, lo:hi] * np.float32(sm_scale * _LOG2E)  # [Tq, hd]
        k = k_ref[0, :, lo:hi]  # [T, hd]
        v = v_ref[0, :, lo:hi]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        peak = jnp.max(scores + bias, axis=-1, keepdims=True)
        exps = jnp.exp2(scores - peak + bias)
        total = jnp.maximum(jnp.sum(exps, axis=-1, keepdims=True), _TINY_TOTAL)
        # Normalization deferred past the context matmul: it then runs over the
        # narrow [Tq, hd] context instead of the [Tq, T] weight tile (measured
        # -11% kernel time at T=2560). exp2 outputs are in (0, 1], safely
        # representable in bf16.
        weights = exps.astype(v.dtype)
        context = jax.lax.dot_general(
            weights, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        out_ref[0, :, lo:hi] = (context * (1.0 / total)).astype(out_ref.dtype)


def _oneshot_forward(query, key, value, key_bias, sm_scale, heads, interpret=False):
    """query/key/value: [B, T, H*hd] (T a multiple of 128), key_bias: [B, T] f32."""
    batch, time, model_dim = query.shape
    key_bias = key_bias[:, None, :]  # [B, 1, T]: blocks need >=2 trailing dims
    head_dim = model_dim // heads
    plan = plan_oneshot(heads, head_dim, time, query.dtype.itemsize, strict_lanes=not interpret)
    if plan is None:
        raise ValueError(
            f"No legal one-shot attention configuration for heads={heads},"
            f" head_dim={head_dim}, padded_time={time}; route through the flash"
            " kernel instead (ops/attention.py does this automatically)"
        )
    mode, parameters = plan
    if mode == "full":
        grid: tuple = (batch,)
        bias_spec = pl.BlockSpec((1, 1, time), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
        qkv_spec = pl.BlockSpec(
            (1, time, model_dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        )
        kernel = functools.partial(
            _attention_kernel, heads=heads, head_dim=head_dim, sm_scale=np.float32(sm_scale)
        )
        in_specs = [bias_spec, qkv_spec, qkv_spec, qkv_spec]
        out_spec = qkv_spec
    elif mode == "headblock":
        # Long utterances: block the head dimension so one [T, T] score tile at
        # a time fits in VMEM alongside narrow [T, hb*hd] q/k/v tiles.
        heads_per_block = parameters
        grid = (batch, heads // heads_per_block)
        bias_spec = pl.BlockSpec((1, 1, time), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM)
        qkv_spec = pl.BlockSpec(
            (1, time, heads_per_block * head_dim),
            lambda b, h: (b, 0, h),
            memory_space=pltpu.VMEM,
        )
        kernel = functools.partial(
            _attention_kernel,
            heads=heads_per_block,
            head_dim=head_dim,
            sm_scale=np.float32(sm_scale),
        )
        in_specs = [bias_spec, qkv_spec, qkv_spec, qkv_spec]
        out_spec = qkv_spec
    else:
        # Very long utterances: block the query axis too. Scores stay [Tq, T]
        # with the whole key axis resident, keeping the softmax single-pass.
        # (heads_per_block, query_block) picked by the plan_oneshot VMEM fit
        # model calibrated on-device at T=2560. More heads per cell amortizes
        # the k/v DMA (reused across consecutive query blocks); measured -14%
        # kernel time for (4, 256) over (2, 256) at T=2560.
        heads_per_block, query_block = parameters
        grid = (batch, heads // heads_per_block, time // query_block)
        bias_spec = pl.BlockSpec(
            (1, 1, time), lambda b, h, qb: (b, 0, 0), memory_space=pltpu.VMEM
        )
        q_spec = pl.BlockSpec(
            (1, query_block, heads_per_block * head_dim),
            lambda b, h, qb: (b, qb, h),
            memory_space=pltpu.VMEM,
        )
        kv_spec = pl.BlockSpec(
            (1, time, heads_per_block * head_dim),
            lambda b, h, qb: (b, 0, h),
            memory_space=pltpu.VMEM,
        )
        kernel = functools.partial(
            _qblock_attention_kernel,
            heads=heads_per_block,
            head_dim=head_dim,
            sm_scale=np.float32(sm_scale),
        )
        in_specs = [bias_spec, q_spec, kv_spec, kv_spec]
        out_spec = q_spec
    with _kernel_precision_scope(query.dtype):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(query.shape, query.dtype),
            interpret=interpret,
        )(key_bias, query, key, value)


def _oneshot_dropout_forward(query, key, value, key_bias, seeds, sm_scale, heads, rate):
    """Full-tile attention with in-kernel weight dropout (see
    ``_attention_dropout_kernel``); only the "full" plan supports dropout —
    longer sequences fall back to the einsum path in ops/attention.py."""
    batch, time, model_dim = query.shape
    key_bias = key_bias[:, None, :]
    head_dim = model_dim // heads
    plan = plan_oneshot_dropout(heads, head_dim, time, query.dtype.itemsize)
    if plan is None:
        raise ValueError(
            f"No legal in-kernel dropout configuration for heads={heads},"
            f" head_dim={head_dim}, padded_time={time},"
            f" itemsize={query.dtype.itemsize} (requires the full one-shot plan"
            " within the dropout VMEM budget); route through the einsum path"
            " instead (ops/attention.py does this automatically)"
        )
    bias_spec = pl.BlockSpec((1, 1, time), lambda b, seeds: (b, 0, 0), memory_space=pltpu.VMEM)
    qkv_spec = pl.BlockSpec(
        (1, time, model_dim), lambda b, seeds: (b, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _attention_dropout_kernel,
        heads=heads,
        head_dim=head_dim,
        sm_scale=np.float32(sm_scale),
        rate=rate,
    )
    with _kernel_precision_scope(query.dtype):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(batch,),
                in_specs=[bias_spec, qkv_spec, qkv_spec, qkv_spec],
                out_specs=qkv_spec,
            ),
            out_shape=jax.ShapeDtypeStruct(query.shape, query.dtype),
        )(seeds, key_bias, query, key, value)


def _reference_bthd_dropout(query, key, value, key_bias, keep_mask, sm_scale, heads, rate):
    """Differentiable einsum formulation of attention-with-weight-dropout: the
    backward consumes the keep mask regenerated from the forward's seeds."""
    batch, time, model_dim = query.shape
    head_dim = model_dim // heads
    shape = (batch, time, heads, head_dim)
    logits = jnp.einsum(
        "bthd,bshd->bhts",
        query.reshape(shape) * sm_scale,
        key.reshape(shape),
        preferred_element_type=jnp.float32,
    )
    logits = logits + key_bias[:, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1)
    keep_prob = float(_keep_threshold(rate)) / 2**32
    weights = jnp.where(keep_mask, weights * (1.0 / keep_prob), 0.0).astype(query.dtype)
    context = jnp.einsum("bhts,bshd->bthd", weights, value.reshape(shape))
    return context.reshape(batch, time, model_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def oneshot_dropout_attention(query, key, value, key_bias, seeds, sm_scale, heads, rate):
    """[B, T, H*hd] attention with in-kernel weight dropout; T must be
    128-aligned and within the full one-shot plan. ``seeds`` is an i32[2]
    array; the mask is a pure function of (seeds, batch, head), letting the
    backward regenerate it instead of materializing it in the forward."""
    return _oneshot_dropout_forward(query, key, value, key_bias, seeds, sm_scale, heads, rate)


def _oneshot_dropout_fwd(query, key, value, key_bias, seeds, sm_scale, heads, rate):
    out = _oneshot_dropout_forward(query, key, value, key_bias, seeds, sm_scale, heads, rate)
    return out, (query, key, value, key_bias, seeds)


def _oneshot_dropout_bwd(sm_scale, heads, rate, residuals, cotangent):
    query, key, value, key_bias, seeds = residuals
    batch, time, model_dim = query.shape
    head_dim = model_dim // heads
    if _bwd_kernel_supported(heads, head_dim, time, query.dtype.itemsize):
        d_query, d_key, d_value = _oneshot_dropout_backward(
            query, key, value, cotangent, key_bias, seeds, sm_scale, heads, rate
        )
        return d_query, d_key, d_value, None, None
    # Odd head counts / lane-illegal widths: regenerate the mask into HBM and
    # differentiate the einsum formulation instead.
    bits = _dropout_mask_bits(seeds, batch, heads, time)
    keep_mask = bits < _keep_threshold(rate)
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_bthd_dropout(
            q, k, v, key_bias, keep_mask, sm_scale, heads, rate
        ),
        query,
        key,
        value,
    )
    d_query, d_key, d_value = vjp(cotangent)
    return d_query, d_key, d_value, None, None


oneshot_dropout_attention.defvjp(_oneshot_dropout_fwd, _oneshot_dropout_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def oneshot_attention(query, key, value, key_bias, sm_scale, heads):
    """[B, T, H*hd] attention with additive key bias; T must be 128-aligned."""
    return _oneshot_forward(query, key, value, key_bias, sm_scale, heads)


def _reference_bthd(query, key, value, key_bias, sm_scale, heads):
    """The differentiable formulation the backward pass uses (einsum over
    [B, T, H, hd] views; numerically the same math as the kernel)."""
    batch, time, model_dim = query.shape
    head_dim = model_dim // heads
    shape = (batch, time, heads, head_dim)
    logits = jnp.einsum(
        "bthd,bshd->bhts",
        query.reshape(shape) * sm_scale,
        key.reshape(shape),
        preferred_element_type=jnp.float32,
    )
    logits = logits + key_bias[:, None, None, :]
    weights = jax.nn.softmax(logits, axis=-1).astype(query.dtype)
    context = jnp.einsum("bhts,bshd->bthd", weights, value.reshape(shape))
    return context.reshape(batch, time, model_dim)


def _oneshot_fwd(query, key, value, key_bias, sm_scale, heads):
    return oneshot_attention(query, key, value, key_bias, sm_scale, heads), (
        query,
        key,
        value,
        key_bias,
    )


# Above this per-tensor score size (f32 [B, H, T, T]) the einsum backward's two
# materialized weight tensors dominate HBM; the flash kernel's tiled backward
# takes over. The flagship remat config (B=64, H=16, T=512: ~1 GiB) stays on
# the faster einsum path.
_EINSUM_BACKWARD_SCORE_BYTES = 2 << 30


def _flash_bthd(query, key, value, key_bias, sm_scale, heads):
    """Differentiable flash-attention formulation over the kernel's [B, T, H*hd]
    layout; backward never materializes [B, H, T, T] (used for long-sequence
    training where the einsum backward would)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds, flash_attention

    batch, time, model_dim = query.shape
    head_dim = model_dim // heads
    shape = (batch, time, heads, head_dim)
    q = jnp.transpose(query.reshape(shape), (0, 2, 1, 3))
    k = jnp.transpose(key.reshape(shape), (0, 2, 1, 3))
    v = jnp.transpose(value.reshape(shape), (0, 2, 1, 3))
    # The additive key bias is 0 (valid) / NEG_INF (padded); flash expresses the
    # same mask as mismatched segment ids.
    segments = jnp.where(key_bias > NEG_INF / 2, 1, 2).astype(jnp.int32)
    with _kernel_precision_scope(query.dtype):
        out = flash_attention(
            q, k, v, segment_ids=SegmentIds(segments, segments), sm_scale=sm_scale
        )
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(batch, time, model_dim)


def _oneshot_bwd(sm_scale, heads, residuals, cotangent):
    query, key, value, key_bias = residuals
    batch, time, model_dim = query.shape
    head_dim = model_dim // heads
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if on_tpu and _bwd_kernel_supported(heads, head_dim, time, query.dtype.itemsize):
        # Fused Pallas backward: every [T, T] tile stays in VMEM (the seeds are
        # unused in the dropout-free variant).
        d_query, d_key, d_value = _oneshot_dropout_backward(
            query,
            key,
            value,
            cotangent,
            key_bias,
            jnp.zeros((2,), jnp.int32),
            sm_scale,
            heads,
            rate=None,
        )
        return d_query, d_key, d_value, None
    score_bytes = 4 * batch * heads * time * time
    use_flash = score_bytes > _EINSUM_BACKWARD_SCORE_BYTES and on_tpu
    formulation = _flash_bthd if use_flash else _reference_bthd
    _, vjp = jax.vjp(
        lambda q, k, v: formulation(q, k, v, key_bias, sm_scale, heads), query, key, value
    )
    d_query, d_key, d_value = vjp(cotangent)
    return d_query, d_key, d_value, None


oneshot_attention.defvjp(_oneshot_fwd, _oneshot_bwd)
