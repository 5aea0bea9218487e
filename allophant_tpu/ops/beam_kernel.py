"""Single-kernel Pallas CTC prefix beam search.

The ``lax.scan`` formulation (``ops/decode.py:beam_search_padded``) executes
~30 small XLA ops per time step on tiny [B, K, C] tensors; at T≈500 steps the
per-op fixed cost dominates the whole search (the tensors are a few hundred KB
— far below what saturates the VPU). This kernel runs the entire search inside
one ``pallas_call``: a grid over batch blocks, a ``fori_loop`` over time with
all beam state resident in VMEM, every per-step tensor a single [b, K*C] tile.
The reference decodes through flashlight's C++ beam search one utterance at a
time on the host (predictions.py:210-226); here both scoring and search state
never leave the chip.

Semantics are IDENTICAL to ``beam_search_padded`` (same sort-free pairwise
rolling-hash merge, same flashlight-style best-representative backpointers,
same stable tie-break order) — ``tests/test_ops.py`` asserts integer-exact
agreement between the two. The candidate lane layout is k-major
(``lane = k * C + c``) to match the scan version's ``top_k``-over-flattened
order, so ties resolve identically.

Outputs pack (parent, token) into one int32 per (t, b, k) —
``parent * 2^16 + token + 1`` — halving the per-step VMEM stores; the wrapper
unpacks to the (parents, emitted, scores) contract of ``beam_search_padded``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from allophant_tpu.ops.decode import _HASH_P1, _HASH_P2, _NEG_INF

# Emissions VMEM budget for one grid cell (double-buffered by Mosaic); the
# block row count shrinks until the [b, T, C_pad] f32 block fits.
_EMISSIONS_VMEM_BUDGET = 6 * 1024 * 1024
_PACK_BASE = 1 << 16


def _beam_kernel(
    lengths_ref,
    emissions_ref,
    packed_ref,
    scores_ref,
    *,
    time: int,
    classes: int,
    k_beams: int,
    blank: int,
    block_rows: int,
):
    b = block_rows
    lanes = k_beams * classes
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, lanes), 1)
    k_idx = lane // classes
    c_idx = lane - k_idx * classes
    blank_col = c_idx == blank
    class_iota = jax.lax.broadcasted_iota(jnp.int32, (b, classes), 1)
    # Lengths ride in SMEM (scalar prefetch): a [b, 1] VMEM block would need
    # b % 8 == 0, which the single-row plan for large class counts violates.
    base_row = pl.program_id(0) * b
    lengths = jnp.concatenate(
        [jnp.full((1, 1), lengths_ref[base_row + i], jnp.int32) for i in range(b)],
        axis=0,
    )  # [b, 1] i32
    neg_inf = np.float32(_NEG_INF)

    def per_k(field, extract):
        """Selects ``extract(k)`` ([b, 1]) into lanes where ``field == k``."""
        out = extract(0)
        for k in range(1, k_beams):
            out = jnp.where(field == k, extract(k), out)
        return out

    def body(t, state):
        hash1, hash2, last, logp_b, logp_nb = state  # each [b, K]
        emissions = emissions_ref[:, pl.ds(t, 1), :].reshape(b, classes)

        total = jnp.logaddexp(logp_b, logp_nb)  # [b, K]
        # Masks that get SELECTED (carried through per_k or take) live as i32:
        # Mosaic cannot lower select on i1 vector values (i8->i1 trunci);
        # ephemeral where-conditions are formed via != 0 at the point of use.
        alive = (total > neg_inf / 2).astype(jnp.int32)

        blank_emission = emissions[:, blank : blank + 1]  # [b, 1]
        # stay_nb needs each beam's last-token emission: a masked-sum gather
        # over the class axis per beam slot.
        stay_b_cols = []
        stay_nb_cols = []
        stay_total_cols = []
        for k in range(k_beams):
            last_k = last[:, k : k + 1]
            last_emission = jnp.sum(
                jnp.where(class_iota == last_k, emissions, 0.0), axis=-1, keepdims=True
            )
            last_emission = jnp.where(last_k >= 0, last_emission, neg_inf)
            stay_b_cols.append(total[:, k : k + 1] + blank_emission)
            stay_nb_cols.append(logp_nb[:, k : k + 1] + last_emission)
            stay_total_cols.append(jnp.logaddexp(stay_b_cols[k], stay_nb_cols[k]))

        # Per-lane views of each source beam's state (k-major lanes).
        total_lane = per_k(k_idx, lambda k: total[:, k : k + 1])
        logp_b_lane = per_k(k_idx, lambda k: logp_b[:, k : k + 1])
        last_lane = per_k(k_idx, lambda k: last[:, k : k + 1])
        h1_lane = per_k(k_idx, lambda k: hash1[:, k : k + 1])
        h2_lane = per_k(k_idx, lambda k: hash2[:, k : k + 1])
        alive_lane = per_k(k_idx, lambda k: alive[:, k : k + 1])

        emissions_lane = jnp.concatenate([emissions] * k_beams, axis=-1)  # [b, K*C]
        is_repeat = c_idx == last_lane
        ext_nb = jnp.where(is_repeat, logp_b_lane, total_lane) + emissions_lane
        ext_h1 = h1_lane * _HASH_P1 + (c_idx + 1)
        ext_h2 = h2_lane * _HASH_P2 + (c_idx + 1)

        # Pairwise merge detection: extension (k1, c) collides with stay (k2)
        # iff hashes agree; at most one k2 matches each lane (see
        # beam_search_padded's docstring), so plain selects accumulate the
        # matched stay's fields.
        ext_matched = jnp.zeros((b, lanes), jnp.int32)
        matched_stay_b = jnp.full((b, lanes), neg_inf)
        matched_stay_nb = jnp.full((b, lanes), neg_inf)
        matched_stay_total = jnp.full((b, lanes), neg_inf)
        matched_slot = jnp.zeros((b, lanes), jnp.int32)
        stay_consumed = []
        for k2 in range(k_beams):
            match = (
                (ext_h1 == hash1[:, k2 : k2 + 1])
                & (ext_h2 == hash2[:, k2 : k2 + 1])
                & (alive[:, k2 : k2 + 1] != 0)
                & (alive_lane != 0)
                & ~blank_col
            )
            ext_matched = jnp.where(match, 1, ext_matched)
            matched_stay_b = jnp.where(match, stay_b_cols[k2], matched_stay_b)
            matched_stay_nb = jnp.where(match, stay_nb_cols[k2], matched_stay_nb)
            matched_stay_total = jnp.where(match, stay_total_cols[k2], matched_stay_total)
            matched_slot = jnp.where(match, k2, matched_slot)
            stay_consumed.append(
                jnp.max(match.astype(jnp.int32), axis=-1, keepdims=True)
            )  # [b, 1] i32

        is_matched = ext_matched != 0
        merged_nb = jnp.where(is_matched, jnp.logaddexp(ext_nb, matched_stay_nb), ext_nb)
        merged_b = jnp.where(is_matched, matched_stay_b, neg_inf)
        # The merged pair's representative: its best-scoring pre-merge candidate
        # (flashlight keeps the best candidate's backpointers).
        ext_is_rep = jnp.where(
            ~is_matched | (ext_nb >= matched_stay_total), 1, 0
        ).astype(jnp.int32)

        stay_consumed_lane = per_k(k_idx, lambda k: stay_consumed[k])
        stay_b_lane = per_k(k_idx, lambda k: stay_b_cols[k])
        stay_nb_lane = per_k(k_idx, lambda k: stay_nb_cols[k])
        cand_b = jnp.where(
            blank_col, jnp.where(stay_consumed_lane != 0, neg_inf, stay_b_lane), merged_b
        )
        cand_nb = jnp.where(
            blank_col, jnp.where(stay_consumed_lane != 0, neg_inf, stay_nb_lane), merged_nb
        )
        cand_total = jnp.logaddexp(cand_b, cand_nb)

        # Top-K selection: K rounds of (row max, lowest-lane tie-break, mask).
        # Lane order is k-major, so ties resolve exactly like the scan
        # version's top_k over the flattened [K, C] grid.
        active = t < lengths  # [b, 1] bool
        remaining = cand_total
        new_columns = {"h1": [], "h2": [], "last": [], "b": [], "nb": []}
        packed_cols = []
        for slot in range(k_beams):
            best = jnp.max(remaining, axis=-1, keepdims=True)
            idx = jnp.min(
                jnp.where(remaining == best, lane, lanes), axis=-1, keepdims=True
            )
            remaining = jnp.where(lane == idx, -jnp.inf, remaining)
            chosen = lane == idx  # [b, lanes], one lane per row

            def take(values, fill=0):
                return jnp.sum(jnp.where(chosen, values, fill), axis=-1, keepdims=True)

            parent = idx // classes
            token = idx - parent * classes
            is_stay = token == blank
            dead = best <= neg_inf / 2
            slot_b = jnp.where(dead, neg_inf, take(cand_b))
            slot_nb = jnp.where(dead, neg_inf, take(cand_nb))
            parent_h1 = per_k(parent, lambda k: hash1[:, k : k + 1])
            parent_h2 = per_k(parent, lambda k: hash2[:, k : k + 1])
            parent_last = per_k(parent, lambda k: last[:, k : k + 1])
            slot_h1 = jnp.where(is_stay, parent_h1, take(ext_h1))
            slot_h2 = jnp.where(is_stay, parent_h2, take(ext_h2))
            slot_last = jnp.where(is_stay, parent_last, token)

            chosen_is_rep = take(ext_is_rep) > 0
            rep_parent = jnp.where(is_stay | chosen_is_rep, parent, take(matched_slot))
            emit = ~is_stay & chosen_is_rep

            out_parent = jnp.where(active, rep_parent, slot)
            out_token = jnp.where(active & emit, token, -1)
            packed_cols.append(out_parent * _PACK_BASE + (out_token + 1))

            new_columns["h1"].append(jnp.where(active, slot_h1, hash1[:, slot : slot + 1]))
            new_columns["h2"].append(jnp.where(active, slot_h2, hash2[:, slot : slot + 1]))
            new_columns["last"].append(jnp.where(active, slot_last, last[:, slot : slot + 1]))
            new_columns["b"].append(jnp.where(active, slot_b, logp_b[:, slot : slot + 1]))
            new_columns["nb"].append(jnp.where(active, slot_nb, logp_nb[:, slot : slot + 1]))

        packed = jnp.concatenate(packed_cols, axis=-1)  # [b, K] i32
        packed_ref[:, pl.ds(t, 1), :] = packed[:, None, :]
        return (
            jnp.concatenate(new_columns["h1"], axis=-1),
            jnp.concatenate(new_columns["h2"], axis=-1),
            jnp.concatenate(new_columns["last"], axis=-1),
            jnp.concatenate(new_columns["b"], axis=-1),
            jnp.concatenate(new_columns["nb"], axis=-1),
        )

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (b, k_beams), 1)
    init = (
        jnp.ones((b, k_beams), jnp.int32),
        jnp.ones((b, k_beams), jnp.int32),
        jnp.full((b, k_beams), -1, jnp.int32),
        # Slot 0 holds the live empty prefix; .at[].set would be a scatter,
        # which Mosaic does not lower.
        jnp.where(slot_iota == 0, 0.0, neg_inf),
        jnp.full((b, k_beams), neg_inf),
    )
    final = jax.lax.fori_loop(0, time, body, init)
    _h1, _h2, _last, logp_b, logp_nb = final
    scores_ref[...] = jnp.logaddexp(logp_b, logp_nb)[:, None, :]


def plan_beam_kernel(batch: int, time: int, classes: int) -> int | None:
    """Block row count for the beam kernel, or None when no block fits the
    emissions VMEM budget (callers fall back to the ``lax.scan`` search)."""
    for block_rows in (8, 4, 2, 1):
        if batch % block_rows:
            continue
        padded_classes = ((classes + 127) // 128) * 128
        if block_rows * time * padded_classes * 4 <= _EMISSIONS_VMEM_BUDGET:
            return block_rows
    return None


@functools.partial(
    jax.jit, static_argnames=("beam_width", "blank_index", "block_rows", "interpret")
)
def beam_search_padded_pallas(
    log_emissions: jnp.ndarray,
    lengths: jnp.ndarray,
    beam_width: int = 4,
    blank_index: int = 0,
    block_rows: int | None = None,
    interpret: bool = False,
):
    """Drop-in kernel version of ``beam_search_padded``: [B, T, C] log
    probabilities + [B] lengths -> (parents [T, B, K], emitted [T, B, K],
    scores [B, K]), integer-exact against the scan implementation."""
    batch, time, classes = log_emissions.shape
    if block_rows is None:
        block_rows = plan_beam_kernel(batch, time, classes)
        if block_rows is None:
            raise ValueError(
                f"no beam-kernel block fits VMEM for batch={batch}, time={time},"
                f" classes={classes}; use beam_search_padded instead"
            )
    kernel = functools.partial(
        _beam_kernel,
        time=time,
        classes=classes,
        k_beams=beam_width,
        blank=blank_index,
        block_rows=block_rows,
    )
    packed, scores = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch // block_rows,),
            in_specs=[
                pl.BlockSpec((block_rows, time, classes), lambda i, lengths: (i, 0, 0)),
            ],
            # Outputs keep the blocked batch dim LEADING: Pallas restricts the
            # last two block dims (divisible by 8/128 or full), which a
            # one-row block would violate in [T, b, K] layout.
            out_specs=[
                pl.BlockSpec((block_rows, time, beam_width), lambda i, lengths: (i, 0, 0)),
                pl.BlockSpec((block_rows, 1, beam_width), lambda i, lengths: (i, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((batch, time, beam_width), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1, beam_width), jnp.float32),
        ],
        interpret=interpret,
    )(
        lengths.astype(jnp.int32),
        log_emissions.astype(jnp.float32),
    )
    packed = jnp.transpose(packed, (1, 0, 2))  # -> [T, B, K], the scan contract
    parents = packed // _PACK_BASE
    emitted = packed - parents * _PACK_BASE - 1
    return parents, emitted, scores[:, 0, :]
