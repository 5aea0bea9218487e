"""AOT serving export: the transcription step as a serialized StableHLO artifact.

Production deployments should not need Python tracing, flax, or the checkpoint
pipeline on the serving host. ``export_transcriber`` ahead-of-time lowers the
full prediction program — acoustic encoder, every classifier head, optionally
on-device greedy CTC decoding — with the model weights baked in as constants,
and serializes it via ``jax.export`` (StableHLO). The artifact is loadable with
``load_transcriber`` into a plain callable, with no dependency on this package's
model code; shapes are static per artifact (TPU-friendly — export one artifact
per serving bucket, exactly like the bucketed jit cache the live path uses).

The reference has no serving story beyond its Python predict loop
(reference run.py:571-822); this is new, TPU-native surface.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def make_serving_fn(estimator, decode: str = "greedy"):
    """A pure transcription function closed over the estimator's weights.

    ``decode="greedy"``: returns ``({head: (tokens [B, T'], counts [B])}, lengths)``
    with blank-free, collapse-deduplicated token ids per head (ids offset by the
    CTC blank as in the live predict path). ``decode="log_probs"``: returns
    ``({head: log_probs [B, T', C]}, lengths)`` for host-side decoding.
    ``decode="beam"`` (optionally ``"beam<width>"``, e.g. ``"beam8"``): the
    phoneme track through the batched device prefix beam search — returns
    ``(decoded, (parents, emitted, scores), lengths)`` where ``decoded`` holds
    the greedy attribute tracks and the beam triple feeds the same vectorized
    host backtrace the live CLI beam path uses
    (``ops.decode.backtrace_beams``). The scan formulation is exported (not
    the Pallas kernel) so the artifact stays portable across lowering
    platforms.
    """
    beam_width = None
    if decode.startswith("beam"):
        beam_width = int(decode[4:] or 4)
        decode = "beam"
    if decode not in ("greedy", "log_probs", "beam"):
        raise ValueError(f"Unknown decode mode {decode!r} (greedy | log_probs | beam[width])")
    model = estimator.model
    variables = estimator.variables

    def serve(audio, lengths, language_ids):
        from allophant_tpu.ops.decode import beam_search_padded, greedy_decode_logits

        predictions = model.apply(variables, audio, lengths, language_ids, predict=True)
        if decode == "log_probs":
            outputs = {
                name: jax.nn.log_softmax(value.astype(jnp.float32), axis=-1)
                for name, value in predictions.outputs.items()
            }
            return outputs, predictions.lengths
        decoded = {}
        for name, value in predictions.outputs.items():
            if decode == "beam" and name == "phoneme":
                continue
            tokens, _timesteps, counts, _scores = greedy_decode_logits(value, predictions.lengths)
            decoded[name] = (tokens, counts)
        if decode == "beam":
            log_probs = jax.nn.log_softmax(
                predictions.outputs["phoneme"].astype(jnp.float32), axis=-1
            )
            beam = beam_search_padded(log_probs, predictions.lengths, beam_width=beam_width)
            return decoded, beam, predictions.lengths
        return decoded, predictions.lengths

    return serve


def export_transcriber(
    estimator,
    batch_size: int,
    samples: int,
    decode: str = "greedy",
    platforms: Optional[Sequence[str]] = None,
) -> jax_export.Exported:
    """AOT-lowers the serving function at a static [batch_size, samples] shape.

    ``platforms`` defaults to the current backend; pass e.g. ``("tpu", "cpu")``
    to lower a multi-platform artifact when the target differs from this host.
    """
    serve = make_serving_fn(estimator, decode)
    arguments = (
        jax.ShapeDtypeStruct((batch_size, samples), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
        jax.ShapeDtypeStruct((batch_size,), jnp.int32),
    )
    exporter = jax_export.export(
        jax.jit(serve), platforms=list(platforms) if platforms is not None else None
    )
    return exporter(*arguments)


def save_transcriber(exported: jax_export.Exported, path: str) -> None:
    with open(path, "wb") as file:
        file.write(exported.serialize())


def load_transcriber(path: str):
    """Loads a serialized artifact into a jittable callable
    ``(audio [B, T] f32, lengths [B] i32, language_ids [B] i32) -> outputs``.
    Requires only jax on the serving host (no flax, no model code)."""
    with open(path, "rb") as file:
        exported = jax_export.deserialize(file.read())

    def call(audio, lengths, language_ids):
        return exported.call(
            jnp.asarray(np.asarray(audio), jnp.float32),
            jnp.asarray(np.asarray(lengths), jnp.int32),
            jnp.asarray(np.asarray(language_ids), jnp.int32),
        )

    return call
