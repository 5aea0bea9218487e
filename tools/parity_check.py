#!/usr/bin/env python3
"""Parity validation harness against the PyTorch reference.

The rebuild's fidelity target is PER/AER within 0.1% absolute of the published
numbers for the five released checkpoints (BASELINE.md). The released HF
checkpoints and the UCLA / Common Voice corpora are not available in the
build environment, so this tool packages each parity check as a one-command
step for when the artifacts are present:

  activations <hf-wav2vec2-id-or-path>
      Convert the HF torch wav2vec2 encoder and diff every hidden state on
      random audio (the per-layer activation diffing of SURVEY.md §7.3).

  checkpoint <allophant.pt-or-hf-id>
      Restore a released reference checkpoint (torch format) end-to-end into
      the JAX model, print the head inventory, and run a smoke forward.

  error-rates <predictions.jsonl> <reference_results.json> [--tolerance 0.1]
      Evaluate a prediction file with the batched device scorer, compute the
      macro PER/AER (the README math), and compare them to a reference
      results JSON (e.g. interspeech_results/allophant_ucla.json); exits
      non-zero when any shared metric differs by more than the tolerance (in
      absolute percentage points).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def check_activations(model_id: str, seconds: float = 2.0, tolerance: float = 2e-3) -> int:
    import jax.numpy as jnp
    import torch
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model as TorchWav2Vec2

    from allophant_tpu.models.hf_conversion import convert_wav2vec2_state
    from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture, Wav2Vec2Model

    torch_model = TorchWav2Vec2.from_pretrained(model_id, attn_implementation="eager")
    torch_model.eval()
    config = torch_model.config
    arch = Wav2Vec2Architecture.from_hf_config(config)
    arch = Wav2Vec2Architecture(**{**arch.__dict__, "do_normalize": False})

    rng = np.random.default_rng(0)
    samples = int(16_000 * seconds)
    audio = rng.standard_normal((2, samples)).astype(np.float32)
    lengths = np.array([samples, samples * 3 // 4])
    for row, length in enumerate(lengths):
        audio[row, length:] = 0.0
    attention_mask = (np.arange(samples)[None, :] < lengths[:, None]).astype(np.int64)

    with torch.no_grad():
        torch_output = torch_model(
            torch.from_numpy(audio),
            attention_mask=torch.from_numpy(attention_mask),
            output_hidden_states=True,
        )
    torch_hidden = [state.numpy() for state in torch_output.hidden_states]

    state = {key: value.numpy() for key, value in torch_model.state_dict().items()}
    params = convert_wav2vec2_state(state, arch)
    hidden_states, frame_lengths = Wav2Vec2Model(arch).apply(
        {"params": params}, jnp.asarray(audio), jnp.asarray(lengths), deterministic=True
    )

    if len(hidden_states) != len(torch_hidden):
        print(
            f"hidden-state count mismatch: ours {len(hidden_states)} vs torch {len(torch_hidden)}",
            file=sys.stderr,
        )
        return 1

    frame_lengths = np.asarray(frame_lengths)
    frame_mask = np.arange(torch_hidden[0].shape[1])[None, :] < frame_lengths[:, None]
    worst = 0.0
    for layer_id, (ours, theirs) in enumerate(zip(hidden_states, torch_hidden)):
        difference = float(np.abs(np.asarray(ours) - theirs)[frame_mask].max())
        worst = max(worst, difference)
        print(f"layer {layer_id:2d}: max |diff| {difference:.3e}")
    print(f"worst layer diff: {worst:.3e} (tolerance {tolerance:.0e})")
    return 0 if worst <= tolerance else 1


def check_fullsize(seconds: float = 2.0, tolerance: float = 5e-3) -> int:
    """Full-size (XLS-R 300m: 24 layers x 1024 dims) HF<->flax activation diff on
    *random* weights, in f32 and bf16. No released checkpoint is needed: random
    weights exercise the identical computation graph, so the recorded worst-layer
    drift is the number that predicts PER slippage at depth (SURVEY.md §7.3).
    The f32 run must stay within ``tolerance``; the bf16 run is reported as the
    expected serving-precision envelope (not gated)."""
    import jax.numpy as jnp
    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model as TorchWav2Vec2

    from allophant_tpu.models.hf_conversion import convert_wav2vec2_state
    from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture, Wav2Vec2Model

    hf_config = HFConfig(
        hidden_size=1024,
        num_hidden_layers=24,
        num_attention_heads=16,
        intermediate_size=4096,
        conv_dim=(512,) * 7,
        conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2),
        conv_bias=True,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        num_conv_pos_embeddings=128,
        num_conv_pos_embedding_groups=16,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    torch_model = TorchWav2Vec2(hf_config).eval()
    arch = Wav2Vec2Architecture.from_hf_config(hf_config)
    arch = Wav2Vec2Architecture(**{**arch.__dict__, "do_normalize": False})

    rng = np.random.default_rng(0)
    samples = int(16_000 * seconds)
    audio = rng.standard_normal((2, samples)).astype(np.float32)
    lengths = np.array([samples, samples * 3 // 4])
    for row, length in enumerate(lengths):
        audio[row, length:] = 0.0
    attention_mask = (np.arange(samples)[None, :] < lengths[:, None]).astype(np.int64)

    def torch_forward(model) -> list:
        with torch.no_grad():
            return [
                state.float().numpy()
                for state in model(
                    torch.from_numpy(audio).to(next(model.parameters()).dtype),
                    attention_mask=torch.from_numpy(attention_mask),
                    output_hidden_states=True,
                ).hidden_states
            ]

    torch_hidden = torch_forward(torch_model)
    # Float64 ground truth: at 24 random-weight layers, per-op rounding is
    # chaotically amplified, so the meaningful question is whether OUR f32 run
    # drifts from the f64 truth by more than torch's own f32 run does.
    truth = torch_forward(torch_model.double())
    torch_model.float()

    state = {key: value.numpy() for key, value in torch_model.state_dict().items()}
    params = convert_wav2vec2_state(state, arch)

    def layer_drift(states, frame_mask) -> Tuple[float, int]:
        worst, worst_layer = 0.0, -1
        for layer_id, (ours, reference) in enumerate(zip(states, truth)):
            difference = float(np.abs(np.asarray(ours, np.float32) - reference)[frame_mask].max())
            if difference > worst:
                worst, worst_layer = difference, layer_id
        return worst, worst_layer

    status = 0
    torch_worst = None
    for dtype_name, dtype in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16)):
        hidden_states, frame_lengths = Wav2Vec2Model(arch, dtype=dtype).apply(
            {"params": params}, jnp.asarray(audio), jnp.asarray(lengths), deterministic=True
        )
        frame_lengths = np.asarray(frame_lengths)
        frame_mask = np.arange(torch_hidden[0].shape[1])[None, :] < frame_lengths[:, None]
        if torch_worst is None:
            torch_worst, torch_layer = layer_drift(torch_hidden, frame_mask)
            print(f"torch f32 vs f64 truth: worst layer {torch_layer} max |diff| {torch_worst:.3e}")
        for layer_id, (ours, theirs) in enumerate(zip(hidden_states, torch_hidden)):
            difference = np.abs(np.asarray(ours, np.float32) - theirs)[frame_mask]
            print(
                f"[{dtype_name}] layer {layer_id:2d}: max |diff| vs torch f32"
                f" {float(difference.max()):.3e} rms {float(np.sqrt((difference ** 2).mean())):.3e}"
            )
        ours_worst, ours_layer = layer_drift(hidden_states, frame_mask)
        print(
            f"[{dtype_name}] vs f64 truth: worst layer {ours_layer} max |diff| {ours_worst:.3e}"
            f" ({ours_worst / max(torch_worst, 1e-12):.2f}x torch's own f32 drift)"
        )
        if dtype_name == "float32" and ours_worst > max(3.0 * torch_worst, tolerance):
            # Structural errors dwarf rounding chaos; 3x torch's own drift (or the
            # absolute floor) separates the two.
            status = 1
    return status


def check_decisions(seconds: float = 10.0, batch: int = 8, seed: int = 0) -> int:
    """Decision-level bf16 serving-parity study (VERDICT r2 item 3).

    Activation drift (``fullsize``) bounds numeric error; what predicts PER
    slippage is whether greedy *decisions* flip. This runs the full flagship
    (XLS-R-300m-sized encoder, all 37 heads, allophone layer) with one shared set
    of random f32 weights through the f32 and bf16 compute paths and reports, per
    head and aggregate: the frame-argmax flip rate and the token-level edit rate
    of the bf16 greedy CTC decode measured against the f32 decode (a synthetic
    PER delta). Random weights are the pessimistic case — their near-uniform
    logits sit close to argmax ties (trained logits are far more separated), so
    real serving flip rates are bounded above by these numbers. Reference
    inference is f32 (acoustic_model.py:1027-1052 has no half path); serving bf16
    is this framework's deliberate deviation, and this is its bound."""
    import jax
    import jax.numpy as jnp

    from allophant_tpu.demo import build_flagship
    from allophant_tpu.phonemes import levensthein

    config, indexer, built32 = build_flagship(dtype=jnp.float32)
    _config16, _indexer16, built16 = build_flagship(dtype=jnp.bfloat16)
    variables = built32.init(jax.random.PRNGKey(seed), sample_batch_size=1, sample_length=3200)

    rng = np.random.default_rng(seed)
    samples = int(16_000 * seconds)
    audio = jnp.asarray(rng.standard_normal((batch, samples)).astype(np.float32))
    lengths = jnp.asarray(np.full(batch, samples, np.int32))
    language_ids = jnp.asarray((np.arange(batch) % 4).astype(np.int32))

    def forward(built):
        predictions = jax.jit(
            lambda v, a, l, i: built.model.apply(v, a, l, i, predict=True, deterministic=True)
        )(variables, audio, lengths, language_ids)
        outputs = {name: np.asarray(value, np.float32) for name, value in predictions.outputs.items()}
        return outputs, np.asarray(predictions.lengths)

    outputs32, frame_lengths = forward(built32)
    outputs16, _ = forward(built16)

    def greedy_tokens(logits_row, length) -> list:
        ids = logits_row[:length].argmax(axis=-1)
        collapsed = ids[np.concatenate(([True], ids[1:] != ids[:-1]))]
        return [int(token) for token in collapsed if token != 0]

    total_frames = 0
    total_flips = 0
    total_edits = 0
    total_reference_tokens = 0
    worst = (0.0, "")
    for name in sorted(outputs32):
        head32, head16 = outputs32[name], outputs16[name]
        flips = 0
        frames = 0
        edits = 0
        reference_tokens = 0
        for row in range(batch):
            length = int(frame_lengths[row])
            argmax32 = head32[row, :length].argmax(axis=-1)
            argmax16 = head16[row, :length].argmax(axis=-1)
            flips += int((argmax32 != argmax16).sum())
            frames += length
            tokens32 = greedy_tokens(head32[row], length)
            tokens16 = greedy_tokens(head16[row], length)
            edits += levensthein(tokens32, tokens16)
            reference_tokens += max(len(tokens32), 1)
        flip_rate = flips / max(frames, 1)
        edit_rate = edits / max(reference_tokens, 1)
        if flip_rate > worst[0]:
            worst = (flip_rate, name)
        total_frames += frames
        total_flips += flips
        total_edits += edits
        total_reference_tokens += reference_tokens
        print(f"[{name:>24s}] argmax flip {100 * flip_rate:6.3f}%  token edit rate {100 * edit_rate:6.3f}%")

    print(
        f"aggregate over {len(outputs32)} heads, {batch} x {seconds:.0f}s: "
        f"argmax flip rate {100 * total_flips / max(total_frames, 1):.3f}%, "
        f"synthetic PER delta (bf16 vs f32 decode) "
        f"{100 * total_edits / max(total_reference_tokens, 1):.3f}%, "
        f"worst head {worst[1]} at {100 * worst[0]:.3f}%"
    )
    return 0


def check_checkpoint(path: str) -> int:
    import jax

    from allophant_tpu.data.batch import Batch
    from allophant_tpu.training import Estimator

    estimator, indexer = Estimator.restore(path)
    print(f"classes ({len(estimator.classes)}): {', '.join(estimator.classes)}")
    print(f"phoneme inventory size: {len(indexer.phonemes)}")
    leaves = jax.tree_util.tree_leaves(estimator.variables["params"])
    print(f"parameters: {sum(int(np.prod(leaf.shape)) for leaf in leaves):,}")

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 16_000)).astype(np.float32)
    predictions = estimator.predict(Batch(audio, np.array([16_000]), 0))
    for name, value in list(predictions.outputs.items())[:3]:
        print(f"output {name}: {tuple(value.shape)}")
    print("smoke forward OK")
    return 0


def check_error_rates(
    predictions_path: str, reference_path: str, tolerance: float, map_phonemes: bool = True
) -> int:
    from allophant_tpu.evaluation import MultilingualEvaluationResults, macro_average_error_rates
    from allophant_tpu.evaluation_runner import compute_edit_statistics, summarize_edit_statistics
    from allophant_tpu.predictions import PredictionReader

    with PredictionReader(predictions_path) as reader:
        statistics = compute_edit_statistics(reader, map_phonemes=map_phonemes)
        ours = summarize_edit_statistics(statistics, reader.metadata.classifiers)
    our_macro = macro_average_error_rates(ours)

    reference = MultilingualEvaluationResults.load(reference_path)
    reference_macro = macro_average_error_rates(reference)

    shared = sorted(set(our_macro) & set(reference_macro))
    if not shared:
        print("no shared metrics between the two result sets", file=sys.stderr)
        return 2
    failed = False
    for name in shared:
        difference = abs(our_macro[name] - reference_macro[name]) * 100.0
        status = "OK" if difference <= tolerance else "FAIL"
        if status == "FAIL":
            failed = True
        print(
            f"{name}: ours {our_macro[name] * 100.0:.2f}%"
            f" reference {reference_macro[name] * 100.0:.2f}%"
            f" |d| {difference:.3f}pp {status}"
        )
    return 1 if failed else 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    commands = parser.add_subparsers(dest="command", required=True)

    activations = commands.add_parser("activations")
    activations.add_argument("model_id")
    activations.add_argument("--seconds", type=float, default=2.0)
    activations.add_argument("--tolerance", type=float, default=2e-3)

    fullsize = commands.add_parser("fullsize")
    fullsize.add_argument("--seconds", type=float, default=2.0)
    fullsize.add_argument("--tolerance", type=float, default=5e-3)

    checkpoint = commands.add_parser("checkpoint")
    checkpoint.add_argument("path")

    decisions = commands.add_parser("decisions")
    decisions.add_argument("--seconds", type=float, default=10.0)
    decisions.add_argument("--batch", type=int, default=8)
    decisions.add_argument("--seed", type=int, default=0)

    rates = commands.add_parser("error-rates")
    rates.add_argument("predictions")
    rates.add_argument("reference")
    rates.add_argument("--tolerance", type=float, default=0.1, help="percentage points")
    rates.add_argument("--no-remap", action="store_true", help="skip inventory remapping")

    arguments = parser.parse_args(argv)
    if arguments.command == "activations":
        return check_activations(arguments.model_id, arguments.seconds, arguments.tolerance)
    if arguments.command == "fullsize":
        return check_fullsize(arguments.seconds, arguments.tolerance)
    if arguments.command == "checkpoint":
        return check_checkpoint(arguments.path)
    if arguments.command == "decisions":
        return check_decisions(arguments.seconds, arguments.batch, arguments.seed)
    return check_error_rates(
        arguments.predictions,
        arguments.reference,
        arguments.tolerance,
        map_phonemes=not arguments.no_remap,
    )


if __name__ == "__main__":
    sys.exit(main())
