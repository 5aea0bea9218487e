"""Numerical parity of the flax wav2vec2 encoder against HuggingFace torch.

This is the rebuild's substitute for activation-diffing against released checkpoints
(SURVEY.md §4): a randomly initialized HF ``Wav2Vec2Model`` (tiny config, both the
XLS-R stable-layer-norm variant and the base post-LN variant) is converted with
``convert_wav2vec2_state`` and must produce matching hidden states."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_hf_model(do_stable_layer_norm: bool, feat_extract_norm: str, **overrides):
    import torch
    from transformers import Wav2Vec2Config
    from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model as TorchWav2Vec2

    settings = dict(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=48,
        conv_dim=(12, 16),
        conv_kernel=(4, 3),
        conv_stride=(2, 2),
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=do_stable_layer_norm,
        feat_extract_norm=feat_extract_norm,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
        attn_implementation="eager",
    )
    settings.update(overrides)
    config = Wav2Vec2Config(**settings)
    torch.manual_seed(0)
    model = TorchWav2Vec2(config)
    model.eval()
    return config, model


_MEDIUM_DIMS = dict(
    hidden_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=256,
    conv_dim=(32, 48, 48),
    conv_kernel=(6, 3, 3),
    conv_stride=(3, 2, 2),
    num_conv_pos_embeddings=32,
    num_conv_pos_embedding_groups=8,
)


@pytest.mark.parametrize(
    "stable,norm_mode,overrides",
    [
        (True, "layer", {}),
        (False, "group", {}),
        # Larger dims catch dimension-dependent conversion/layout bugs the
        # 32-dim config cannot (head_dim 32, 3-layer conv stack, wider FFN).
        (True, "layer", _MEDIUM_DIMS),
    ],
    ids=["xlsr-stable-layernorm", "base-postln-groupnorm", "xlsr-medium-dims"],
)
def test_hidden_state_parity(stable, norm_mode, overrides):
    import torch

    from allophant_tpu.models.hf_conversion import convert_wav2vec2_state
    from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture, Wav2Vec2Model

    config, torch_model = _tiny_hf_model(stable, norm_mode, **overrides)
    arch = Wav2Vec2Architecture.from_hf_config(config)
    # HF models don't normalize inputs (the processor does); disable for parity.
    arch = arch.__class__(**{**arch.__dict__, "do_normalize": False})

    rng = np.random.default_rng(1)
    batch, max_samples = 3, 400 if not overrides else 1200
    audio = rng.standard_normal((batch, max_samples)).astype(np.float32)
    lengths = np.array([400, 320, 250]) * (1 if not overrides else 3)
    # Zero padding beyond lengths, as the batcher produces.
    for row, length in enumerate(lengths):
        audio[row, length:] = 0.0

    attention_mask = (np.arange(max_samples)[None, :] < lengths[:, None]).astype(np.int64)
    with torch.no_grad():
        torch_output = torch_model(
            torch.from_numpy(audio),
            attention_mask=torch.from_numpy(attention_mask),
            output_hidden_states=True,
        )
    torch_hidden = [state.numpy() for state in torch_output.hidden_states]

    state = {key: value.numpy() for key, value in torch_model.state_dict().items()}
    params = convert_wav2vec2_state(state, arch)
    model = Wav2Vec2Model(arch)
    hidden_states, frame_lengths = model.apply(
        {"params": params}, jnp.asarray(audio), jnp.asarray(lengths), deterministic=True
    )

    assert len(hidden_states) == len(torch_hidden) == config.num_hidden_layers + 1

    # Frame lengths must match HF's conv length math.
    def torch_lengths(n):
        for kernel, strd in zip(config.conv_kernel, config.conv_stride):
            n = (n - kernel) // strd + 1
        return n

    np.testing.assert_array_equal(np.asarray(frame_lengths), [torch_lengths(n) for n in lengths])

    frame_mask = (np.arange(torch_hidden[0].shape[1])[None, :] < np.asarray(frame_lengths)[:, None])
    for layer_id, (ours, theirs) in enumerate(zip(hidden_states, torch_hidden)):
        ours = np.asarray(ours)
        # Compare only valid frames (HF leaves pad frames to drift through the FFN).
        difference = np.abs(ours - theirs)[frame_mask]
        assert difference.max() < 2e-4, f"layer {layer_id}: max diff {difference.max()}"


def test_downsampled_lengths_scalar():
    from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture

    arch = Wav2Vec2Architecture()
    # 1 second at 16 kHz -> 49 frames for the XLS-R extractor stack.
    assert int(arch.downsampled_lengths(np.asarray([16000]))[0]) == 49
