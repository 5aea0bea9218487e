"""From-scratch transformer acoustic model with configurable frontends.

Counterpart of /root/reference/allophant/network/acoustic_model.py:564-759 and
/root/reference/allophant/network/frontend.py: a Direct/Linear frontend, an optional
sequential frontend (GLU convolutions with variable-length reflect padding, max
pooling, layer norm, dropout), sinusoidal position embeddings, and a pre-LN
transformer encoder that returns every layer's output for intermediate classifier
taps. Layout is batch-first [B, T, F] throughout (the torch reference shuffles between
[B, F, T] and [T, B, F]).

Deviation noted: the reference computes max-pool output lengths with stride-1 conv
math (frontend.py:260) while ``torch.nn.MaxPool1d(size)`` actually strides by
``size``; we use the correct strided length math since broken lengths corrupt CTC."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from allophant_tpu.ops.activations import fast_gelu
from allophant_tpu.config import (
    DirectFrontendConfig,
    DropoutConfig,
    Glu1dConfig,
    LayerNormConfig,
    LinearFrontendConfig,
    MaxPoolingConfig,
    SequentialFrontendConfig,
    TransformerAcousticModelConfig,
)
from allophant_tpu.models.projection import sinusoidal_positions
from allophant_tpu.ops import masking


def variable_length_reflect_pad(features, lengths, padding: Tuple[int, int]):
    """Per-sequence reflect padding at true sequence boundaries (reference
    padding.py:24-53): the left edge reflects the sequence start; the right edge
    reflects at each sequence's true length rather than the padded buffer end."""
    left, right = padding
    batch, time, channels = features.shape
    padded_time = time + left + right
    positions = jnp.arange(padded_time)[None, :]  # [1, T']
    lengths = lengths[:, None]

    middle_source = positions - left
    left_source = left - positions
    right_source = 2 * lengths - 2 - middle_source  # reflect at length boundary

    in_left = positions < left
    in_right = (middle_source >= lengths) & (middle_source < lengths + right)
    source = jnp.where(in_left, left_source, jnp.where(in_right, right_source, middle_source))
    source = jnp.clip(source, 0, time - 1)
    return jnp.take_along_axis(features, source[:, :, None], axis=1)


class Glu1d(nn.Module):
    """1D convolution with gated linear units over time (reference frontend.py:98-136)."""

    output_dimensions: int
    kernel_size: int
    stride: int = 1
    reflect_pad: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, lengths):
        padding = masking.get_padding(self.kernel_size, self.stride)
        if self.reflect_pad:
            features = variable_length_reflect_pad(features, lengths, padding)
        else:
            features = jnp.pad(features, ((0, 0), padding, (0, 0)))
        gated = nn.Conv(
            features=self.output_dimensions * 2,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding="VALID",
            dtype=self.dtype,
            name="weights",
        )(features)
        values, gates = jnp.split(gated, 2, axis=-1)
        return values * nn.sigmoid(gates)


@dataclasses.dataclass(frozen=True)
class _SequentialLayerPlan:
    kind: str  # "glu1d" | "max_pool" | "dropout" | "layer_norm"
    out_channels: int = 0
    kernel: int = 0
    stride: int = 1
    rate: float = 0.0
    affine: bool = False
    size: int = 0


def _sequential_plan(
    config: SequentialFrontendConfig, feature_size: int
) -> Tuple[Tuple[_SequentialLayerPlan, ...], int, float]:
    layers = []
    previous = feature_size
    upscale = 1.0
    for layer in config.layers:
        if isinstance(layer, DropoutConfig):
            layers.append(_SequentialLayerPlan("dropout", rate=layer.rate))
        elif isinstance(layer, Glu1dConfig):
            layers.append(
                _SequentialLayerPlan(
                    "glu1d", out_channels=layer.out_channels, kernel=layer.kernel, stride=layer.stride
                )
            )
            previous = layer.out_channels
            upscale *= layer.stride
        elif isinstance(layer, LayerNormConfig):
            layers.append(_SequentialLayerPlan("layer_norm", affine=layer.affine, out_channels=previous))
        elif isinstance(layer, MaxPoolingConfig):
            layers.append(_SequentialLayerPlan("max_pool", size=layer.size))
            upscale *= layer.size
        else:
            raise ValueError(f"Unsupported layer config of type: {layer.__class__.__name__}")
    return tuple(layers), previous, upscale


def sequential_frontend_lengths(plan: Tuple[_SequentialLayerPlan, ...], lengths):
    for layer in plan:
        if layer.kind == "glu1d":
            padding = sum(masking.get_padding(layer.kernel, layer.stride))
            lengths = masking.conv_output_length(lengths, layer.kernel, layer.stride, padding)
        elif layer.kind == "max_pool":
            lengths = masking.conv_output_length(lengths, layer.size, layer.size)
    return lengths


class SequentialFrontend(nn.Module):
    plan: Tuple[_SequentialLayerPlan, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, lengths, deterministic: bool = True):
        for index, layer in enumerate(self.plan):
            if layer.kind == "dropout":
                features = nn.Dropout(layer.rate)(features, deterministic=deterministic)
            elif layer.kind == "glu1d":
                # Mask padding before the convolution (reference MaskInfo handling).
                features = features * masking.mask_sequence(lengths, features.shape[1])[:, :, None].astype(
                    features.dtype
                )
                features = Glu1d(
                    layer.out_channels, layer.kernel, layer.stride, dtype=self.dtype, name=f"glu_{index}"
                )(features, lengths)
                padding = sum(masking.get_padding(layer.kernel, layer.stride))
                lengths = masking.conv_output_length(lengths, layer.kernel, layer.stride, padding)
            elif layer.kind == "layer_norm":
                features = nn.LayerNorm(
                    use_bias=layer.affine, use_scale=layer.affine, dtype=self.dtype, name=f"norm_{index}"
                )(features)
            elif layer.kind == "max_pool":
                features = features * masking.mask_sequence(lengths, features.shape[1])[:, :, None].astype(
                    features.dtype
                )
                features = nn.max_pool(
                    features, window_shape=(layer.size,), strides=(layer.size,), padding="VALID"
                )
                lengths = masking.conv_output_length(lengths, layer.size, layer.size)
        return features, lengths


class PreLNTransformerLayer(nn.Module):
    """Pre-LN transformer layer matching the reference's modified torch layer
    (acoustic_model.py:564-611): the attention residual is taken *after* norm1."""

    d_model: int
    num_heads: int
    feedforward_size: int
    dropout_rate: float = 0.1
    activation: str = "relu"
    elementwise_affine: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, pad_mask, deterministic: bool = True):
        return self._forward(hidden, pad_mask, deterministic)

    def _forward(self, hidden, pad_mask, deterministic: bool = True):
        affine = self.elementwise_affine
        hidden = nn.LayerNorm(use_bias=affine, use_scale=affine, dtype=self.dtype, name="norm1")(hidden)

        heads = self.num_heads
        head_dim = self.d_model // heads
        batch, time, _ = hidden.shape

        def project(name):
            return nn.Dense(self.d_model, dtype=self.dtype, name=name)(hidden).reshape(
                batch, time, heads, head_dim
            )

        from allophant_tpu.ops.attention import multi_head_attention

        attention = multi_head_attention(
            project("q_proj"),
            project("k_proj"),
            project("v_proj"),
            pad_mask,
            sm_scale=head_dim**-0.5,
            dropout_module=nn.Dropout(self.dropout_rate),
            deterministic=deterministic,
            dropout_rate=self.dropout_rate,
        ).reshape(batch, time, self.d_model)
        attention = nn.Dense(self.d_model, dtype=self.dtype, name="out_proj")(attention)
        hidden = hidden + nn.Dropout(self.dropout_rate)(attention, deterministic=deterministic)

        feed_input = nn.LayerNorm(use_bias=affine, use_scale=affine, dtype=self.dtype, name="norm2")(hidden)
        feed = nn.Dense(self.feedforward_size, dtype=self.dtype, name="linear1")(feed_input)
        feed = nn.relu(feed) if self.activation == "relu" else fast_gelu(feed)
        feed = nn.Dropout(self.dropout_rate)(feed, deterministic=deterministic)
        feed = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(feed)
        return hidden + nn.Dropout(self.dropout_rate)(feed, deterministic=deterministic)


class _ScanTransformerLayer(PreLNTransformerLayer):
    """PreLNTransformerLayer with a scan-compatible (carry, y) contract."""

    @nn.compact
    def __call__(self, hidden, pad_mask, deterministic: bool = True):
        hidden = self._forward(hidden, pad_mask, deterministic)
        return hidden, hidden


class TransformerAcousticModel(nn.Module):
    """Frontend + optional sequential frontend + pre-LN transformer collecting every
    layer's output, each passed through the final layer norm (reference :704-722)."""

    config: TransformerAcousticModelConfig
    feature_size: int
    dtype: jnp.dtype = jnp.float32

    @property
    def frontend_output_size(self) -> int:
        frontend = self.config.frontend
        if isinstance(frontend, LinearFrontendConfig):
            return frontend.neurons
        return self.feature_size

    @property
    def d_model(self) -> int:
        if self.config.sequential_frontend is not None:
            _, out, _ = _sequential_plan(self.config.sequential_frontend, self.frontend_output_size)
            return out
        return self.frontend_output_size

    @property
    def output_size(self) -> int:
        return self.d_model

    def downsampled_lengths(self, lengths):
        if self.config.sequential_frontend is None:
            return lengths
        plan, _, _ = _sequential_plan(self.config.sequential_frontend, self.frontend_output_size)
        return sequential_frontend_lengths(plan, lengths)

    @nn.compact
    def __call__(self, features, lengths, deterministic: bool = True):
        config = self.config
        affine = config.elementwise_affine
        frontend = config.frontend

        if features.ndim == 2:
            features = features[:, :, None]

        if isinstance(frontend, DirectFrontendConfig):
            if frontend.input_dropout > 0:
                features = nn.Dropout(frontend.input_dropout)(features, deterministic=deterministic)
        elif isinstance(frontend, LinearFrontendConfig):
            if frontend.input_dropout > 0:
                features = nn.Dropout(frontend.input_dropout)(features, deterministic=deterministic)
            features = nn.LayerNorm(use_bias=affine, use_scale=affine, dtype=self.dtype, name="frontend_norm")(
                features
            )
            features = nn.Dense(frontend.neurons, dtype=self.dtype, name="frontend_linear")(features)
            features = nn.leaky_relu(features)
        else:
            raise ValueError(f"Unsupported frontend config type {frontend.__class__.__name__}")

        transformer = config.transformer
        features = nn.Dropout(transformer.dropout_rate)(features, deterministic=deterministic)

        if config.sequential_frontend is not None:
            plan, _, _ = _sequential_plan(config.sequential_frontend, self.frontend_output_size)
            features, lengths = SequentialFrontend(plan, self.dtype, name="sequential_frontend")(
                features, lengths, deterministic
            )

        d_model = features.shape[-1]
        if transformer.positional_embeddings:
            features = features + sinusoidal_positions(features.shape[1], d_model, features.dtype)[None]

        pad_mask = masking.mask_sequence(lengths, features.shape[1])
        # Layers run under nn.scan with stacked [L, ...] parameters: one compiled
        # layer body regardless of depth (same design as the wav2vec2 encoder).
        scan_layers = nn.scan(
            _ScanTransformerLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=transformer.num_layers,
        )
        _hidden, stacked = scan_layers(
            d_model,
            transformer.heads,
            transformer.feedforward_neurons,
            transformer.dropout_rate,
            transformer.activation,
            affine,
            self.dtype,
            name="layers",
        )(features, pad_mask, deterministic)
        outputs = [stacked[index] for index in range(transformer.num_layers)]

        final_norm = nn.LayerNorm(use_bias=affine, use_scale=affine, dtype=self.dtype, name="final_norm")
        return [final_norm(output) for output in outputs], lengths
