"""wav2vec2/XLS-R-style speech encoder in flax, returning all hidden states.

TPU-native reimplementation of the acoustic model the reference wraps
(/root/reference/allophant/network/acoustic_model.py:775-905 wraps HF
``Wav2Vec2Model``). The numerical semantics mirror the public HuggingFace
architecture (conv feature encoder, feature projection, grouped convolutional
positional embeddings, pre-LN ("stable layer norm") or post-LN transformer encoder)
so that released XLS-R-based checkpoints produce identical activations; see
``tests/test_wav2vec2_parity.py`` for the parity harness against HF torch.

Design differences from the torch implementation, driven by XLA/TPU:
- Batch-first [B, T, D] layout throughout; static padded shapes with integer lengths
  (masks computed inside jit, no dynamic shapes).
- The positional-conv weight norm is folded into a plain kernel at load time.
- Attention routes through a one-shot Pallas kernel at utterance lengths (full
  score tile in VMEM, no head transposes; see ``ops/oneshot_attention.py``) and
  the flash-attention kernel beyond, with an einsum fallback for CPU and
  attention-dropout training.
- The first feature-extractor conv + LayerNorm + GELU run as one fused Pallas
  kernel; GELUs elsewhere use the bf16-exact fast tanh-polynomial form
  (``ops/activations.py``).
- Frames are padded to 128-alignment once before the encoder scan.
- Compute dtype is configurable (bf16 on TPU) with f32 parameters.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

from allophant_tpu.ops import masking
from allophant_tpu.ops.activations import fast_gelu


def matmul_precision_scope(dtype, f32_precision: str = "highest"):
    """Trace-time matmul/conv precision for the given compute dtype.

    XLA's default matmul precision truncates f32 operands (bf16 passes on the
    MXU, and a reduced-precision lowering even on CPU): measured against an f64
    ground truth, a 24-layer f32 encoder drifted ~8000x more than torch's own
    f32 run until the first conv alone contributed 1.2e-2 of error. Models that
    request f32 therefore mean *full* f32 and trace under
    ``jax.default_matmul_precision("highest")`` unless the caller explicitly
    lowers ``f32_precision`` (e.g. ``"high"``, the 3-pass bf16 lowering — a
    measured speed/accuracy trade, see ``tools/parity_check.py decisions``);
    bf16 serving keeps the fast default path (where input rounding dwarfs
    pass-count effects anyway).
    """
    if dtype == jnp.float32:
        return jax.default_matmul_precision(f32_precision)
    return contextlib.nullcontext()


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Architecture:
    """Static architecture hyperparameters (mirrors the public wav2vec2 config)."""

    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # "layer" (XLS-R) or "group" (base wav2vec2)
    do_stable_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    do_normalize: bool = True
    use_attention_mask: bool = True

    @classmethod
    def from_hf_config(cls, config) -> "Wav2Vec2Architecture":
        """Builds from a HuggingFace ``Wav2Vec2Config`` (or plain dict)."""
        get = config.get if isinstance(config, dict) else lambda key, default=None: getattr(config, key, default)
        return cls(
            hidden_size=get("hidden_size", 1024),
            num_hidden_layers=get("num_hidden_layers", 24),
            num_attention_heads=get("num_attention_heads", 16),
            intermediate_size=get("intermediate_size", 4096),
            conv_dim=tuple(get("conv_dim", (512,) * 7)),
            conv_kernel=tuple(get("conv_kernel", (10, 3, 3, 3, 3, 2, 2))),
            conv_stride=tuple(get("conv_stride", (5, 2, 2, 2, 2, 2, 2))),
            conv_bias=get("conv_bias", True),
            feat_extract_norm=get("feat_extract_norm", "layer"),
            do_stable_layer_norm=get("do_stable_layer_norm", True),
            num_conv_pos_embeddings=get("num_conv_pos_embeddings", 128),
            num_conv_pos_embedding_groups=get("num_conv_pos_embedding_groups", 16),
            layer_norm_eps=get("layer_norm_eps", 1e-5),
            hidden_dropout=get("hidden_dropout", 0.1),
            activation_dropout=get("activation_dropout", 0.1),
            attention_dropout=get("attention_dropout", 0.1),
            feat_proj_dropout=get("feat_proj_dropout", 0.0),
        )

    def downsampled_lengths(self, lengths):
        """CTC frame counts after the conv feature extractor (no padding), matching
        torch Conv1d length math (reference acoustic_model.py:823-835)."""
        return masking.stacked_conv_output_lengths(lengths, self.conv_kernel, self.conv_stride)

    def truncated(self, maximum_encoder_layers: Optional[int]) -> "Wav2Vec2Architecture":
        """Limits encoder depth to the highest required intermediate tap (reference
        acoustic_model.py:800-802, 932-941)."""
        if maximum_encoder_layers is None or maximum_encoder_layers >= self.num_hidden_layers:
            return self
        return dataclasses.replace(self, num_hidden_layers=maximum_encoder_layers)


class _ConvParams(nn.Module):
    """Parameter holder matching ``nn.Conv``'s tree (kernel [K, Cin, Cout], bias)
    for layers computed by a fused Pallas kernel instead of the flax module."""

    features: int
    kernel_size: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        )
        return kernel, bias


class _LayerNormParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm``'s tree (scale, bias)."""

    features: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.features,)),
            self.param("bias", nn.initializers.zeros, (self.features,)),
        )


class ConvFeatureEncoder(nn.Module):
    """Stack of strided 1D convolutions over raw audio: [B, T] -> [B, T', C].

    The first layer (kernel 10, stride 5, 1 channel in — where the MXU would run
    nearly empty) is computed by the fused Pallas frame-encoder kernel
    (:func:`allophant_tpu.ops.frame_encoder.fused_frame_conv`) when the architecture
    uses per-layer LayerNorm (XLS-R); the parameter tree is identical either way."""

    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32
    fuse_first_layer: bool = True

    @nn.compact
    def __call__(self, audio):
        arch = self.architecture
        first_fused = (
            self.fuse_first_layer
            and arch.feat_extract_norm == "layer"
            and arch.conv_kernel[0] == 10
            and arch.conv_stride[0] == 5
        )
        if first_fused:
            from allophant_tpu.ops.frame_encoder import fused_frame_conv

            kernel, bias = _ConvParams(arch.conv_dim[0], 10, 1, arch.conv_bias, name="conv_0")()
            scale, ln_bias = _LayerNormParams(arch.conv_dim[0], name="layer_norm_0")()
            hidden = fused_frame_conv(
                audio,
                kernel,
                bias if bias is not None else jnp.zeros((arch.conv_dim[0],), jnp.float32),
                scale,
                ln_bias,
                eps=arch.layer_norm_eps,
                out_dtype=self.dtype,
            )
        else:
            hidden = audio[:, :, None].astype(self.dtype)  # [B, T, 1]
        for layer_id, (out_dim, kernel, stride) in enumerate(
            zip(arch.conv_dim, arch.conv_kernel, arch.conv_stride)
        ):
            if layer_id == 0 and first_fused:
                continue
            # The XLA conv lowering wins here: re-expressing these strided convs
            # as stride-grouped matmuls (ops/strided_conv.py) measured 2,760 vs
            # 3,384 audio-sec/s end-to-end — the relayout copies on the multi-GB
            # early-layer activations cost more than the denser MXU tiles gain.
            hidden = nn.Conv(
                features=out_dim,
                kernel_size=(kernel,),
                strides=(stride,),
                padding="VALID",
                use_bias=arch.conv_bias,
                dtype=self.dtype,
                name=f"conv_{layer_id}",
            )(hidden)
            if arch.feat_extract_norm == "layer":
                # XLA already fuses this LayerNorm+GELU into the conv epilogue; a
                # hand-written Pallas epilogue measured no faster.
                hidden = nn.LayerNorm(
                    epsilon=arch.layer_norm_eps, dtype=self.dtype, name=f"layer_norm_{layer_id}"
                )(hidden)
            elif layer_id == 0:
                # Base wav2vec2: group norm (num_groups == channels) after the first conv.
                hidden = nn.GroupNorm(
                    num_groups=out_dim, epsilon=arch.layer_norm_eps, dtype=self.dtype, name="group_norm"
                )(hidden)
            hidden = fast_gelu(hidden)
        return hidden


class FeatureProjection(nn.Module):
    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, deterministic: bool = True):
        arch = self.architecture
        normed = nn.LayerNorm(epsilon=arch.layer_norm_eps, dtype=self.dtype, name="layer_norm")(features)
        projected = nn.Dense(arch.hidden_size, dtype=self.dtype, name="projection")(normed)
        return nn.Dropout(arch.feat_proj_dropout)(projected, deterministic=deterministic)


class PositionalConvEmbedding(nn.Module):
    """Grouped convolutional relative position embeddings (kernel 128, 16 groups).

    The torch version parametrizes the kernel with weight norm; the checkpoint
    converter folds g * v / ||v|| into the plain kernel stored here."""

    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        arch = self.architecture
        kernel = arch.num_conv_pos_embeddings
        embeddings = nn.Conv(
            features=arch.hidden_size,
            kernel_size=(kernel,),
            padding=[(kernel // 2, kernel // 2)],
            feature_group_count=arch.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="conv",
        )(hidden)
        if kernel % 2 == 0:
            # torch pads kernel//2 on both sides then trims the trailing frame.
            embeddings = embeddings[:, :-1]
        return fast_gelu(embeddings)


# Remat residual sets (see Wav2Vec2Encoder): BASE keeps the projection/FFN
# tiles whose matmuls dominate the recompute FLOPs; EXTENDED additionally keeps
# the attention out-projection and FFN down-projection outputs ([B, T, D] each,
# ~400 MB total at batch 8 x 10 s), shrinking the backward recompute to
# elementwise work only. Which one wins is measured, not assumed:
# tools/ab_train_step.py times both in one process.
REMAT_SAVE_NAMES_BASE = ("w2v2_qkv", "w2v2_ffn_hidden", "w2v2_attn_context")
REMAT_SAVE_NAMES_EXTENDED = REMAT_SAVE_NAMES_BASE + ("w2v2_attn_out", "w2v2_ffn_out")


class SelfAttention(nn.Module):
    """Multi-head self-attention with additive bias, matching HF parameter layout
    (q/k/v/out projections with bias)."""

    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, pad_mask, deterministic: bool = True):
        from allophant_tpu.ops.attention import kernel_dropout_supported, multi_head_attention

        arch = self.architecture
        heads = arch.num_attention_heads
        head_dim = arch.hidden_size // heads
        batch, time, _ = hidden.shape

        def project(name):
            # Named so the remat policy can keep projection outputs: the
            # backward pass then skips re-running the three projection matmuls
            # (the attention vjp consumes q/k/v directly).
            projected = jax.ad_checkpoint.checkpoint_name(
                nn.Dense(arch.hidden_size, dtype=self.dtype, name=name)(hidden), "w2v2_qkv"
            )
            return projected.reshape(batch, time, heads, head_dim)

        # Training attention dropout runs inside the one-shot kernel when the
        # sequence fits its full-tile plan (the mask never touches HBM); the
        # rng key is drawn here only on that path so the einsum fallback's
        # nn.Dropout consumes the same "dropout" stream it always did.
        use_kernel_dropout = (
            not deterministic
            # rate >= 1 would make the kernel's keep_prob normalization 0/0;
            # the einsum fallback returns finite zero-context outputs instead.
            and 0.0 < arch.attention_dropout < 1.0
            and kernel_dropout_supported(heads, head_dim, time, jnp.dtype(self.dtype).itemsize)
        )
        dropout_rng = self.make_rng("dropout") if use_kernel_dropout else None

        context = multi_head_attention(
            project("q_proj"),
            project("k_proj"),
            project("v_proj"),
            pad_mask,
            sm_scale=head_dim**-0.5,
            dropout_module=nn.Dropout(arch.attention_dropout),
            deterministic=deterministic,
            dropout_rate=arch.attention_dropout,
            dropout_rng=dropout_rng,
        ).reshape(batch, time, arch.hidden_size)
        # Named so the remat policy can keep the attention context ([B, T, D],
        # ~8.4 MB/layer at batch 8): the rematerialized backward then skips
        # re-running the attention kernel (it still differentiates through it
        # via the custom_vjp, but the recompute-for-residual-stream run is gone).
        context = jax.ad_checkpoint.checkpoint_name(context, "w2v2_attn_context")
        # Output projection saved too ([B, T, D]): with its input (context) and
        # output both kept, the rematerialized backward runs no attention-block
        # matmuls at all.
        return jax.ad_checkpoint.checkpoint_name(
            nn.Dense(arch.hidden_size, dtype=self.dtype, name="out_proj")(context),
            "w2v2_attn_out",
        )


class FeedForward(nn.Module):
    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, deterministic: bool = True):
        arch = self.architecture
        hidden = nn.Dense(arch.intermediate_size, dtype=self.dtype, name="intermediate_dense")(hidden)
        # Named so the remat policy can keep the [B, T, 4D] pre-GELU tile: the
        # backward pass then skips re-running the widest matmul in the layer.
        hidden = jax.ad_checkpoint.checkpoint_name(hidden, "w2v2_ffn_hidden")
        hidden = fast_gelu(hidden)
        hidden = nn.Dropout(arch.activation_dropout)(hidden, deterministic=deterministic)
        # Down-projection output saved ([B, T, D]): the backward recompute then
        # re-runs only elementwise work (GELU/dropout/LN) — every FFN matmul is
        # served from residuals (pre-GELU tile above, this output here).
        hidden = jax.ad_checkpoint.checkpoint_name(
            nn.Dense(arch.hidden_size, dtype=self.dtype, name="output_dense")(hidden),
            "w2v2_ffn_out",
        )
        return nn.Dropout(arch.hidden_dropout)(hidden, deterministic=deterministic)


class EncoderLayer(nn.Module):
    """Transformer encoder layer: pre-LN ("stable layer norm", XLS-R) or post-LN."""

    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, pad_mask, deterministic: bool = True):
        return self._forward(hidden, pad_mask, deterministic)

    def _forward(self, hidden, pad_mask, deterministic: bool = True):
        arch = self.architecture
        stable = arch.do_stable_layer_norm

        residual = hidden
        attention_input = (
            nn.LayerNorm(epsilon=arch.layer_norm_eps, dtype=self.dtype, name="layer_norm")(hidden)
            if stable
            else hidden
        )
        attention_output = SelfAttention(arch, self.dtype, name="attention")(
            attention_input, pad_mask, deterministic
        )
        attention_output = nn.Dropout(arch.hidden_dropout)(attention_output, deterministic=deterministic)
        hidden = residual + attention_output
        if not stable:
            hidden = nn.LayerNorm(epsilon=arch.layer_norm_eps, dtype=self.dtype, name="layer_norm")(hidden)

        feed_forward_input = (
            nn.LayerNorm(epsilon=arch.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(hidden)
            if stable
            else hidden
        )
        hidden = hidden + FeedForward(arch, self.dtype, name="feed_forward")(feed_forward_input, deterministic)
        if not stable:
            hidden = nn.LayerNorm(epsilon=arch.layer_norm_eps, dtype=self.dtype, name="final_layer_norm")(hidden)
        return hidden


class _ScanEncoderLayer(EncoderLayer):
    """EncoderLayer with a scan-compatible (carry, y) contract.

    With ``collect=False`` the per-layer output is not emitted, so the scan
    never materializes the stacked [L, B, T, D] hidden-states buffer in HBM —
    used when no classifier taps an intermediate layer (the default config:
    every head depends on the final "OUTPUT")."""

    collect: bool = True

    @nn.compact
    def __call__(self, hidden, pad_mask, deterministic: bool = True):
        hidden = self._forward(hidden, pad_mask, deterministic)
        return hidden, (hidden if self.collect else None)


class Wav2Vec2Encoder(nn.Module):
    """Encoder stack collecting every layer's input plus the final (normed) output —
    the ``output_hidden_states`` contract the reference consumes for its intermediate
    classifier taps.

    Layers run under ``nn.scan`` with stacked parameters ([L, ...] leaves under
    ``layers``): one compiled layer body instead of L inlined copies, which keeps
    XLA/Mosaic compile times flat in depth (the 24-layer unrolled flash-attention
    program was too large for the TPU compiler service)."""

    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_save_names: tuple = REMAT_SAVE_NAMES_BASE
    # False skips stacking per-layer outputs (returns only the final state);
    # sound whenever no classifier consumes an "OUTPUT_<i>" intermediate tap.
    collect_all: bool = True

    @nn.compact
    def __call__(self, hidden, pad_mask, deterministic: bool = True) -> List[jnp.ndarray]:
        arch = self.architecture
        if pad_mask is not None:
            # Zero padded positions so the positional conv sees silence there.
            hidden = hidden * pad_mask[:, :, None].astype(hidden.dtype)

        position_embeddings = PositionalConvEmbedding(arch, self.dtype, name="pos_conv_embed")(hidden)
        hidden = hidden + position_embeddings
        if not arch.do_stable_layer_norm:
            hidden = nn.LayerNorm(epsilon=arch.layer_norm_eps, dtype=self.dtype, name="layer_norm")(hidden)
        hidden = nn.Dropout(arch.hidden_dropout)(hidden, deterministic=deterministic)
        embedded = hidden

        # Rematerialization trades FLOPs for memory during training: layer
        # activations are recomputed in the backward pass instead of stored —
        # except the named projection/FFN tiles (~59 MB per layer at batch 8,
        # 10 s audio), whose matmuls are the bulk of the recompute FLOPs.
        layer_class = (
            nn.remat(
                _ScanEncoderLayer,
                static_argnums=(3,),
                policy=jax.checkpoint_policies.save_only_these_names(
                    *self.remat_save_names
                ),
            )
            if self.remat
            else _ScanEncoderLayer
        )
        scan_layers = nn.scan(
            layer_class,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast, nn.broadcast),
            length=arch.num_hidden_layers,
        )
        hidden, stacked = scan_layers(arch, self.dtype, self.collect_all, name="layers")(
            hidden, pad_mask, deterministic
        )
        if not self.collect_all:
            # Final state only: the scan emitted no ys, so no [L, B, T, D]
            # buffer ever touches HBM (parameter tree is identical either way).
            if arch.do_stable_layer_norm:
                hidden = nn.LayerNorm(
                    epsilon=arch.layer_norm_eps, dtype=self.dtype, name="layer_norm"
                )(hidden)
            return [hidden]
        hidden_states = [embedded] + [stacked[index] for index in range(arch.num_hidden_layers)]
        if arch.do_stable_layer_norm:
            hidden = nn.LayerNorm(epsilon=arch.layer_norm_eps, dtype=self.dtype, name="layer_norm")(hidden)
            hidden_states[-1] = hidden
        return hidden_states


class Wav2Vec2Model(nn.Module):
    """Full wav2vec2 encoder: raw audio [B, T] + lengths -> all hidden states.

    Returns (hidden_states, frame_lengths) where hidden_states is a list of
    [B, T', D] arrays of length ``num_hidden_layers + 1``. ``remat`` enables
    per-layer rematerialization (jax.checkpoint) for memory-bound training."""

    architecture: Wav2Vec2Architecture
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_save_names: tuple = REMAT_SAVE_NAMES_BASE
    # Longest prefix of (feature_extractor, feature_projection, encoder) whose
    # parameters stay frozen for the entire run: 0 = none, 1 = extractor,
    # 2 = +projection, 3 = +encoder. Gradients into such a prefix are
    # structurally zero, so the forward inserts stop_gradient at the prefix
    # boundary and XLA deletes the whole backward cone above it (the reference
    # instead zeroes grads after computing them, acoustic_model.py:856-905).
    # Must be a *prefix*: stopping gradients at any point also blocks flow-through
    # to everything upstream, which is only sound when upstream is frozen too.
    frozen_prefix: int = 0
    # See Wav2Vec2Encoder.collect_all: False returns only the final hidden
    # state, skipping the stacked per-layer buffer.
    collect_all: bool = True
    # f32 matmul pass count (see matmul_precision_scope); ignored for bf16.
    f32_matmul_precision: str = "highest"

    @nn.compact
    def __call__(self, audio, lengths, deterministic: bool = True):
        with matmul_precision_scope(self.dtype, self.f32_matmul_precision):
            return self._forward(audio, lengths, deterministic)

    def _forward(self, audio, lengths, deterministic: bool):
        arch = self.architecture

        if arch.do_normalize:
            sample_mask = masking.mask_sequence(lengths, audio.shape[1])
            audio = masking.zero_mean_unit_var_norm(audio, lengths, sample_mask)

        features = ConvFeatureEncoder(arch, self.dtype, name="feature_extractor")(audio)
        if self.frozen_prefix >= 1:
            features = jax.lax.stop_gradient(features)
        frame_lengths = arch.downsampled_lengths(lengths)

        # Pad the frame axis to a multiple of 128 once, before the encoder: the
        # attention kernels need 128-aligned time, and padding here (instead of
        # per layer inside the scan) removes three [B, T, D] pad copies per
        # layer (~0.6 ms/layer at batch 64). Padded frames are masked
        # everywhere downstream; outputs are sliced back before returning.
        true_frames = features.shape[1]
        frame_pad = (-true_frames) % 128
        if frame_pad:
            features = jnp.pad(features, ((0, 0), (0, frame_pad), (0, 0)))
        if arch.use_attention_mask:
            pad_mask = masking.mask_sequence(frame_lengths, features.shape[1])
        elif frame_pad:
            # No-attention-mask configs attend to sample-level padding (HF
            # semantics); mask only the alignment pad added above.
            pad_mask = jnp.broadcast_to(
                jnp.arange(features.shape[1]) < true_frames,
                (features.shape[0], features.shape[1]),
            )
        else:
            pad_mask = None

        hidden = FeatureProjection(arch, self.dtype, name="feature_projection")(features, deterministic)
        if self.frozen_prefix >= 2:
            hidden = jax.lax.stop_gradient(hidden)
        hidden_states = Wav2Vec2Encoder(
            arch,
            self.dtype,
            remat=self.remat,
            remat_save_names=self.remat_save_names,
            collect_all=self.collect_all,
            name="encoder",
        )(hidden, pad_mask, deterministic)
        if self.frozen_prefix >= 3:
            hidden_states = [jax.lax.stop_gradient(states) for states in hidden_states]
        if frame_pad:
            hidden_states = [states[:, :true_frames] for states in hidden_states]
        return hidden_states, frame_lengths
