"""Unit tests for the Pallas/fused op layer (run via the interpreter on CPU) and
small utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from allophant_tpu.ops.attention import fused_attention, reference_attention
from allophant_tpu.ops.frame_encoder import fused_frame_conv
from allophant_tpu.utils import EnumAction, OnlineMean, get_worker_count


class TestFusedFrameConv:
    @pytest.mark.parametrize("samples", [16000, 16003, 3200])
    def test_parity_with_flax_conv(self, samples):
        rng = np.random.default_rng(0)
        channels = 512
        audio = rng.standard_normal((2, samples)).astype(np.float32)
        kernel = (rng.standard_normal((10, 1, channels)) * 0.1).astype(np.float32)
        bias = (rng.standard_normal(channels) * 0.1).astype(np.float32)
        scale = (1 + rng.standard_normal(channels) * 0.1).astype(np.float32)
        ln_bias = (rng.standard_normal(channels) * 0.1).astype(np.float32)

        conv = nn.Conv(channels, (10,), (5,), padding="VALID", use_bias=True, dtype=jnp.bfloat16)
        reference = conv.apply(
            {"params": {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}},
            jnp.asarray(audio)[:, :, None].astype(jnp.bfloat16),
        )
        reference = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16).apply(
            {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(ln_bias)}}, reference
        )
        reference = np.asarray(nn.gelu(reference, approximate=False), dtype=np.float32)

        fused = np.asarray(
            fused_frame_conv(
                jnp.asarray(audio),
                jnp.asarray(kernel),
                jnp.asarray(bias),
                jnp.asarray(scale),
                jnp.asarray(ln_bias),
            ),
            dtype=np.float32,
        )
        assert fused.shape == reference.shape
        # Both paths are bf16; differences are accumulation-order rounding.
        np.testing.assert_allclose(fused, reference, atol=0.05, rtol=0.05)

    def test_channels_first_layout(self):
        rng = np.random.default_rng(1)
        audio = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
        kernel = jnp.asarray(rng.standard_normal((10, 1, 512)).astype(np.float32))
        vec = jnp.asarray(rng.standard_normal(512).astype(np.float32))
        out = fused_frame_conv(audio, kernel, vec, vec, vec, channels_first=True)
        assert out.shape == (1, 512, 3200 // 5 - 1)


class TestAttention:
    def test_reference_matches_manual(self):
        rng = np.random.default_rng(0)
        batch, time, heads, dim = 2, 16, 4, 8
        q = jnp.asarray(rng.standard_normal((batch, time, heads, dim)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((batch, time, heads, dim)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((batch, time, heads, dim)).astype(np.float32))
        mask = np.ones((batch, time), bool)
        mask[1, 10:] = False

        out = np.asarray(reference_attention(q, k, v, jnp.asarray(mask), dim**-0.5))

        # Manual per-head computation.
        qn, kn, vn = (np.asarray(x) for x in (q, k, v))
        for b in range(batch):
            for h in range(heads):
                logits = (qn[b, :, h] * dim**-0.5) @ kn[b, :, h].T
                logits[:, ~mask[b]] = -1e9
                weights = np.exp(logits - logits.max(-1, keepdims=True))
                weights /= weights.sum(-1, keepdims=True)
                expected = weights @ vn[b, :, h]
                np.testing.assert_allclose(out[b, :, h], expected, atol=1e-4)

    def test_fused_falls_back_on_cpu(self):
        # On CPU the flash kernel is unavailable; fused must equal reference.
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((1, 8, 2, 4)).astype(np.float32))
        mask = jnp.asarray(np.ones((1, 8), bool))
        out = fused_attention(q, q, q, mask, 0.5)
        expected = reference_attention(q, q, q, mask, 0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6)


class TestUtils:
    def test_online_mean(self):
        mean = OnlineMean()
        mean.add(1.0).add(2.0).add(3.0)
        assert mean.mean == pytest.approx(2.0)
        assert mean.count == 3
        mean.add(10.0, count=2)  # two observations with mean 10
        assert mean.mean == pytest.approx((1 + 2 + 3 + 20) / 5)

    def test_get_worker_count(self):
        assert get_worker_count(0) == 0
        assert get_worker_count(4) == 4
        assert get_worker_count() >= 1
        with pytest.raises(ValueError):
            get_worker_count(-1)

    def test_enum_action(self):
        from argparse import ArgumentParser
        from enum import Enum

        class Mode(Enum):
            A = "a"
            B = "b"

        parser = ArgumentParser()
        parser.add_argument("--mode", action=EnumAction, type=Mode, default=Mode.A)
        assert parser.parse_args([]).mode == "a"
        assert parser.parse_args(["--mode", "b"]).mode == Mode.B


class TestFrameConvGradients:
    def test_custom_vjp_matches_flax_gradients(self):
        """Training correctness: gradients through the fused kernel's custom VJP
        must match the plain flax conv+LN+GELU path."""
        rng = np.random.default_rng(2)
        channels = 512
        audio = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
        kernel = jnp.asarray((rng.standard_normal((10, 1, channels)) * 0.1).astype(np.float32))
        bias = jnp.asarray((rng.standard_normal(channels) * 0.1).astype(np.float32))
        scale = jnp.asarray((1 + rng.standard_normal(channels) * 0.1).astype(np.float32))
        ln_bias = jnp.asarray((rng.standard_normal(channels) * 0.1).astype(np.float32))

        def fused_loss(kernel, bias, scale, ln_bias):
            out = fused_frame_conv(audio, kernel, bias, scale, ln_bias)
            return (out.astype(jnp.float32) ** 2).sum()

        def flax_loss(kernel, bias, scale, ln_bias):
            conv = nn.Conv(channels, (10,), (5,), padding="VALID", use_bias=True, dtype=jnp.bfloat16)
            h = conv.apply({"params": {"kernel": kernel, "bias": bias}},
                           audio[:, :, None].astype(jnp.bfloat16))
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16).apply(
                {"params": {"scale": scale, "bias": ln_bias}}, h
            )
            out = nn.gelu(h, approximate=False)
            return (out.astype(jnp.float32) ** 2).sum()

        fused_grads = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(kernel, bias, scale, ln_bias)
        flax_grads = jax.grad(flax_loss, argnums=(0, 1, 2, 3))(kernel, bias, scale, ln_bias)
        for fused, plain in zip(fused_grads, flax_grads):
            scale_ref = max(float(np.abs(np.asarray(plain)).max()), 1.0)
            np.testing.assert_allclose(
                np.asarray(fused) / scale_ref, np.asarray(plain) / scale_ref, atol=0.02
            )


class TestFastGelu:
    """fast_gelu must be indistinguishable from exact (erf) GELU at output
    precision: f32 inputs use the true erf form; bf16 inputs may differ by at
    most 1 ulp on a small fraction of values."""

    def test_f32_is_exact(self):
        from allophant_tpu.ops.activations import fast_gelu

        x = jnp.asarray(np.linspace(-12.0, 12.0, 4001), jnp.float32)
        exact = 0.5 * x * (1.0 + jax.lax.erf(x * np.float32(2**-0.5)))
        np.testing.assert_array_equal(np.asarray(fast_gelu(x)), np.asarray(exact))

    def test_bf16_within_one_ulp_or_noise_floor(self):
        from allophant_tpu.ops.activations import fast_gelu

        from scipy.special import erf as scipy_erf

        # Every finite bf16 value (scipy f64 erf as the platform-independent
        # ground truth: jax.lax.erf itself misbehaves for huge args on some
        # backends).
        bits = (np.arange(2**16, dtype=np.uint32) << 16).view(np.float32)
        values = bits[np.isfinite(bits)]
        x = jnp.asarray(values, jnp.bfloat16)
        exact = jnp.asarray(
            0.5 * values.astype(np.float64) * (1.0 + scipy_erf(values / np.sqrt(2.0))),
            jnp.bfloat16,
        )
        fast = fast_gelu(x)
        mismatched = np.asarray(exact != fast)
        # Differences are single-ulp rounding flips, or deep-tail outputs whose
        # magnitude (< 3e-5) is below bf16 resolution of O(1) activations.
        exact_f = np.asarray(exact.astype(jnp.float32))[mismatched]
        fast_f = np.asarray(fast.astype(jnp.float32))[mismatched]
        ulp = np.abs(np.spacing(exact_f.astype(np.float32))) * 2**16  # bf16 spacing
        assert np.all(np.abs(exact_f - fast_f) <= np.maximum(ulp, 5e-5))

    def test_saturated_tails(self):
        from allophant_tpu.ops.activations import fast_gelu

        x = jnp.asarray([-50.0, -8.0, 8.0, 50.0], jnp.bfloat16)
        out = np.asarray(fast_gelu(x).astype(jnp.float32))
        np.testing.assert_allclose(out, [0.0, 0.0, 8.0, 50.0], atol=1e-6)


class TestOneshotAttention:
    """Short-sequence single-pass attention kernel (interpret mode on CPU)."""

    def _random_inputs(self, batch=2, time=256, heads=4, head_dim=32):
        rng = np.random.default_rng(7)
        model_dim = heads * head_dim
        q, k, v = (
            jnp.asarray(rng.standard_normal((batch, time, model_dim)).astype(np.float32))
            for _ in range(3)
        )
        lengths = np.full(batch, time)
        lengths[0] = time - 37
        mask = np.arange(time)[None, :] < lengths[:, None]
        bias = jnp.asarray(np.where(mask, 0.0, -1e9).astype(np.float32))
        return q, k, v, bias, mask, heads, head_dim

    def test_forward_matches_reference(self):
        from allophant_tpu.ops.oneshot_attention import _oneshot_forward, _reference_bthd

        q, k, v, bias, mask, heads, head_dim = self._random_inputs()
        scale = head_dim**-0.5
        out = np.asarray(_oneshot_forward(q, k, v, bias, scale, heads, interpret=True))
        expected = np.asarray(_reference_bthd(q, k, v, bias, scale, heads))
        valid = np.broadcast_to(mask[:, :, None], out.shape)
        np.testing.assert_allclose(out[valid], expected[valid], atol=2e-5)

    def test_backward_delegate_matches_reference_attention(self):
        # The custom-VJP backward differentiates _reference_bthd; its forward
        # semantics must match the einsum reference used everywhere else.
        from allophant_tpu.ops.oneshot_attention import _reference_bthd

        q, k, v, bias, mask, heads, head_dim = self._random_inputs()
        batch, time, model_dim = q.shape
        scale = head_dim**-0.5
        shape = (batch, time, heads, head_dim)
        expected = reference_attention(
            q.reshape(shape),
            k.reshape(shape),
            v.reshape(shape),
            jnp.asarray(mask),
            scale,
        ).reshape(batch, time, model_dim)
        out = _reference_bthd(q, k, v, bias, scale, heads)
        valid = np.broadcast_to(mask[:, :, None], expected.shape)
        np.testing.assert_allclose(
            np.asarray(out)[valid], np.asarray(expected)[valid], atol=2e-5
        )

    def test_gradients_flow_through_custom_vjp(self, monkeypatch):
        import functools

        from allophant_tpu.ops import oneshot_attention as osa

        q, k, v, bias, mask, heads, head_dim = self._random_inputs(time=128)
        scale = head_dim**-0.5

        # Force the custom-vjp primal through the interpreter so grad of the
        # real oneshot_attention entry point works on CPU.
        monkeypatch.setattr(
            osa, "_oneshot_forward", functools.partial(osa._oneshot_forward, interpret=True)
        )

        def loss(q, k, v):
            fwd = osa.oneshot_attention(q, k, v, bias, scale, heads)
            return (fwd**2).sum()

        def loss_ref(q, k, v):
            return (osa._reference_bthd(q, k, v, bias, scale, heads) ** 2).sum()

        grads = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        expected = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        # The backward delegates to _reference_bthd; only the cotangent (from
        # the kernel's forward values) differs, at kernel numerical precision.
        for got, want in zip(grads, expected):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    def test_headblocked_long_sequence_matches_reference(self):
        # T > MAX_ONESHOT_TIME routes through the head-blocked grid.
        from allophant_tpu.ops import oneshot_attention as osa

        q, k, v, bias, mask, heads, head_dim = self._random_inputs(
            batch=1, time=osa.MAX_ONESHOT_TIME + 128, heads=4, head_dim=16
        )
        scale = head_dim**-0.5
        out = np.asarray(osa._oneshot_forward(q, k, v, bias, scale, heads, interpret=True))
        expected = np.asarray(osa._reference_bthd(q, k, v, bias, scale, heads))
        valid = np.broadcast_to(mask[:, :, None], out.shape)
        np.testing.assert_allclose(out[valid], expected[valid], atol=2e-5)

    def test_query_blocked_very_long_sequence_matches_reference(self):
        # T > MAX_HEADBLOCK_TIME routes through the query-blocked grid (exact
        # single-pass softmax over the full key axis per query block).
        from allophant_tpu.ops import oneshot_attention as osa

        q, k, v, bias, mask, heads, head_dim = self._random_inputs(
            batch=1, time=osa.MAX_HEADBLOCK_TIME + 512, heads=4, head_dim=16
        )
        scale = head_dim**-0.5
        out = np.asarray(osa._oneshot_forward(q, k, v, bias, scale, heads, interpret=True))
        expected = np.asarray(osa._reference_bthd(q, k, v, bias, scale, heads))
        valid = np.broadcast_to(mask[:, :, None], out.shape)
        np.testing.assert_allclose(out[valid], expected[valid], atol=2e-5)

    def test_query_blocked_non_multiple_of_query_block(self):
        # A padded length that is a multiple of 128 but not of 256 falls back to
        # 128-wide query blocks.
        from allophant_tpu.ops import oneshot_attention as osa

        time = osa.MAX_HEADBLOCK_TIME + 128
        assert time % 256 != 0
        q, k, v, bias, mask, heads, head_dim = self._random_inputs(
            batch=1, time=time, heads=2, head_dim=16
        )
        scale = head_dim**-0.5
        out = np.asarray(osa._oneshot_forward(q, k, v, bias, scale, heads, interpret=True))
        expected = np.asarray(osa._reference_bthd(q, k, v, bias, scale, heads))
        valid = np.broadcast_to(mask[:, :, None], out.shape)
        np.testing.assert_allclose(out[valid], expected[valid], atol=2e-5)

    def test_headblocked_odd_head_count(self):
        # Odd head counts fall back to one head per grid cell; every head's
        # output must still be written (regression: heads 3 previously left the
        # last head uninitialized).
        from allophant_tpu.ops import oneshot_attention as osa

        q, k, v, bias, mask, heads, head_dim = self._random_inputs(
            batch=1, time=osa.MAX_ONESHOT_TIME + 128, heads=3, head_dim=16
        )
        scale = head_dim**-0.5
        out = np.asarray(osa._oneshot_forward(q, k, v, bias, scale, heads, interpret=True))
        expected = np.asarray(osa._reference_bthd(q, k, v, bias, scale, heads))
        valid = np.broadcast_to(mask[:, :, None], out.shape)
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[valid], expected[valid], atol=2e-5)


class TestKernelAttentionDropout:
    """In-kernel attention-weight dropout (oneshot_dropout_attention).

    The Mosaic PRNG has no interpret-mode lowering, so the kernel-execution
    tests are gated on a real TPU backend (run them with
    ``ALLOPHANT_TEST_TPU=1 python -m pytest tests/test_kernels.py -k Dropout``
    — the conftest forces the cpu platform otherwise); the routing and
    threshold math tests run everywhere."""

    def test_keep_threshold_math(self):
        from allophant_tpu.ops.oneshot_attention import _keep_threshold

        assert _keep_threshold(0.0) == 2**32 - 1
        # rate 0.1 -> keep probability within 2^-32 of 0.9
        threshold = _keep_threshold(0.1)
        assert abs(float(threshold) / 2**32 - 0.9) < 1e-9
        assert _keep_threshold(1.0) == 0

    def test_vmem_fit_model(self):
        """The dropout variant's VMEM budget is tighter than the plain full
        plan: calibrated on-device (D=1024: bf16 T=512 compiles, bf16 T=640 and
        f32 T=512 overflow the 16 MB scoped limit)."""
        from allophant_tpu.ops.oneshot_attention import plan_oneshot, plan_oneshot_dropout

        # The flagship training shape fits.
        assert plan_oneshot_dropout(16, 64, 512, 2) is not None
        # Shapes the plain full plan allows but the dropout draws push over.
        assert plan_oneshot(16, 64, 640, 2) == ("full", 16)
        assert plan_oneshot_dropout(16, 64, 640, 2) is None
        assert plan_oneshot_dropout(16, 64, 512, 4) is None
        # Non-full plans never support in-kernel dropout.
        assert plan_oneshot_dropout(16, 64, 1024, 2) is None

    @pytest.mark.skipif(
        jax.default_backend() in ("tpu", "axon"),
        reason="asserts the CPU fallback; on TPU the kernel path is expected",
    )
    def test_routing_falls_back_on_cpu(self):
        """CPU backends must not take the kernel-dropout path (no Mosaic PRNG):
        kernel_dropout_supported gates on the flash/Pallas TPU backend."""
        from allophant_tpu.ops.attention import kernel_dropout_supported

        assert not kernel_dropout_supported(4, 64, 512, 4)

    def test_training_forward_applies_dropout_on_cpu(self):
        """The einsum fallback still applies weight dropout under training
        (statistically: dropped weights change the context output)."""
        import flax.linen as nn

        from allophant_tpu.ops.attention import multi_head_attention

        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.standard_normal((2, 64, 4, 16)).astype(np.float32))
        deterministic = multi_head_attention(q, q, q, None, 0.25)

        class Wrapper(nn.Module):
            @nn.compact
            def __call__(self, x):
                return multi_head_attention(
                    x, x, x, None, 0.25,
                    dropout_module=nn.Dropout(0.5),
                    deterministic=False,
                    dropout_rate=0.5,
                )

        out = Wrapper().apply({}, q, rngs={"dropout": jax.random.PRNGKey(0)})
        assert not np.allclose(np.asarray(out), np.asarray(deterministic), atol=1e-3)

    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="Mosaic PRNG requires a real TPU backend",
    )
    def test_kernel_forward_matches_masked_einsum(self):
        """The kernel's in-VMEM mask must equal the backward's regenerated mask:
        forward output == einsum formulation fed the dumped mask bits."""
        from allophant_tpu.ops.oneshot_attention import (
            NEG_INF,
            _dropout_mask_bits,
            _keep_threshold,
            _reference_bthd_dropout,
            oneshot_dropout_attention,
        )

        batch, time, heads, head_dim = 2, 256, 4, 64
        rate = 0.1
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        bias = jnp.zeros((batch, time), jnp.float32).at[:, 200:].set(NEG_INF)
        seeds = jnp.asarray([123, 456], jnp.int32)
        scale = head_dim**-0.5

        out = jax.jit(lambda *a: oneshot_dropout_attention(*a, scale, heads, rate))(
            q, k, v, bias, seeds
        )
        out_again = jax.jit(lambda *a: oneshot_dropout_attention(*a, scale, heads, rate))(
            q, k, v, bias, seeds
        )
        assert (np.asarray(out) == np.asarray(out_again)).all()  # deterministic in seeds

        bits = jax.jit(lambda s: _dropout_mask_bits(s, batch, heads, time))(seeds)
        keep = np.asarray(bits) < _keep_threshold(rate)
        assert abs(keep.mean() - 0.9) < 5e-3
        expected = _reference_bthd_dropout(q, k, v, bias, jnp.asarray(keep), scale, heads, rate)
        # MXU default-precision drift only (inputs pass the MXU in bf16).
        np.testing.assert_allclose(
            np.asarray(out)[:, :200], np.asarray(expected)[:, :200], atol=2e-2
        )

    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="Mosaic PRNG requires a real TPU backend",
    )
    def test_kernel_gradients_match_masked_einsum(self):
        from allophant_tpu.ops.oneshot_attention import (
            NEG_INF,
            _dropout_mask_bits,
            _keep_threshold,
            _reference_bthd_dropout,
            oneshot_dropout_attention,
        )

        batch, time, heads, head_dim = 2, 128, 2, 64
        rate = 0.2
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        bias = jnp.zeros((batch, time), jnp.float32)
        seeds = jnp.asarray([7, 11], jnp.int32)
        scale = head_dim**-0.5

        grads = jax.jit(
            jax.grad(
                lambda q_, k_, v_: (
                    oneshot_dropout_attention(q_, k_, v_, bias, seeds, scale, heads, rate) ** 2
                ).sum(),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
        assert all(np.isfinite(np.asarray(g)).all() for g in grads)

        bits = jax.jit(lambda s: _dropout_mask_bits(s, batch, heads, time))(seeds)
        keep = jnp.asarray(np.asarray(bits) < _keep_threshold(rate))
        reference_grads = jax.jit(
            jax.grad(
                lambda q_, k_, v_: (
                    _reference_bthd_dropout(q_, k_, v_, bias, keep, scale, heads, rate) ** 2
                ).sum(),
                argnums=(0, 1, 2),
            )
        )(q, k, v)
        for got, expected in zip(grads, reference_grads):
            # Cotangents differ by the kernel-vs-einsum primal drift; bound loosely.
            np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=5e-2)

    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="Pallas backward kernel requires a real TPU backend",
    )
    def test_fused_backward_matches_masked_einsum(self):
        """The fused Pallas backward (mask regenerated in VMEM) must produce
        the masked-einsum formulation's gradients."""
        from allophant_tpu.ops.oneshot_attention import (
            NEG_INF,
            _bwd_kernel_supported,
            _dropout_mask_bits,
            _keep_threshold,
            _reference_bthd_dropout,
            oneshot_dropout_attention,
        )

        batch, time, heads, head_dim = 2, 256, 4, 64
        rate = 0.1
        assert _bwd_kernel_supported(heads, head_dim, time, 4)
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        bias = jnp.zeros((batch, time), jnp.float32).at[:, 200:].set(NEG_INF)
        seeds = jnp.asarray([123, 456], jnp.int32)
        scale = head_dim**-0.5

        def loss(q_, k_, v_):
            out = oneshot_dropout_attention(q_, k_, v_, bias, seeds, scale, heads, rate)
            return (out[:, :200] ** 2).sum()

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

        bits = jax.jit(lambda s: _dropout_mask_bits(s, batch, heads, time))(seeds)
        keep = jnp.asarray(np.asarray(bits) < _keep_threshold(rate))

        def loss_ref(q_, k_, v_):
            out = _reference_bthd_dropout(q_, k_, v_, bias, keep, scale, heads, rate)
            return (out[:, :200] ** 2).sum()

        reference = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        for got, expected in zip(grads, reference):
            scale_bound = float(np.abs(np.asarray(expected)).max())
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(expected), atol=0.01 * scale_bound
            )

    @pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="Pallas backward kernel requires a real TPU backend",
    )
    def test_fused_backward_no_dropout_matches_einsum(self):
        """oneshot_attention's backward takes the fused kernel (rate=None) on
        supported shapes; gradients must match the einsum formulation."""
        from allophant_tpu.ops import oneshot_attention as osa

        batch, time, heads, head_dim = 2, 256, 4, 64
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        k = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        v = jnp.asarray(rng.standard_normal((batch, time, heads * head_dim)).astype(np.float32))
        bias = jnp.zeros((batch, time), jnp.float32).at[:, 200:].set(osa.NEG_INF)
        scale = head_dim**-0.5

        def loss(q_, k_, v_):
            return (osa.oneshot_attention(q_, k_, v_, bias, scale, heads)[:, :200] ** 2).sum()

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

        def loss_ref(q_, k_, v_):
            return (osa._reference_bthd(q_, k_, v_, bias, scale, heads)[:, :200] ** 2).sum()

        reference = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
        for got, expected in zip(grads, reference):
            scale_bound = float(np.abs(np.asarray(expected)).max())
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(expected), atol=0.01 * scale_bound
            )
