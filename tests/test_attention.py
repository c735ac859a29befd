"""Pallas attention kernels vs the XLA reference, via interpret mode on CPU.

The compiled kernels are exercised on the real chip (tools/bench_attention.py
parity block); this suite pins the kernel LOGIC — online-softmax streaming,
the full-K single pass with the zero-pad normalizer correction, and the
fused-qkv two-heads-per-program layout — on every CI run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from txr.ops.attention import (attention_flash, attention_flash_fused,
                               attention_xla, _fused_reference)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestFlashKernel:
    def test_streaming_matches_xla(self, rng):
        b, h, s, d = 2, 4, 75, 16
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
                   for _ in range(3))
        ref = attention_xla(q, k, v)
        got = attention_flash(q, k, v, block_q=32, block_k=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_kv_len_truncation(self, rng):
        b, h, s, d = 1, 2, 64, 8
        q, k, v = (jnp.asarray(rng.normal(size=(b, h, s, d)).astype(np.float32))
                   for _ in range(3))
        ref = attention_xla(q, k, v, kv_len=40)
        got = attention_flash(q, k, v, kv_len=40, block_q=32, block_k=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestFusedKernel:
    @pytest.mark.parametrize("s", [64, 75])   # exact block fit and ragged pad
    def test_1pass_matches_reference(self, rng, s):
        b, h, d = 2, 4, 16
        qkv = jnp.asarray(rng.normal(size=(b, s, 3 * h * d)).astype(np.float32))
        ref = _fused_reference(qkv, h, d)
        got = attention_flash_fused(qkv, h, d, block_q=64)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)

    def test_streaming_path_matches_reference(self, rng):
        b, s, h, d = 1, 96, 2, 8
        qkv = jnp.asarray(rng.normal(size=(b, s, 3 * h * d)).astype(np.float32))
        ref = _fused_reference(qkv, h, d)
        got = attention_flash_fused(qkv, h, d, block_q=32, block_k=32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)

    def test_1pass_extreme_negative_logits_stay_finite(self, rng):
        # The zero-pad normalizer trick degrades only if every valid logit is
        # below ~-80; at plausible extremes the output must remain finite.
        b, s, h, d = 1, 40, 2, 8
        qkv = jnp.asarray((rng.normal(size=(b, s, 3 * h * d)) * 8.0
                           ).astype(np.float32))
        got = attention_flash_fused(qkv, h, d, block_q=32)
        assert np.isfinite(np.asarray(got)).all()

    @pytest.mark.parametrize("s", [64, 75])
    def test_boundmax_matches_reference(self, rng, s):
        # boundmax replaces the exact row max with a Cauchy-Schwarz bound;
        # softmax is shift-invariant, so within the documented logit range
        # (+-83 nats of the bound) the result is the same math.
        b, h, d = 2, 4, 16
        qkv = jnp.asarray(rng.normal(size=(b, s, 3 * h * d)).astype(np.float32))
        ref = _fused_reference(qkv, h, d)
        got = attention_flash_fused(qkv, h, d, block_q=64,
                                    score_mode="boundmax")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)

    def test_boundmax_extreme_logits_stay_finite(self, rng):
        # Beyond ~83 nats the clamp saturates but the output must remain
        # finite (no inf normalizer, no NaN).
        b, s, h, d = 1, 64, 2, 64
        qkv = jnp.asarray((rng.normal(size=(b, s, 3 * h * d)) * 6.0
                           ).astype(np.float32))
        got = attention_flash_fused(qkv, h, d, block_q=32,
                                    score_mode="boundmax")
        assert np.isfinite(np.asarray(got)).all()
