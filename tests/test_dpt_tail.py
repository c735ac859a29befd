"""Parity tests for the fused DPT output-head tail kernel (interpret mode).

Oracle: the pure-XLA unfused semantics (resize + conv2 + relu + conv3),
which tests/test_models.py already pins against HF torch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.ops.dpt_tail import fused_head_tail, head_tail_reference


def make_case(rng, b, hin, win, hout, wout, c, feat, dtype):
    x = rng.normal(size=(b, hin, win, c)).astype(np.float32)
    w2 = (rng.normal(size=(3, 3, c, feat)) * 0.1).astype(np.float32)
    b2 = rng.normal(size=(feat,)).astype(np.float32)
    w3 = rng.normal(size=(feat,)).astype(np.float32)
    b3 = rng.normal(size=(1,)).astype(np.float32)
    args = [jnp.asarray(a, dtype) for a in (x, w2, b2, w3, b3)]
    return args


class TestFusedTail:
    @pytest.mark.parametrize("shape", [
        (2, 32, 32, 36, 42, 128, 32),
        (1, 16, 16, 30, 28, 128, 32),   # single input block (window clamps)
        (1, 32, 48, 40, 84, 128, 16),
    ])
    def test_matches_reference_f32(self, rng, shape):
        b, hin, win, hout, wout, c, feat = shape
        x, w2, b2, w3, b3 = make_case(rng, *shape, jnp.float32)
        ref = head_tail_reference(x, w2, b2, w3, b3, hout, wout)
        got = fused_head_tail(x, w2, b2, w3, b3, hout, wout, interpret=True)
        assert got.shape == ref.shape == (b, hout, wout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("shape", [
        (1, 176, 16, 180, 20, 8, 8),    # near-1 ratio: window can't cover
        (1, 64, 16, 40, 20, 8, 8),      # downsample
        (1, 32, 16, 1, 20, 8, 8),       # out_h == 1 (ratio zero division)
        (1, 176, 16, 184, 20, 8, 8),    # another tight ratio
    ])
    def test_uncoverable_shapes_fall_back_exactly(self, rng, shape):
        """Regression: near-1 upsample ratios and downsamples need more
        input rows per grid step than the two-block window holds; the
        kernel's clips then silently read WRONG rows (confirmed maxerr
        0.40 at 176->180). These shapes must route to the XLA reference."""
        b, hin, win, hout, wout, c, feat = shape
        x, w2, b2, w3, b3 = make_case(rng, *shape, jnp.float32)
        ref = head_tail_reference(x, w2, b2, w3, b3, hout, wout)
        got = fused_head_tail(x, w2, b2, w3, b3, hout, wout, interpret=True)
        assert got.shape == ref.shape == (b, hout, wout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_shipped_dpt_ratio_stays_fused(self):
        """The DPT head's real ratio (hin/out_h ~ 0.57) must keep using the
        fused kernel — the coverage guard may not over-trigger."""
        from txr.ops.dpt_tail import _window_covers
        assert _window_covers(296, 518)      # ViT-L 1080p bench shape
        assert _window_covers(37 * 8, 518)   # 518-square operating point
        assert not _window_covers(176, 180)
        assert not _window_covers(64, 40)
        assert not _window_covers(32, 1)

    def test_matches_reference_bf16(self, rng):
        shape = (1, 32, 32, 36, 42, 128, 32)
        x, w2, b2, w3, b3 = make_case(rng, *shape, jnp.bfloat16)
        ref = head_tail_reference(x, w2, b2, w3, b3, 36, 42)
        got = fused_head_tail(x, w2, b2, w3, b3, 36, 42, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            rtol=0.1, atol=0.12)

    def test_edge_zero_padding(self, rng):
        """conv2's zero padding beyond the image must survive fusion: a
        constant input stays constant in the interior but NOT at borders."""
        b, hin, win, hout, wout, c, feat = 1, 16, 16, 30, 28, 64, 8
        x = jnp.ones((b, hin, win, c), jnp.float32)
        w2 = jnp.full((3, 3, c, feat), 0.01, jnp.float32)
        b2 = jnp.zeros((feat,), jnp.float32)
        w3 = jnp.ones((feat,), jnp.float32)
        b3 = jnp.zeros((1,), jnp.float32)
        ref = head_tail_reference(x, w2, b2, w3, b3, hout, wout)
        got = fused_head_tail(x, w2, b2, w3, b3, hout, wout, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        r = np.asarray(ref)
        assert r[0, 0, 0] < r[0, hout // 2, wout // 2]  # border < interior
