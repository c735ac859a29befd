"""Parity for the flat-stripe 3x3 conv kernel (interpret mode) vs XLA."""

import numpy as np
import jax.numpy as jnp
import pytest

from txr.ops.conv_stripe import conv3x3_stripe, conv3x3_reference


class TestConvStripe:
    @pytest.mark.parametrize("shape,relu_in", [
        ((2, 20, 24, 128, 32), False),
        ((1, 16, 33, 64, 64), True),     # odd W (stripe padding), relu_in
        ((1, 37, 20, 128, 16), False),   # H not a block multiple
    ])
    def test_matches_xla(self, rng, shape, relu_in):
        b, h, w, c, f = shape
        x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
        wk = jnp.asarray((rng.normal(size=(3, 3, c, f)) * 0.1).astype(np.float32))
        bb = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
        ref = conv3x3_reference(x, wk, bb, relu_in=relu_in)
        got = conv3x3_stripe(x, wk, bb, relu_in=relu_in, interpret=True)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_bf16(self, rng):
        b, h, w, c, f = 1, 18, 24, 128, 32
        x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        wk = jnp.asarray(rng.normal(size=(3, 3, c, f)) * 0.1, jnp.bfloat16)
        bb = jnp.asarray(rng.normal(size=(f,)), jnp.bfloat16)
        ref = conv3x3_reference(x, wk, bb)
        got = conv3x3_stripe(x, wk, bb, interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=0.1, atol=0.15)

    def test_rcu_composition(self, rng):
        """relu->conv->relu->conv + residual == the DPT ResidualConvUnit."""
        import flax.linen as nn
        import jax
        from txr.models.dpt import ResidualConvUnit

        c = 64
        x = jnp.asarray(rng.normal(size=(1, 18, 20, c)).astype(np.float32))
        rcu = ResidualConvUnit(c)
        params = rcu.init(jax.random.PRNGKey(0), x)["params"]
        ref = rcu.apply({"params": params}, x)
        h1 = conv3x3_stripe(x, params["conv1"]["kernel"],
                            params["conv1"]["bias"], relu_in=True,
                            interpret=True)
        h2 = conv3x3_stripe(h1, params["conv2"]["kernel"],
                            params["conv2"]["bias"], relu_in=True,
                            interpret=True)
        got = x + h2
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
