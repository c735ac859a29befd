"""W8A8 int8 path: matmul numerics + end-to-end depth error bound."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from txr.models.depth_anything import build_model
from txr.ops.quant import Int8Dense, int8_matmul, quantize_weight


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestQuantOps:
    def test_weight_roundtrip(self, rng):
        w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
        wq, s = quantize_weight(w)
        back = wq.astype(jnp.float32) * s
        # symmetric per-column quant: error <= scale/2 = colmax/254
        err = np.abs(np.asarray(back - w))
        bound = np.asarray(jnp.max(jnp.abs(w), axis=0)) / 254.0 + 1e-6
        assert (err <= bound[None, :]).all()

    def test_matmul_close_to_f32(self, rng):
        x = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(96, 80)).astype(np.float32))
        wq, s = quantize_weight(w)
        got = np.asarray(int8_matmul(x, wq, s, out_dtype=jnp.float32))
        ref = np.asarray(x @ w)
        # relative error vs the magnitude of the output row
        denom = np.maximum(np.abs(ref).max(axis=-1, keepdims=True), 1e-3)
        assert np.median(np.abs(got - ref) / denom) < 0.01
        assert np.abs(got - ref).max() / denom.max() < 0.08

    def test_int8dense_param_tree_matches_dense(self, rng):
        import flax.linen as nn
        x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        pd = nn.Dense(8).init(jax.random.PRNGKey(0), x)["params"]
        pq = Int8Dense(8).init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)
        assert all(a.shape == b.shape for a, b in
                   zip(jax.tree_util.tree_leaves(pd), jax.tree_util.tree_leaves(pq)))


class TestQuantDepthModel:
    def test_vits_depth_error_bound(self, rng):
        """int8 encoder vs f32 encoder on the same params: the depth map must
        agree to a few percent of its dynamic range (random init, 126x126)."""
        mf, _, _ = build_model("v2", "vits", use_flash=False)
        mq, _, _ = build_model("v2", "vits", use_flash=False, quant="int8")
        x = jnp.asarray(rng.normal(size=(1, 126, 126, 3)).astype(np.float32) * 0.5)
        params = mf.init(jax.random.PRNGKey(1), x)["params"]
        df = np.asarray(mf.apply({"params": params}, x))
        dq = np.asarray(mq.apply({"params": params}, x))
        rng_span = max(float(df.max() - df.min()), 1e-6)
        rel = np.abs(dq - df) / rng_span
        assert np.median(rel) < 0.02, f"median rel err {np.median(rel)}"
        assert rel.max() < 0.15, f"max rel err {rel.max()}"


class TestQuantPallas:
    def test_int8_linear_matches_int8_matmul(self, rng):
        from txr.ops.quant_pallas import int8_linear
        x = jnp.asarray(rng.normal(size=(300, 96)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(96, 130)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(130,)).astype(np.float32))
        wq, s = quantize_weight(w)
        ref = np.asarray(int8_matmul(x, wq, s, out_dtype=jnp.float32)) + \
            np.asarray(b)[None, :]
        got = np.asarray(int8_linear(x, w, b, block_m=128, block_n=128))
        # identical quantization recipe; interpret-mode kernel == XLA path
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)

    def test_int8dense_pallas_param_tree(self, rng):
        import flax.linen as nn
        from txr.ops.quant import Int8DensePallas
        x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        pd = nn.Dense(8).init(jax.random.PRNGKey(0), x)["params"]
        pq = Int8DensePallas(8).init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)

    def test_vits_int8p_close_to_int8(self, rng):
        mq, _, _ = build_model("v2", "vits", use_flash=False, quant="int8")
        mp, _, _ = build_model("v2", "vits", use_flash=False, quant="int8p")
        x = jnp.asarray(rng.normal(size=(1, 70, 70, 3)).astype(np.float32) * 0.5)
        params = mq.init(jax.random.PRNGKey(1), x)["params"]
        dq = np.asarray(mq.apply({"params": params}, x))
        dp = np.asarray(mp.apply({"params": params}, x))
        span = max(float(dq.max() - dq.min()), 1e-6)
        assert np.abs(dp - dq).max() / span < 0.02
