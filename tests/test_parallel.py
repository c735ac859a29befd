"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from txr.models.depth_anything import DepthAnythingFlax
from txr.models.vit import ViTConfig
from txr.models.dpt import DPTConfig
from txr.parallel.mesh import make_mesh, shard_params, shard_batch
from txr.train import (
    TrainState,
    make_optimizer,
    make_train_step,
    silog_loss,
    init_train_state,
)


def tiny_pair():
    vit = ViTConfig(hidden_size=64, num_layers=2, num_heads=4,
                    pos_embed_size=4, out_layers=(0, 0, 1, 1), use_flash=False)
    dpt = DPTConfig(features=32, out_channels=(16, 16, 32, 32), head_hidden=16)
    return DepthAnythingFlax(vit=vit, dpt=dpt)


class TestMesh:
    def test_mesh_shapes(self, devices):
        mesh = make_mesh(dp=4, tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}
        mesh = make_mesh(tp=2)
        assert mesh.shape == {"dp": 4, "tp": 2}

    def test_param_sharding_rules(self, devices):
        mesh = make_mesh(dp=4, tp=2)
        model = tiny_pair()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 56, 56, 3)))["params"]
        sharded = shard_params(params, mesh)
        qkv = sharded["encoder"]["block_0"]["attn"]["qkv"]["kernel"]
        spec = qkv.sharding.spec
        assert spec == P(None, "tp")
        proj = sharded["encoder"]["block_0"]["attn"]["proj"]["kernel"]
        assert proj.sharding.spec == P("tp", None)
        conv = sharded["encoder"]["patch_embed"]["kernel"]
        assert conv.sharding.spec == P()

    def test_sharded_forward_matches_single(self, devices, rng):
        mesh = make_mesh(dp=4, tp=2)
        model = tiny_pair()
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 56, 56, 3)))["params"]
        x = rng.normal(size=(4, 56, 56, 3)).astype(np.float32)
        ref = model.apply({"params": params}, jnp.asarray(x))
        sp = shard_params(params, mesh)
        xb = shard_batch(jnp.asarray(x), mesh)
        with mesh:
            got = jax.jit(lambda p, a: model.apply({"params": p}, a))(sp, xb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestTrain:
    def test_silog_zero_for_exact(self):
        pred = jnp.full((1, 8, 8), 3.0)
        assert float(silog_loss(pred, pred, jnp.ones((1, 8, 8), bool))) == pytest.approx(0.0)

    def test_train_step_reduces_loss(self, rng):
        model = tiny_pair()
        opt = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=100)
        state = init_train_state(model, opt, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, opt))
        images = jnp.asarray(rng.normal(size=(2, 56, 56, 3)).astype(np.float32))
        target = jnp.full((2, 56, 56), 2.5)
        mask = jnp.ones((2, 56, 56), bool)
        state, loss0 = step(state, images, target, mask)
        losses = []
        for _ in range(25):
            state, loss = step(state, images, target, mask)
            losses.append(float(loss))
        assert min(losses) < float(loss0)
        assert int(state.step) == 26

    def test_sharded_train_step(self, devices, rng):
        """The full dryrun path: one sharded train step on the 8-dev mesh."""
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestGraftEntry:
    def test_entry_compiles_tiny(self):
        """entry() returns (fn, args); compile-check on a reduced clone."""
        model = tiny_pair()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))["params"]
        fn = jax.jit(lambda p, x: model.apply({"params": p}, x))
        out = fn(params, jnp.zeros((1, 56, 56, 3)))
        assert out.shape == (1, 56, 56)
