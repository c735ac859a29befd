"""DPTHead fused-kernel integration: parity, param-tree equality, training.

The fused path (DPTConfig.fused_head=True) routes the big RCU convs, output
conv1, and the resize+conv2+relu+conv3 tail through the Pallas kernels
(interpreted on CPU). It must (a) produce the unfused XLA result, (b) keep
an IDENTICAL parameter tree (checkpoints are path-agnostic), and (c) be
differentiable (custom VJP through the XLA reference backward).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.models.vit import ViTConfig
from txr.models.dpt import DPTConfig, DPTHead
from txr.models.depth_anything import DepthAnythingFlax


def tiny(fused):
    vit = ViTConfig(hidden_size=32, num_layers=2, num_heads=2,
                    pos_embed_size=4, out_layers=(0, 0, 1, 1),
                    use_flash=False)
    dpt = DPTConfig(features=32, out_channels=(16, 16, 32, 32),
                    head_hidden=16, fused_head=fused, fused_convs=fused)
    return DepthAnythingFlax(vit=vit, dpt=dpt)


class TestFusedHead:
    def test_param_tree_identical(self):
        mu = tiny(False)
        mf = tiny(True)
        x = jnp.zeros((1, 56, 56, 3), jnp.float32)
        pu = jax.eval_shape(lambda k: mu.init(k, x), jax.random.PRNGKey(0))
        pf = jax.eval_shape(lambda k: mf.init(k, x), jax.random.PRNGKey(0))
        fu = dict(jax.tree_util.tree_leaves_with_path(pu["params"]))
        ff = dict(jax.tree_util.tree_leaves_with_path(pf["params"]))
        assert fu.keys() == ff.keys()
        for k in fu:
            assert fu[k].shape == ff[k].shape, k

    def test_forward_parity(self, rng):
        mu = tiny(False)
        mf = tiny(True)
        params = mu.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 56, 56, 3), jnp.float32))["params"]
        x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))
        ref = mu.apply({"params": params}, x)
        got = mf.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)

    def test_head_fused_forces_big_maps(self, rng):
        """At a larger map the RCU stripe kernels engage (area gate) and
        still match."""
        dpt = DPTConfig(features=32, out_channels=(16, 16, 32, 32),
                        head_hidden=16)
        hu = DPTHead(DPTConfig(**{**dpt.__dict__, "fused_head": False}))
        hf = DPTHead(DPTConfig(**{**dpt.__dict__, "fused_head": True,
                                  "fused_convs": True}))
        ph, pw = 8, 14   # fusion_0 map = (8*4, 14*4) = (32, 56)
        hs = [jnp.asarray(rng.normal(size=(1, 1 + ph * pw, 32))
                          .astype(np.float32)) for _ in range(4)]
        params = hu.init(jax.random.PRNGKey(1), hs, ph, pw)["params"]
        ref = hu.apply({"params": params}, hs, ph, pw)
        got = hf.apply({"params": params}, hs, ph, pw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)

    def test_grad_through_fused(self, rng):
        """Training step through the fused head: custom VJP (XLA-reference
        backward) produces the unfused gradients."""
        mu = tiny(False)
        mf = tiny(True)
        params = mu.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 56, 56, 3), jnp.float32))["params"]
        x = jnp.asarray(rng.normal(size=(1, 56, 56, 3)).astype(np.float32))

        def loss(m):
            return lambda p: jnp.mean(
                (m.apply({"params": p}, x) - 2.0) ** 2)

        gu = jax.grad(loss(mu))(params)
        gf = jax.grad(loss(mf))(params)
        fu = dict(jax.tree_util.tree_leaves_with_path(gu))
        ff = dict(jax.tree_util.tree_leaves_with_path(gf))
        for k in fu:
            np.testing.assert_allclose(np.asarray(ff[k]), np.asarray(fu[k]),
                                       rtol=1e-3, atol=1e-4, err_msg=str(k))
