"""Checkpoint persistence: orbax save/load roundtrip + torch-conversion cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.models.vit import ViTConfig
from txr.models.dpt import DPTConfig
from txr.models.depth_anything import DepthAnythingFlax
from txr.models.checkpoint import save_params, load_params, load_params_cached


def tiny_model():
    vit = ViTConfig(hidden_size=32, num_layers=2, num_heads=2,
                    pos_embed_size=4, out_layers=(0, 0, 1, 1), use_flash=False)
    dpt = DPTConfig(features=16, out_channels=(8, 8, 16, 16), head_hidden=8)
    return DepthAnythingFlax(vit=vit, dpt=dpt)


class TestOrbaxRoundtrip:
    def test_save_load(self, tmp_path):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))["params"]
        p = str(tmp_path / "ckpt")
        save_params(p, params)
        back = load_params(p)
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(back)):
            assert ka == kb
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTorchCache:
    def test_convert_once_then_cached(self, tmp_path):
        torch = pytest.importorskip("torch")
        model = tiny_model()
        # Build a torch state dict in the original-DA naming for the tiny model
        # via the HF-parity helper from test_models.
        from tests.test_models import make_hf_pair

        tm, fm, params_ref = make_hf_pair(hidden=32, layers=4,
                                          out_indices=(1, 2, 3, 4))
        pth = tmp_path / "model.pth"
        torch.save(tm.state_dict(), pth)

        cache = tmp_path / "cache"
        p1 = load_params_cached(str(pth), fm, cache_dir=str(cache))
        assert len(list(cache.iterdir())) == 1  # cached
        p2 = load_params_cached(str(pth), fm, cache_dir=str(cache))
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(p1),
                jax.tree_util.tree_leaves_with_path(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_model_accepts_orbax_dir(self, tmp_path):
        from txr.models.depth_anything import DepthAnythingModel
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 56, 56, 3)))["params"]
        p = str(tmp_path / "native_ckpt")
        save_params(p, params)
        # Wrapper with a directory checkpoint path loads orbax directly.
        m = DepthAnythingModel.__new__(DepthAnythingModel)
        from txr.models.checkpoint import load_params as lp
        restored = lp(p)
        assert jax.tree_util.tree_structure(restored) == \
            jax.tree_util.tree_structure(params)
