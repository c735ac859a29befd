"""Checkpoint persistence: orbax save/load roundtrip + torch-conversion cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.models.vit import ViTConfig
from txr.models.dpt import DPTConfig
from txr.models.depth_anything import DepthAnythingFlax
from txr.models.checkpoint import (
    _cache_key,
    save_params,
    load_params,
    load_params_cached,
)


def tiny_model():
    vit = ViTConfig(hidden_size=32, num_layers=2, num_heads=2,
                    pos_embed_size=4, out_layers=(0, 0, 1, 1), use_flash=False)
    dpt = DPTConfig(features=16, out_channels=(8, 8, 16, 16), head_hidden=8)
    return DepthAnythingFlax(vit=vit, dpt=dpt)


def assert_trees_equal(a, b):
    for (ka, la), (kb, lb) in zip(jax.tree_util.tree_leaves_with_path(a),
                                  jax.tree_util.tree_leaves_with_path(b)):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


class TestOrbaxRoundtrip:
    def test_save_load(self, tmp_path):
        model = tiny_model()
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)))["params"]
        p = str(tmp_path / "ckpt")
        save_params(p, params)
        assert_trees_equal(params, load_params(p))


class TestTorchCache:
    def test_convert_once_then_cached_and_evicted(self, tmp_path):
        """HF-named torch state dict converts, caches, serves from cache, and
        stale entries for the same source evict on re-conversion."""
        torch = pytest.importorskip("torch")
        import os
        import time
        from tests.test_models import make_hf_pair

        tm, fm, params_ref = make_hf_pair(hidden=32, layers=4,
                                          out_indices=(1, 2, 3, 4))
        pth = tmp_path / "model.pth"
        torch.save(tm.state_dict(), pth)

        cache = tmp_path / "cache"
        p1 = load_params_cached(str(pth), fm, cache_dir=str(cache))
        assert len(list(cache.iterdir())) == 1
        p2 = load_params_cached(str(pth), fm, cache_dir=str(cache))
        assert_trees_equal(p1, p2)
        assert_trees_equal(p1, params_ref)

        # Touch the file (content-stamp changes) → new entry, old evicted.
        os.utime(pth, ns=(time.time_ns(), time.time_ns() + 1))
        load_params_cached(str(pth), fm, cache_dir=str(cache))
        assert len(list(cache.iterdir())) == 1  # superseded entry removed

    def test_cache_key_sensitive_to_mtime_ns(self, tmp_path):
        import os
        p = tmp_path / "x.pth"
        p.write_bytes(b"abc")
        k1 = _cache_key(str(p))
        os.utime(p, ns=(1_000_000_001, 1_000_000_001))
        k2 = _cache_key(str(p))
        os.utime(p, ns=(1_000_000_001, 1_000_000_002))  # sub-second change
        k3 = _cache_key(str(p))
        assert k1 != k2 and k2 != k3
        assert k2.split("-")[0] == k3.split("-")[0]  # same source prefix

    def test_model_wrapper_orbax_dir_dispatch(self, tmp_path, monkeypatch):
        """DepthAnythingModel(checkpoint_path=<orbax dir>) takes the native
        restore branch end-to-end."""
        import txr.models.depth_anything as da

        model = tiny_model()
        params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 56, 56, 3)))["params"]
        ckpt_dir = str(tmp_path / "native_ckpt")
        save_params(ckpt_dir, params)

        monkeypatch.setattr(
            da, "build_model",
            lambda *a, **k: (model, model.vit, model.dpt))
        m = da.DepthAnythingModel(version="v2", encoder="vits",
                                  checkpoint_path=ckpt_dir,
                                  param_dtype=jnp.float32)
        assert_trees_equal(m.params, params)
