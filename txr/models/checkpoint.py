"""Native JAX checkpointing for converted model params (orbax).

The reference's checkpoint story is torch.load / HF from_pretrained
(SURVEY §5.4). Here, torch checkpoints convert once
(txr.models.convert) and then persist as orbax checkpoints so later runs skip
the torch round-trip entirely; `load_params_cached` is the one-call API the
pipelines use.
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Any, Optional

import jax

logger = logging.getLogger(__name__)

DEFAULT_CACHE = os.path.expanduser("~/.cache/txr/checkpoints")


def save_params(path: str, params: Any) -> None:
    """Write a params pytree as an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    logger.info("Saved params to %s", path)


def load_params(path: str, template: Optional[Any] = None) -> Any:
    """Restore a params pytree from an orbax checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        shapes = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), template)
        return ckptr.restore(path, shapes)
    return ckptr.restore(path)


def _cache_key(torch_path: str, model=None) -> str:
    """Two-part key: <source-path-hash>-<content-stamp>.

    The path hash groups all conversions of the same source file so stale
    entries can be evicted; the stamp uses st_mtime_ns (not whole seconds —
    same-second overwrites must still invalidate) plus size, plus the model
    depth that parameterizes the conversion (convert.load_checkpoint
    truncates to model.vit.num_layers — two models over the same file must
    not share an entry)."""
    st = os.stat(torch_path)
    layers = getattr(getattr(model, "vit", None), "num_layers", "")
    src = hashlib.sha256(os.path.abspath(torch_path).encode()).hexdigest()[:12]
    stamp = hashlib.sha256(
        f"{st.st_size}:{st.st_mtime_ns}:{layers}".encode()).hexdigest()[:12]
    return f"{src}-{stamp}"


def _evict_stale(cache_dir: str, key: str) -> None:
    """Remove superseded conversions of the same source file (a ViT-L entry
    is ~1.3 GB; without eviction every mtime change leaks one)."""
    import shutil

    src_prefix = key.split("-")[0] + "-"
    try:
        for entry in os.listdir(cache_dir):
            if entry.startswith(src_prefix) and entry != key:
                shutil.rmtree(os.path.join(cache_dir, entry), ignore_errors=True)
                logger.info("Evicted stale checkpoint cache %s", entry)
    except OSError:
        pass


def load_params_cached(torch_path: str, model,
                       cache_dir: Optional[str] = None) -> Any:
    """Convert a torch checkpoint once; serve orbax-cached params afterwards.

    The cache key covers path+size+mtime_ns, so a replaced checkpoint file
    invalidates its entry; older entries for the same source are evicted.
    Cache location: `cache_dir` arg > $TXR_CKPT_CACHE > ~/.cache/txr."""
    from txr.models.convert import load_checkpoint

    if cache_dir is None:
        cache_dir = os.environ.get("TXR_CKPT_CACHE", DEFAULT_CACHE)

    key = _cache_key(torch_path, model)
    cache_path = os.path.join(cache_dir, key)
    if os.path.isdir(cache_path):
        try:
            params = load_params(cache_path)
            logger.info("Loaded cached params from %s", cache_path)
            return params
        except Exception as e:  # corrupt cache → reconvert
            logger.warning("Checkpoint cache %s unreadable (%s); reconverting",
                           cache_path, e)
    params = load_checkpoint(torch_path, model)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        save_params(cache_path, params)
        _evict_stale(cache_dir, key)
    except Exception as e:  # cache write failure is non-fatal
        logger.warning("Could not cache converted params: %s", e)
    return params
