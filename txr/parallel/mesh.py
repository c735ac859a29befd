"""Device mesh + sharding rules.

The reference is single-process/single-GPU; its only 'distribution' is ROS2
pub/sub (SURVEY §2.6/§2.7). The TPU build scales through a 2-D
``Mesh(('dp', 'tp'))``:

- **dp** (data parallel): frame batches shard along the leading axis — the
  primary axis for the ≥30 FPS streaming target.
- **tp** (tensor parallel): ViT attention heads and MLP hidden dims shard for
  latency on the big encoders (qkv/fc1 column-parallel, proj/fc2
  row-parallel); XLA inserts the psum over ICI at the row-parallel matmuls.

Sharding is by parameter-tree rules (NamedSharding), not model rewrites — the
same Flax modules run single-chip or sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Create a (dp, tp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"dp*tp={dp * tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _param_spec(path: tuple, leaf) -> P:
    """Partition rule for one encoder/head parameter, keyed by name."""
    names = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(names)
    if leaf.ndim == 2:
        # Column-parallel: qkv, fc1, w12 → shard output dim over tp.
        if any(n in ("qkv", "fc1", "w12") for n in names) and names[-1] == "kernel":
            return P(None, "tp")
        # Row-parallel: proj, fc2, w3 → shard input dim; XLA psums the output.
        if any(n in ("proj", "fc2", "w3") for n in names) and names[-1] == "kernel":
            return P("tp", None)
    if leaf.ndim == 1 and names[-1] == "bias":
        if any(n in ("qkv", "fc1", "w12") for n in names):
            return P("tp")
    # Everything else (convs, norms, embeddings, DPT head) replicates.
    return P()


def _check_divisible(path, leaf, spec: P, tp: int):
    """Build-time validation: every tp-sharded dim must divide evenly, so
    shape errors fire here instead of at dispatch on hardware."""
    for axis, name in enumerate(spec):
        if name is None:
            continue
        axes = (name,) if isinstance(name, str) else name
        if "tp" in axes and leaf.shape[axis] % tp != 0:
            keys = "/".join(getattr(k, "key", str(k)) for k in path)
            raise ValueError(
                f"param {keys} dim {axis} ({leaf.shape[axis]}) not divisible "
                f"by tp={tp}")


def shard_params(params, mesh: Mesh):
    """Place a params pytree on the mesh under the TP rules."""
    tp = mesh.shape.get("tp", 1)

    def place(path, leaf):
        spec = _param_spec(path, leaf)
        _check_divisible(path, leaf, spec, tp)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding tree matching shard_params (for jit in/out specs)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), params)


def shard_batch(x: jnp.ndarray, mesh: Mesh):
    """Shard an array along its leading (batch) axis over dp."""
    return jax.device_put(x, NamedSharding(mesh, P("dp")))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
