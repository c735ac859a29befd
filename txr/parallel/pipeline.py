"""Multi-chip streaming depth→fusion pipeline over a (dp, tp) mesh.

The reference's pipeline is single-GPU (SURVEY §2.6); this is its
scale-out: frames shard over `dp`, the ViT runs tensor-parallel over `tp`
(txr.parallel.mesh rules — XLA inserts the psums over ICI), every dp shard
back-projects its own frames and maintains a LOCAL offset voxel map, and
partial maps combine with the exact weighted merge
(txr.fusion.offset_map.offset_map_merge) — an associative combine, so maps
can merge in any order (pairwise tree over ICI or a final host-side pass).

Everything is GSPMD: per-shard maps are rows of a (dp, C) stacked map with
`P("dp")` sharding, the per-shard insert is a vmap over that leading axis
(sort/scan/top_k all batch cleanly), and the merge resharding is the only
cross-chip traffic. No NCCL-style explicit sends — the sharding annotations
ARE the communication plan.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from txr.core.types import PointSet
from txr.fusion.offset_map import (NCOLS, OffsetVoxelMap,
                                   create_offset_map, offset_map_insert,
                                   offset_map_merge)
from txr.ops.backproject import backproject_world
from txr.parallel.mesh import batch_sharding, param_shardings


def create_sharded_maps(mesh: Mesh, capacity: int,
                        voxel_size: float) -> OffsetVoxelMap:
    """A (dp, C) stack of empty per-shard maps, rows pinned to dp shards."""
    dp = mesh.shape["dp"]
    one = create_offset_map(capacity, voxel_size)

    def stack(leaf):
        if leaf.ndim == 0:
            return leaf
        s = jnp.broadcast_to(leaf[None], (dp,) + leaf.shape)
        return jax.device_put(s, NamedSharding(mesh, P("dp")))

    return OffsetVoxelMap(*[stack(l) for l in one[:NCOLS]], one.voxel_size)


def make_sharded_fusion_step(model, params, mesh: Mesh,
                             intrinsics: Tuple[float, float, float, float],
                             min_depth: float = 1e-4,
                             max_depth: float = 1e6):
    """Build a jitted (params, frames, vms) -> vms step.

    frames: (B, H, W, 3) float in [0,1], B divisible by dp, sharded P("dp").
    vms: (dp, C) stacked maps from create_sharded_maps. Depth runs batched
    (dp x tp), back-projection per frame, insert per dp shard.
    """
    dp = mesh.shape["dp"]
    fx, fy, cx, cy = intrinsics
    eye = jnp.eye(3, dtype=jnp.float32)
    zero_t = jnp.zeros(3, jnp.float32)

    p_shard = param_shardings(params, mesh)
    f_shard = batch_sharding(mesh)
    vm_shard = OffsetVoxelMap(
        *([NamedSharding(mesh, P("dp"))] * NCOLS),
        NamedSharding(mesh, P()))

    @partial(jax.jit,
             in_shardings=(p_shard, f_shard, vm_shard),
             out_shardings=vm_shard,
             donate_argnums=(2,))
    def step(params, frames, vms):
        depth = model.apply({"params": params}, frames).astype(jnp.float32)

        def one(depth_i, rgb_i):
            return backproject_world(depth_i, rgb_i, eye, zero_t,
                                     fx, fy, cx, cy,
                                     min_depth, max_depth, 1.0, 1)

        ps = jax.vmap(one)(depth, frames)
        b = ps.xyz.shape[0]
        n_per = (b // dp) * ps.xyz.shape[1]

        def shard_points(a, trailing):
            return a.reshape((dp, n_per) + trailing)

        flat = PointSet(shard_points(ps.xyz, (3,)),
                        shard_points(ps.rgb, (3,)),
                        shard_points(ps.mask, ()))

        def insert_one(vm_cols, pts):
            vm = OffsetVoxelMap(*vm_cols, vms.voxel_size)
            out = offset_map_insert(vm, pts)
            return tuple(out[:NCOLS])

        new_cols = jax.vmap(insert_one)(tuple(vms[:NCOLS]), flat)
        return OffsetVoxelMap(*new_cols, vms.voxel_size)

    return step


@jax.jit
def merge_sharded_maps(vms: OffsetVoxelMap) -> OffsetVoxelMap:
    """Fold the (dp, C) map stack into one map with the exact weighted
    merge. Pairwise fold — log2(dp) merges; XLA gathers shards as needed."""
    dp = vms.khi.shape[0]
    maps = [OffsetVoxelMap(*[l[i] for l in vms[:NCOLS]], vms.voxel_size)
            for i in range(dp)]
    while len(maps) > 1:
        nxt = [offset_map_merge(maps[i], maps[i + 1])
               for i in range(0, len(maps) - 1, 2)]
        if len(maps) % 2:
            nxt.append(maps[-1])
        maps = nxt
    return maps[0]
