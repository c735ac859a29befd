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
from txr.ops.resize import IMAGENET_MEAN, IMAGENET_STD
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


# Raw (__wrapped__) inner ops for composition INSIDE the jitted step:
# calling the jitted wrappers in another trace captures Python-float args
# as lifted device constants, the jax-0.9 C++ fastpath bug CLAUDE.md
# documents ("Execution supplied N buffers but compiled program expected
# N+1"); donation on the inner insert was a no-op under vmap anyway — the
# OUTER jit donates vms.
_backproject_raw = getattr(backproject_world, "__wrapped__",
                           backproject_world)
_insert_raw = getattr(offset_map_insert, "__wrapped__", offset_map_insert)


def make_sharded_fusion_step(model, params, mesh: Mesh,
                             intrinsics: Tuple[float, float, float, float],
                             min_depth: float = 1e-4,
                             max_depth: float = 1e6):
    """Build a jitted (params, frames, Rs, ts, scales, vms) -> vms step.

    frames: (B, H, W, 3) float RGB in [0,1] at the model's operating size,
    B divisible by dp, sharded P("dp"); ImageNet normalization happens
    INSIDE the step (the model expects it — feeding raw frames shifted the
    ViT's input distribution by sigmas [code-review r2]).
    Rs/ts: (B, 3, 3)/(B, 3) per-frame world→camera poses and scales (B,) —
    the single-chip pipelines estimate per-frame poses; a scale-out path
    that hardcoded identity could only fuse a static camera.
    vms: (dp, C) stacked maps from create_sharded_maps. Depth runs batched
    (dp x tp), back-projection per frame, insert per dp shard.
    """
    dp = mesh.shape["dp"]
    fx, fy, cx, cy = intrinsics

    p_shard = param_shardings(params, mesh)
    f_shard = batch_sharding(mesh)
    b_shard = NamedSharding(mesh, P("dp"))
    vm_shard = OffsetVoxelMap(
        *([NamedSharding(mesh, P("dp"))] * NCOLS),
        NamedSharding(mesh, P()))

    @partial(jax.jit,
             in_shardings=(p_shard, f_shard, b_shard, b_shard, b_shard,
                           vm_shard),
             out_shardings=vm_shard,
             donate_argnums=(5,))
    def step(params, frames, Rs, ts, scales, vms):
        mean = jnp.asarray(IMAGENET_MEAN, frames.dtype)
        std = jnp.asarray(IMAGENET_STD, frames.dtype)
        xn = (frames - mean) / std
        depth = model.apply({"params": params}, xn).astype(jnp.float32)

        def one(depth_i, rgb_i, Ri, ti, si):
            return _backproject_raw(depth_i, rgb_i, Ri, ti,
                                    fx, fy, cx, cy,
                                    min_depth, max_depth, si, 1)

        ps = jax.vmap(one)(depth, frames, Rs, ts, scales)
        b = ps.xyz.shape[0]
        n_per = (b // dp) * ps.xyz.shape[1]

        def shard_points(a, trailing):
            return a.reshape((dp, n_per) + trailing)

        flat = PointSet(shard_points(ps.xyz, (3,)),
                        shard_points(ps.rgb, (3,)),
                        shard_points(ps.mask, ()))

        def insert_one(vm_cols, pts):
            vm = OffsetVoxelMap(*vm_cols, vms.voxel_size)
            out = _insert_raw(vm, pts)
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
