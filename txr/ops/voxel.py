"""Voxel-grid downsampling as a scatter-free XLA sort reduction.

Open3D-equivalent semantics (reference: depth_to_reconstruction.py:386-420 via
``o3d.voxel_down_sample``): all points falling in the same voxel of edge
``voxel_size`` are averaged (positions and colors). The reduction is
sort-based (txr.ops.segment) because TPU scatter costs ~30x a sort at these
sizes. Output: one averaged point per occupied voxel, compacted to the front
in deterministic ascending-voxel order; capacity equals input capacity so
chained fusion stages compile once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.core.types import PointSet
from txr.ops.segment import INT_MAX, sorted_voxel_reduce


def _voxel_keys(xyz: jnp.ndarray, mask: jnp.ndarray, voxel_size) -> tuple:
    """Integer voxel coords relative to the masked min-bound; invalid points
    get INT_MAX keys so they sort to the tail."""
    big = 3.0e38  # Python float: stays a jaxpr literal
    masked = jnp.where(mask[:, None], xyz, big)
    min_bound = jnp.min(masked, axis=0)
    rel = jnp.floor((xyz - min_bound) / voxel_size).astype(jnp.int32)
    rel = jnp.where(mask[:, None], rel, INT_MAX)
    return rel[:, 0], rel[:, 1], rel[:, 2]


@jax.jit
def voxel_downsample(points: PointSet, voxel_size) -> PointSet:
    """Average points per voxel. Deterministic sorted-voxel output order."""
    n = points.capacity
    kx, ky, kz = _voxel_keys(points.xyz, points.mask, voxel_size)
    w = points.mask.astype(jnp.float32)
    xyz = jnp.where(points.mask[:, None], points.xyz, 0.0)
    rgb = jnp.where(points.mask[:, None], points.rgb, 0.0)

    cols = (xyz[:, 0], xyz[:, 1], xyz[:, 2], rgb[:, 0], rgb[:, 1], rgb[:, 2], w)
    _, _, _, sums, is_seg = sorted_voxel_reduce(kx, ky, kz, cols, capacity=n)
    sx, sy, sz, sr, sg, sb, cnt = sums

    valid = is_seg & (cnt > 0.0)
    denom = jnp.maximum(cnt, 1.0)
    out_xyz = jnp.stack([sx, sy, sz], axis=1) / denom[:, None]
    out_rgb = jnp.stack([sr, sg, sb], axis=1) / denom[:, None]
    out_xyz = jnp.where(valid[:, None], out_xyz, 0.0)
    out_rgb = jnp.where(valid[:, None], out_rgb, 0.0)
    return PointSet(xyz=out_xyz, rgb=out_rgb, mask=valid)
