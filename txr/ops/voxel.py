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
def voxel_sums(points: PointSet, voxel_size, origin):
    """Per-voxel SUMS keyed to an EXPLICIT origin (not the masked min).

    The building block of the chunked dense merge
    (txr.fusion.chunked_merge): sums from disjoint view chunks keyed to the
    same global origin add associatively, so per-voxel means of the merged
    rows equal a single-pass voxel_downsample up to float summation order.

    Returns (keys (C, 3) int32, sums (C, 7) float32 [x y z r g b weight],
    valid (C,) bool, n_voxels ()) — one row per occupied voxel, compacted to
    the front in ascending key order; invalid rows carry INT_MAX keys and
    zero sums so they can feed a second sorted_voxel_reduce unchanged.
    """
    n = points.capacity
    rel = jnp.floor((points.xyz - origin) / voxel_size).astype(jnp.int32)
    rel = jnp.where(points.mask[:, None], rel, INT_MAX)
    w = points.mask.astype(jnp.float32)
    xyz = jnp.where(points.mask[:, None], points.xyz, 0.0)
    rgb = jnp.where(points.mask[:, None], points.rgb, 0.0)
    cols = (xyz[:, 0], xyz[:, 1], xyz[:, 2],
            rgb[:, 0], rgb[:, 1], rgb[:, 2], w)
    okx, oky, okz, sums, is_seg = sorted_voxel_reduce(
        rel[:, 0], rel[:, 1], rel[:, 2], cols, capacity=n)
    valid = is_seg & (sums[6] > 0.0)
    keys = jnp.stack([okx, oky, okz], axis=1)
    keys = jnp.where(valid[:, None], keys, INT_MAX)
    sums = jnp.stack(sums, axis=1)
    sums = jnp.where(valid[:, None], sums, 0.0)
    return keys, sums, valid, jnp.sum(valid.astype(jnp.int32))


@jax.jit
def voxel_means_of_sums(keys: jnp.ndarray, sums: jnp.ndarray) -> PointSet:
    """Reduce (M, 3) int32 keys + (M, 7) float32 partial sums (INT_MAX keys
    on invalid rows) to per-voxel means. The second half of the chunked
    merge; output capacity = M."""
    m = keys.shape[0]
    cols = tuple(sums[:, j] for j in range(7))
    _, _, _, osums, is_seg = sorted_voxel_reduce(
        keys[:, 0], keys[:, 1], keys[:, 2], cols, capacity=m)
    sx, sy, sz, sr, sg, sb, cnt = osums
    valid = is_seg & (cnt > 0.0)
    denom = jnp.maximum(cnt, 1.0)
    out_xyz = jnp.stack([sx, sy, sz], axis=1) / denom[:, None]
    out_rgb = jnp.stack([sr, sg, sb], axis=1) / denom[:, None]
    out_xyz = jnp.where(valid[:, None], out_xyz, 0.0)
    out_rgb = jnp.where(valid[:, None], out_rgb, 0.0)
    return PointSet(xyz=out_xyz, rgb=out_rgb, mask=valid)


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
