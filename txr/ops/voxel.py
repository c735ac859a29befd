"""Voxel-grid downsampling as an XLA sort + segment-mean.

Open3D-equivalent semantics (reference: depth_to_reconstruction.py:386-420 via
``o3d.voxel_down_sample``): all points falling in the same voxel of edge
``voxel_size`` are averaged (positions and colors). The TPU formulation avoids
dynamic shapes entirely:

  1. integer voxel coordinates relative to the masked min-bound,
  2. lexicographic multi-key sort (three int32 keys — no int64 needed even for
     huge grids) carrying xyz/rgb/mask as values,
  3. voxel boundaries by neighbor-key comparison, segment ids by cumsum,
  4. ``jax.ops.segment_sum`` with num_segments = capacity (static),
  5. output: one averaged point per occupied voxel, in deterministic sorted
     voxel order, with a validity mask for the unoccupied tail.

Output capacity equals input capacity, so chained fusion stages compile once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.core.types import PointSet

_INT_MAX = jnp.iinfo(jnp.int32).max


def _voxel_keys(xyz: jnp.ndarray, mask: jnp.ndarray, voxel_size) -> tuple:
    """Integer voxel coords (kx, ky, kz); invalid points get INT_MAX keys
    so they sort to the tail."""
    big = jnp.float32(3.0e38)
    masked = jnp.where(mask[:, None], xyz, big)
    min_bound = jnp.min(masked, axis=0)
    # Guard the all-invalid case: min over all-big is big; coords irrelevant.
    rel = jnp.floor((xyz - min_bound) / voxel_size).astype(jnp.int32)
    rel = jnp.where(mask[:, None], rel, _INT_MAX)
    return rel[:, 0], rel[:, 1], rel[:, 2]


@jax.jit
def voxel_downsample(points: PointSet, voxel_size) -> PointSet:
    """Average points per voxel. Deterministic sorted-voxel output order."""
    n = points.capacity
    kx, ky, kz = _voxel_keys(points.xyz, points.mask, voxel_size)

    perm0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    kx, ky, kz, perm = jax.lax.sort((kx, ky, kz, perm0), num_keys=3)
    xyz = points.xyz[perm]
    rgb = points.rgb[perm]
    mask = points.mask[perm]

    # Boundary where any key component differs from the previous point's.
    prev_differs = (
        (kx != jnp.roll(kx, 1)) | (ky != jnp.roll(ky, 1)) | (kz != jnp.roll(kz, 1))
    )
    first = prev_differs.at[0].set(True)
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # 0-based segment ids

    ones = mask.astype(jnp.float32)
    cnt = jax.ops.segment_sum(ones, seg, num_segments=n)
    sum_xyz = jax.ops.segment_sum(xyz * ones[:, None], seg, num_segments=n)
    sum_rgb = jax.ops.segment_sum(rgb * ones[:, None], seg, num_segments=n)

    denom = jnp.maximum(cnt, 1.0)[:, None]
    out_xyz = sum_xyz / denom
    out_rgb = sum_rgb / denom
    out_mask = cnt > 0.0
    out_xyz = jnp.where(out_mask[:, None], out_xyz, 0.0)
    out_rgb = jnp.where(out_mask[:, None], out_rgb, 0.0)
    return PointSet(xyz=out_xyz, rgb=out_rgb, mask=out_mask)
