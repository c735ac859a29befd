"""Mean-offset packed voxel map — 6 sort operands (vs packed_map's 7).

lax.sort cost on v5e scales with operand count (CLAUDE.md measurements), so
this variant stores per-voxel MEANS as 16-bit fixed point instead of f32
sums, shrinking the insert's dominant sort to 2 keys + 4 payload columns:

  khi, klo : packed 54-bit voxel key (txr.fusion.packed_map.pack_keys)
  oxy      : x<<16 | y — mean position offset within the voxel, u16 each,
             in units of voxel_size/65536 (quantization 0.15 um at 1 cm)
  ozw      : z<<16 | weight — z offset u16 | accumulated weight u16
  rgb1     : r<<16 | g — mean color, u16 fixed point on [0, 1]
  rgb2     : b<<16 | 0

Numerics: the insert's segment sums accumulate WEIGHTED OFFSETS (off * w,
bounded by the u16 weight), so cumsum magnitudes are scene-independent —
unlike raw world positions, whose prefix sums grow with |xyz| and row count.
Weight saturates at 65535 (the reference's Open3D voxel_down_sample exposes
only means, not counts — depth_to_reconstruction.py:413-415); re-quantizing
a stable mean is a fixed point of floor(mean * 65536) with midpoint dequant,
so untouched voxels do not drift across inserts.

Replaces the same Open3D voxel hash downsample as packed_map/sorted_map
(reference depth_to_reconstruction.py:386-420).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from txr.core.types import PointSet
from txr.fusion.packed_map import pack_keys, unpack_keys, _hier_cumsum
from txr.ops.segment import INT_MAX


def _q16(x):
    """[0, 1) float -> u16 fixed point (as uint32)."""
    return jnp.clip(jnp.floor(x * 65536.0), 0, 65535).astype(jnp.uint32)


def _dq16(u):
    """u16 -> midpoint dequantized float in (0, 1)."""
    return (u.astype(jnp.float32) + 0.5) * (1.0 / 65536.0)


class OffsetVoxelMap(NamedTuple):
    khi: jnp.ndarray   # (C,) int32 packed key (INT_MAX = empty)
    klo: jnp.ndarray   # (C,) int32
    oxy: jnp.ndarray   # (C,) int32 x16|y16 mean offset
    ozw: jnp.ndarray   # (C,) int32 z16|w16
    rgb: jnp.ndarray   # (C, 2) int32 (r16|g16, b16|0) mean color
    voxel_size: jnp.ndarray

    @property
    def count(self):
        return (self.ozw.astype(jnp.uint32) & 0xFFFF).astype(jnp.float32)


def create_offset_map(capacity: int, voxel_size: float) -> OffsetVoxelMap:
    return OffsetVoxelMap(
        khi=jnp.full((capacity,), INT_MAX, jnp.int32),
        klo=jnp.full((capacity,), INT_MAX, jnp.int32),
        oxy=jnp.zeros((capacity,), jnp.int32),
        ozw=jnp.zeros((capacity,), jnp.int32),
        rgb=jnp.zeros((capacity, 2), jnp.int32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
    )


@partial(jax.jit, donate_argnums=(0,))
def offset_map_insert(vm: OffsetVoxelMap, points: PointSet) -> OffsetVoxelMap:
    cap = vm.khi.shape[0]
    g = points.xyz / vm.voxel_size
    coords = jnp.floor(g).astype(jnp.int32)
    pm = points.mask
    # Zero masked rows before quantizing: their xyz/rgb may be garbage/NaN,
    # and 0 * NaN would poison the weighted cumsum.
    off = jnp.where(pm[:, None], g - coords.astype(jnp.float32), 0.0)
    rgb = jnp.where(pm[:, None], points.rgb, 0.0)
    bhi, blo = pack_keys(coords[:, 0], coords[:, 1], coords[:, 2], pm)
    w1 = pm.astype(jnp.uint32)                     # weight 1 valid, 0 invalid
    boxy = (_q16(off[:, 0]) << 16) | _q16(off[:, 1])
    bozw = (_q16(off[:, 2]) << 16) | w1
    brgb1 = (_q16(rgb[:, 0]) << 16) | _q16(rgb[:, 1])
    brgb2 = _q16(rgb[:, 2]) << 16

    cols = (
        jnp.concatenate([vm.khi, bhi]),
        jnp.concatenate([vm.klo, blo]),
        jnp.concatenate([vm.oxy, boxy.astype(jnp.int32)]),
        jnp.concatenate([vm.ozw, bozw.astype(jnp.int32)]),
        jnp.concatenate([vm.rgb[:, 0], brgb1.astype(jnp.int32)]),
        jnp.concatenate([vm.rgb[:, 1], brgb2.astype(jnp.int32)]),
    )
    n = cols[0].shape[0]
    s = jax.lax.sort(cols, num_keys=2)
    skhi, sklo = s[0], s[1]
    u_oxy = s[2].astype(jnp.uint32)
    u_ozw = s[3].astype(jnp.uint32)
    u_r1 = s[4].astype(jnp.uint32)
    u_r2 = s[5].astype(jnp.uint32)
    w = (u_ozw & 0xFFFF).astype(jnp.float32)
    # Weighted contributions; invalid rows (w=0) contribute nothing.
    scols = jnp.stack([
        _dq16(u_oxy >> 16) * w,
        _dq16(u_oxy & 0xFFFF) * w,
        _dq16(u_ozw >> 16) * w,
        _dq16(u_r1 >> 16) * w,
        _dq16(u_r1 & 0xFFFF) * w,
        _dq16(u_r2 >> 16) * w,
        w,
    ], axis=1)

    last = ((skhi != jnp.roll(skhi, -1)) | (sklo != jnp.roll(sklo, -1))
            ).at[n - 1].set(True)
    csum = _hier_cumsum(scols)

    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    order = jnp.where(last, pos, jnp.int32(n))
    # top_k(-order) = first `cap` segment-end positions in key order
    # (same compaction as packed_map_insert).
    neg_top, perm_c = jax.lax.top_k(-order, cap)
    is_seg = (-neg_top) < n

    ends = csum[perm_c]
    prev = jnp.concatenate([jnp.zeros((1, 7), ends.dtype), ends[:-1]], axis=0)
    sums = jnp.where(is_seg[:, None], ends - prev, 0.0)

    wgt = sums[:, 6]
    okhi = jnp.where(is_seg, skhi[perm_c], INT_MAX)
    occupied = is_seg & (wgt > 0.0) & (okhi != INT_MAX)
    denom = jnp.maximum(wgt, 1.0)
    means = sums[:, :6] / denom[:, None]
    q = jnp.clip(jnp.floor(means * 65536.0), 0, 65535).astype(jnp.uint32)
    wq = jnp.clip(wgt, 0, 65535).astype(jnp.uint32)
    oxy = (q[:, 0] << 16) | q[:, 1]
    ozw = (q[:, 2] << 16) | wq
    r1 = (q[:, 3] << 16) | q[:, 4]
    r2 = q[:, 5] << 16

    zero = jnp.zeros((), jnp.int32)
    return OffsetVoxelMap(
        khi=jnp.where(occupied, okhi, INT_MAX),
        klo=jnp.where(occupied, jnp.where(is_seg, sklo[perm_c], INT_MAX),
                      INT_MAX),
        oxy=jnp.where(occupied, oxy.astype(jnp.int32), zero),
        ozw=jnp.where(occupied, ozw.astype(jnp.int32), zero),
        rgb=jnp.where(occupied[:, None],
                      jnp.stack([r1.astype(jnp.int32),
                                 r2.astype(jnp.int32)], axis=1), zero),
        voxel_size=vm.voxel_size,
    )


@jax.jit
def offset_map_points(vm: OffsetVoxelMap) -> PointSet:
    kx, ky, kz = unpack_keys(vm.khi, vm.klo)
    u_oxy = vm.oxy.astype(jnp.uint32)
    u_ozw = vm.ozw.astype(jnp.uint32)
    u_r1 = vm.rgb[:, 0].astype(jnp.uint32)
    u_r2 = vm.rgb[:, 1].astype(jnp.uint32)
    w = (u_ozw & 0xFFFF).astype(jnp.float32)
    occ = (w > 0) & (vm.khi != INT_MAX)
    xyz = jnp.stack([
        kx.astype(jnp.float32) + _dq16(u_oxy >> 16),
        ky.astype(jnp.float32) + _dq16(u_oxy & 0xFFFF),
        kz.astype(jnp.float32) + _dq16(u_ozw >> 16),
    ], axis=1) * vm.voxel_size
    rgb = jnp.stack([
        _dq16(u_r1 >> 16), _dq16(u_r1 & 0xFFFF), _dq16(u_r2 >> 16),
    ], axis=1)
    return PointSet(
        xyz=jnp.where(occ[:, None], xyz, 0.0),
        rgb=jnp.where(occ[:, None], rgb, 0.0),
        mask=occ,
    )


@jax.jit
def offset_map_size(vm: OffsetVoxelMap) -> jnp.ndarray:
    w = vm.ozw.astype(jnp.uint32) & 0xFFFF
    return jnp.sum(((w > 0) & (vm.khi != INT_MAX)).astype(jnp.int32))
