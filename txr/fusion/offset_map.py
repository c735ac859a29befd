"""Mean-offset packed voxel map — 5 sort operands (vs packed_map's 7).

lax.sort cost on v5e scales with operand count (CLAUDE.md measurements), so
this variant stores per-voxel MEANS as fixed point instead of f32 sums,
shrinking the insert's dominant sort to 2 keys + 3 payload columns:

  khi, klo : packed 54-bit voxel key (txr.fusion.packed_map.pack_keys)
  oxy      : x<<16 | y — mean position offset within the voxel, u16 each,
             in units of voxel_size/65536 (quantization 0.15 um at 1 cm)
  ozw      : z<<16 | weight — z offset u16 | accumulated weight u16
  rgb      : r<<21 | g<<10 | b — mean color, 11/11/10-bit fixed point on
             [0, 1] (quantization <= 0.25 of an 8-bit gray level)

Numerics: the insert reduces with a SEGMENTED scan (txr/ops/scan.py), so
rounding scales with each segment's own sum (~1e-7 relative) — independent
of total accumulated map weight and of session length. (A global prefix +
adjacent differences would grow with total weight, up to capacity*65535
~1.4e11 in a long capture, leaving absolute errors of hundreds per segment
— the round-1 advisor finding.)
Weight saturates at 65535 (the reference's Open3D voxel_down_sample exposes
only means, not counts — depth_to_reconstruction.py:413-415); re-quantizing
a stable mean is a fixed point of floor(mean * 2^bits) with midpoint dequant,
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
from txr.fusion.packed_map import pack_keys, unpack_keys
from txr.ops.scan import segmented_cumsum_cols
from txr.ops.segment import INT_MAX


def _q(x, bits):
    """[0, 1) float -> fixed point (as uint32)."""
    scale = float(1 << bits)
    return jnp.clip(jnp.floor(x * scale), 0, scale - 1).astype(jnp.uint32)


def _dq(u, bits):
    """fixed point -> midpoint dequantized float in (0, 1)."""
    return (u.astype(jnp.float32) + 0.5) * (1.0 / float(1 << bits))


def _q16(x):
    return _q(x, 16)


def _dq16(u):
    return _dq(u, 16)


def _pack_rgb(r, g, b):
    return (_q(r, 11) << 21) | (_q(g, 11) << 10) | _q(b, 10)


def _unpack_rgb(u):
    return (_dq(u >> 21, 11), _dq((u >> 10) & 0x7FF, 11), _dq(u & 0x3FF, 10))


class OffsetVoxelMap(NamedTuple):
    khi: jnp.ndarray   # (C,) int32 packed key (INT_MAX = empty)
    klo: jnp.ndarray   # (C,) int32
    oxy: jnp.ndarray   # (C,) int32 x16|y16 mean offset
    ozw: jnp.ndarray   # (C,) int32 z16|w16
    rgb: jnp.ndarray   # (C,) int32 r11|g11|b10 mean color
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
        rgb=jnp.zeros((capacity,), jnp.int32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
    )


def _point_cols(points: PointSet, voxel_size):
    """PointSet -> the five packed int32 insert columns (weight 1 each)."""
    g = points.xyz / voxel_size
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
    brgb = _pack_rgb(rgb[:, 0], rgb[:, 1], rgb[:, 2])
    return (bhi, blo, boxy.astype(jnp.int32), bozw.astype(jnp.int32),
            brgb.astype(jnp.int32))


@partial(jax.jit, donate_argnums=(0,))
def offset_map_insert(vm: OffsetVoxelMap, points: PointSet) -> OffsetVoxelMap:
    bcols = _point_cols(points, vm.voxel_size)
    cols = tuple(jnp.concatenate([v, b])
                 for v, b in zip(vm[:5], bcols))
    return _reduce_packed(cols, vm.khi.shape[0], vm.voxel_size)


@jax.jit
def offset_map_merge(a: OffsetVoxelMap, b: OffsetVoxelMap) -> OffsetVoxelMap:
    """Exact weighted merge of two offset maps (same voxel_size).

    Both maps' packed rows carry their accumulated u16 weights, and the
    segment reduce sums weight-scaled mean offsets — the same math the
    insert applies to the resident map's rows — so merging partial maps
    (e.g. per-chip shards from a dp mesh, txr/parallel/pipeline.py) is the
    associative weighted-mean combine, not a weight-1 reinsertion of means.
    Output capacity = a's capacity.
    """
    cols = tuple(jnp.concatenate([x, y]) for x, y in zip(a[:5], b[:5]))
    return _reduce_packed(cols, a.khi.shape[0], a.voxel_size)


def _reduce_packed(cols, cap: int, voxel_size) -> OffsetVoxelMap:
    n = cols[0].shape[0]
    s = jax.lax.sort(cols, num_keys=2)
    skhi, sklo = s[0], s[1]
    u_oxy = s[2].astype(jnp.uint32)
    u_ozw = s[3].astype(jnp.uint32)
    u_rgb = s[4].astype(jnp.uint32)
    w = (u_ozw & 0xFFFF).astype(jnp.float32)
    rr, gg, bb = _unpack_rgb(u_rgb)
    # Weighted contributions; invalid rows (w=0) contribute nothing.
    wcols = (
        _dq16(u_oxy >> 16) * w,
        _dq16(u_oxy & 0xFFFF) * w,
        _dq16(u_ozw >> 16) * w,
        rr * w,
        gg * w,
        bb * w,
        w,
    )

    last = ((skhi != jnp.roll(skhi, -1)) | (sklo != jnp.roll(sklo, -1))
            ).at[n - 1].set(True)
    starts = jnp.roll(last, 1)  # row 0 rolls in last[n-1] == True

    # SEGMENTED scan, not global-cumsum + adjacent differences: a global f32
    # prefix grows with TOTAL accumulated map weight (capacity*65535 ~ 1.4e11
    # over a long capture), and segment sums recovered as prefix differences
    # then carry absolute errors of hundreds — corrupting means and the
    # wgt>0 occupancy test (ADVICE r1). The segmented scan resets at each
    # segment start, so rounding scales with the segment's OWN sum
    # (~1e-7 relative) regardless of session length. The value at a
    # segment's END row is exactly that segment's total.
    seg = segmented_cumsum_cols(wcols, starts)
    csum = jnp.stack(seg, axis=1)

    # Compaction: gather segment-end rows to the front. Gather shapes are
    # the whole cost here (tools/bench_gather.py): single-column gathers are
    # poison (21-37 ms EACH at 2M rows), interleaved row gathers amortize —
    # so gather the (cap, 7) totals and (cap, 2) keys as row gathers.
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    order = jnp.where(last, pos, jnp.int32(n))
    # top_k(-order) = first `cap` segment-end positions in key order
    # (same compaction as packed_map_insert).
    neg_top, perm_c = jax.lax.top_k(-order, cap)
    is_seg = (-neg_top) < n

    keys2 = jnp.stack([skhi, sklo], axis=1)
    krows = keys2[perm_c]                 # (cap, 2) interleaved gather
    ends = csum[perm_c]                   # (cap, 7) interleaved gather
    sums = jnp.where(is_seg[:, None], ends, 0.0)

    wgt = sums[:, 6]
    denom = jnp.maximum(wgt, 1.0)
    means = sums[:, :6] / denom[:, None]
    wq = jnp.clip(wgt, 0, 65535).astype(jnp.uint32)
    oxy = (_q(means[:, 0], 16) << 16) | _q(means[:, 1], 16)
    ozw = (_q(means[:, 2], 16) << 16) | wq
    orgb = _pack_rgb(means[:, 3], means[:, 4], means[:, 5])

    okhi = jnp.where(is_seg, krows[:, 0], INT_MAX)
    occupied = is_seg & (wgt > 0.0) & (okhi != INT_MAX)

    zero = jnp.zeros((), jnp.int32)
    return OffsetVoxelMap(
        khi=jnp.where(occupied, okhi, INT_MAX),
        klo=jnp.where(occupied, krows[:, 1], INT_MAX),
        oxy=jnp.where(occupied, oxy.astype(jnp.int32), zero),
        ozw=jnp.where(occupied, ozw.astype(jnp.int32), zero),
        rgb=jnp.where(occupied, orgb.astype(jnp.int32), zero),
        voxel_size=voxel_size,
    )


@jax.jit
def offset_map_points(vm: OffsetVoxelMap) -> PointSet:
    kx, ky, kz = unpack_keys(vm.khi, vm.klo)
    u_oxy = vm.oxy.astype(jnp.uint32)
    u_ozw = vm.ozw.astype(jnp.uint32)
    u_rgb = vm.rgb.astype(jnp.uint32)
    w = (u_ozw & 0xFFFF).astype(jnp.float32)
    occ = (w > 0) & (vm.khi != INT_MAX)
    xyz = jnp.stack([
        kx.astype(jnp.float32) + _dq16(u_oxy >> 16),
        ky.astype(jnp.float32) + _dq16(u_oxy & 0xFFFF),
        kz.astype(jnp.float32) + _dq16(u_ozw >> 16),
    ], axis=1) * vm.voxel_size
    rgb = jnp.stack(_unpack_rgb(u_rgb), axis=1)
    return PointSet(
        xyz=jnp.where(occ[:, None], xyz, 0.0),
        rgb=jnp.where(occ[:, None], rgb, 0.0),
        mask=occ,
    )


@jax.jit
def offset_map_size(vm: OffsetVoxelMap) -> jnp.ndarray:
    w = vm.ozw.astype(jnp.uint32) & 0xFFFF
    return jnp.sum(((w > 0) & (vm.khi != INT_MAX)).astype(jnp.int32))
