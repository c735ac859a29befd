"""Mean-offset packed voxel map — the canonical fusion map (4 sort operands).

lax.sort cost on v5e scales with operand count (tools/probe_sort_ops.py at
13M rows: 3 ops 57 ms, 4 ops 69 ms, 5 ops 80 ms), so this variant packs the
whole per-voxel state into FOUR int32 columns; the insert's dominant sort
carries nothing else:

  khi   : voxel key bits x18|y14hi (order-preserved via sign-bit xor)
  klo_x : voxel key bits y4lo|z18 (22) << 10 | x-offset u10 (sign-bit xor).
          The x offset rides the low bits of the second SORT KEY — it only
          tie-breaks rows within a voxel segment, never reorders voxels.
  yzw   : y-offset u10 << 21 | z-offset u10 << 11 | weight u11
  rgb   : mean color r8|g8|b8 (matches the u8 PLY output exactly)

Offsets are the mean position within the voxel in units of voxel_size/1024
(quantization 20 um at 2 cm voxels — far below sensor noise). Weight
saturates at 2047; past that a voxel's mean updates as an EMA with
alpha ~= 1/2048 (the reference's Open3D voxel_down_sample exposes only
means, not counts — depth_to_reconstruction.py:413-415). Re-quantizing a
stable mean is a fixed point of floor(mean * 2^bits) with midpoint dequant,
so untouched voxels do not drift across inserts.

Numerics: the insert reduces with a SEGMENTED scan (txr/ops/scan.py), so
rounding scales with each segment's own sum (~1e-7 relative) — independent
of total accumulated map weight and of session length (the round-1 advisor
finding on global prefixes).

The single canonical fusion map (VERDICT r2 #8): replaces the reference's
Open3D voxel hash downsample (depth_to_reconstruction.py:386-420); the
earlier hash/sorted/packed generations are deleted. Shared key packing
lives in txr/fusion/keys.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from txr.core.types import PointSet
from txr.fusion.keys import pack_keys, unpack_keys
from txr.ops.scan import segmented_cumsum_cols
from txr.ops.segment import INT_MAX

# Python int, not np.int32: np-scalar module constants become captured
# device-array consts that jax 0.9's C++ jit fastpath can drop on repeat
# calls (see txr/ops/grid_knn.py _BIG note).
_SIGN = -2147483648  # 0x80000000
W_MAX = 2047                    # 11-bit weight saturation


def _q(x, bits):
    """[0, 1) float -> fixed point (as uint32)."""
    scale = float(1 << bits)
    return jnp.clip(jnp.floor(x * scale), 0, scale - 1).astype(jnp.uint32)


def _dq(u, bits):
    """fixed point -> midpoint dequantized float in (0, 1)."""
    return (u.astype(jnp.float32) + 0.5) * (1.0 / float(1 << bits))


def _pack_klo_x(lo, xoff_u10, valid):
    """22-bit klo (int32) + u10 x offset -> sign-xored int32 sort column.

    Valid rows can never collide with the INT_MAX empty sentinel:
    pack_keys clips every coordinate to _HALF_RANGE - 2, so the z18 field
    is strictly below all-ones and the xored column stays < INT_MAX even
    with x offset 1023 (regression: tests/test_offset_map.py
    test_far_corner_voxel_not_dropped).
    """
    lo_u = lo.astype(jnp.uint32)
    u = (lo_u << 10) | xoff_u10
    return jnp.where(valid, (u ^ jnp.uint32(0x80000000)).astype(jnp.int32),
                     INT_MAX)


def _unpack_klo_x(klo_x):
    u = jax.lax.bitcast_convert_type(klo_x ^ _SIGN, jnp.uint32)
    return (u >> 10).astype(jnp.int32), u & 0x3FF


def _pack_yzw(yoff_u10, zoff_u10, w):
    return ((yoff_u10 << 21) | (zoff_u10 << 11)
            | jnp.minimum(w, jnp.uint32(W_MAX))).astype(jnp.int32)


def _pack_rgb(r, g, b):
    return ((_q(r, 8) << 16) | (_q(g, 8) << 8) | _q(b, 8)).astype(jnp.int32)


def _unpack_rgb(u):
    return (_dq((u >> 16) & 0xFF, 8), _dq((u >> 8) & 0xFF, 8),
            _dq(u & 0xFF, 8))


class OffsetVoxelMap(NamedTuple):
    khi: jnp.ndarray     # (C,) int32 packed key high bits (INT_MAX = empty)
    klo_x: jnp.ndarray   # (C,) int32 key low 22 | x-offset u10 (sign-xored)
    yzw: jnp.ndarray     # (C,) int32 y10|z10|w11
    rgb: jnp.ndarray     # (C,) int32 r8|g8|b8 mean color
    voxel_size: jnp.ndarray

    @property
    def count(self):
        return (self.yzw.astype(jnp.uint32) & 0x7FF).astype(jnp.float32)


NCOLS = 4  # packed int32 columns (== sort operands)


def create_offset_map(capacity: int, voxel_size: float) -> OffsetVoxelMap:
    return OffsetVoxelMap(
        khi=jnp.full((capacity,), INT_MAX, jnp.int32),
        klo_x=jnp.full((capacity,), INT_MAX, jnp.int32),
        yzw=jnp.zeros((capacity,), jnp.int32),
        rgb=jnp.zeros((capacity,), jnp.int32),
        voxel_size=jnp.asarray(voxel_size, jnp.float32),
    )


def _point_cols(points: PointSet, voxel_size):
    """PointSet -> the four packed int32 insert columns (weight 1 each)."""
    g = points.xyz / voxel_size
    coords = jnp.floor(g).astype(jnp.int32)
    pm = points.mask
    # Zero masked rows before quantizing: their xyz/rgb may be garbage/NaN.
    off = jnp.where(pm[:, None], g - coords.astype(jnp.float32), 0.0)
    rgb = jnp.where(pm[:, None], points.rgb, 0.0)
    bhi, blo = pack_keys(coords[:, 0], coords[:, 1], coords[:, 2], pm)
    w1 = pm.astype(jnp.uint32)                     # weight 1 valid, 0 invalid
    bklo_x = _pack_klo_x(blo, _q(off[:, 0], 10), pm)
    byzw = _pack_yzw(_q(off[:, 1], 10), _q(off[:, 2], 10), w1)
    brgb = _pack_rgb(rgb[:, 0], rgb[:, 1], rgb[:, 2])
    return (bhi, bklo_x, byzw, brgb)


@partial(jax.jit, donate_argnums=(0,))
def offset_map_insert(vm: OffsetVoxelMap, points: PointSet) -> OffsetVoxelMap:
    bcols = _point_cols(points, vm.voxel_size)
    cols = tuple(jnp.concatenate([v, b])
                 for v, b in zip(vm[:NCOLS], bcols))
    return _reduce_packed(cols, vm.khi.shape[0], vm.voxel_size)


@jax.jit
def offset_map_merge(a: OffsetVoxelMap, b: OffsetVoxelMap) -> OffsetVoxelMap:
    """Exact weighted merge of two offset maps (same voxel_size).

    Both maps' packed rows carry their accumulated u11 weights, and the
    segment reduce sums weight-scaled mean offsets — the same math the
    insert applies to the resident map's rows — so merging partial maps
    (e.g. per-chip shards from a dp mesh, txr/parallel/pipeline.py) is the
    associative weighted-mean combine, not a weight-1 reinsertion of means.
    Output capacity = a's capacity.
    """
    cols = tuple(jnp.concatenate([x, y]) for x, y in zip(a[:NCOLS], b[:NCOLS]))
    return _reduce_packed(cols, a.khi.shape[0], a.voxel_size)


def _reduce_packed(cols, cap: int, voxel_size) -> OffsetVoxelMap:
    n = cols[0].shape[0]
    s = jax.lax.sort(cols, num_keys=2)
    skhi = s[0]
    sklo, u_x = _unpack_klo_x(s[1])
    u_yzw = s[2].astype(jnp.uint32)
    u_rgb = s[3].astype(jnp.uint32)
    w = (u_yzw & 0x7FF).astype(jnp.float32)
    rr, gg, bb = _unpack_rgb(u_rgb)
    # Weighted contributions; invalid rows (w=0) contribute nothing.
    wcols = (
        _dq(u_x, 10) * w,
        _dq((u_yzw >> 21) & 0x3FF, 10) * w,
        _dq((u_yzw >> 11) & 0x3FF, 10) * w,
        rr * w,
        gg * w,
        bb * w,
        w,
    )

    # Voxel-segment boundaries compare KEY bits only — klo_x's low 10 bits
    # are the x offset, which merely tie-breaks rows inside a segment.
    last = ((skhi != jnp.roll(skhi, -1)) | (sklo != jnp.roll(sklo, -1))
            ).at[n - 1].set(True)
    starts = jnp.roll(last, 1)  # row 0 rolls in last[n-1] == True

    # SEGMENTED scan, not global-cumsum + adjacent differences: a global f32
    # prefix grows with TOTAL accumulated map weight, and segment sums
    # recovered as prefix differences then carry absolute errors that corrupt
    # means and the wgt>0 occupancy test (ADVICE r1). The segmented scan
    # resets at each segment start, so rounding scales with the segment's
    # OWN sum (~1e-7 relative) regardless of session length. The value at a
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
    wq = jnp.clip(wgt, 0, W_MAX).astype(jnp.uint32)
    okhi = jnp.where(is_seg, krows[:, 0], INT_MAX)
    occupied = is_seg & (wgt > 0.0) & (okhi != INT_MAX)
    klo_x = _pack_klo_x(krows[:, 1], _q(means[:, 0], 10), occupied)
    yzw = _pack_yzw(_q(means[:, 1], 10), _q(means[:, 2], 10), wq)
    orgb = _pack_rgb(means[:, 3], means[:, 4], means[:, 5])

    zero = jnp.zeros((), jnp.int32)
    return OffsetVoxelMap(
        khi=jnp.where(occupied, okhi, INT_MAX),
        klo_x=klo_x,
        yzw=jnp.where(occupied, yzw, zero),
        rgb=jnp.where(occupied, orgb, zero),
        voxel_size=voxel_size,
    )


@jax.jit
def offset_map_points(vm: OffsetVoxelMap) -> PointSet:
    sklo, u_x = _unpack_klo_x(vm.klo_x)
    kx, ky, kz = unpack_keys(vm.khi, sklo)
    u_yzw = vm.yzw.astype(jnp.uint32)
    w = (u_yzw & 0x7FF).astype(jnp.float32)
    occ = (w > 0) & (vm.khi != INT_MAX)
    xyz = jnp.stack([
        kx.astype(jnp.float32) + _dq(u_x, 10),
        ky.astype(jnp.float32) + _dq((u_yzw >> 21) & 0x3FF, 10),
        kz.astype(jnp.float32) + _dq((u_yzw >> 11) & 0x3FF, 10),
    ], axis=1) * vm.voxel_size
    rgb = jnp.stack(_unpack_rgb(vm.rgb.astype(jnp.uint32)), axis=1)
    return PointSet(
        xyz=jnp.where(occ[:, None], xyz, 0.0),
        rgb=jnp.where(occ[:, None], rgb, 0.0),
        mask=occ,
    )


@jax.jit
def offset_map_size(vm: OffsetVoxelMap) -> jnp.ndarray:
    w = vm.yzw.astype(jnp.uint32) & 0x7FF
    return jnp.sum(((w > 0) & (vm.khi != INT_MAX)).astype(jnp.int32))
