"""Order-preserving packed voxel keys shared by the fusion maps.

(kx, ky, kz) signed int32 voxel coordinates pack into two int32 sort columns
(hi: x18|y14hi, lo: y4lo|z18) so one lax.sort over (hi, lo) orders voxels
lexicographically; invalid rows carry the INT_MAX empty sentinel. Extracted
from the first packed-map generation when offset_map became the single
canonical fusion map (VERDICT r2 #8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.ops.segment import INT_MAX

HALF_RANGE = 1 << 17  # 2^17 cells per semi-axis
_SIGN = -2147483648   # 0x80000000 as int32 (Python int, not np scalar:
#                       np-scalar module constants become captured device
#                       consts the jit fastpath can drop — see grid_knn)


def pack_keys(kx, ky, kz, valid):
    """(kx, ky, kz) int32 -> (hi, lo) int32, order-preserving; invalid rows
    get (INT_MAX, INT_MAX).

    The upper clip is HALF_RANGE - 2 (one voxel tighter than the lower
    side) so no packed field is ever all-ones on a valid row: at - 1 a far
    +corner voxel packed khi (and offset_map's klo|x column) to exactly
    INT_MAX, the empty sentinel, and the occupancy test silently dropped
    it [code-review r2]. Boundary points merge one voxel inward — the same
    edge-of-range clamp semantics as before."""
    ox = jnp.clip(kx, -HALF_RANGE + 1, HALF_RANGE - 2) + HALF_RANGE
    oy = jnp.clip(ky, -HALF_RANGE + 1, HALF_RANGE - 2) + HALF_RANGE
    oz = jnp.clip(kz, -HALF_RANGE + 1, HALF_RANGE - 2) + HALF_RANGE
    ox = ox.astype(jnp.uint32)
    oy = oy.astype(jnp.uint32)
    oz = oz.astype(jnp.uint32)
    hi_u = (ox << 14) | (oy >> 4)           # 18 + 14 = 32 bits
    lo_u = ((oy & 15) << 18) | oz           # 4 + 18 = 22 bits
    hi = (hi_u ^ jnp.uint32(0x80000000)).astype(jnp.int32)  # unsigned order
    lo = lo_u.astype(jnp.int32)
    hi = jnp.where(valid, hi, INT_MAX)
    lo = jnp.where(valid, lo, INT_MAX)
    return hi, lo


def unpack_keys(hi, lo):
    """(hi, lo) -> (kx, ky, kz); only meaningful on valid rows."""
    hi_u = jax.lax.bitcast_convert_type(hi ^ _SIGN, jnp.uint32)
    lo_u = jax.lax.bitcast_convert_type(lo, jnp.uint32)
    ox = (hi_u >> 14).astype(jnp.int32)
    oy = (((hi_u & 0x3FFF) << 4) | (lo_u >> 18)).astype(jnp.int32)
    oz = (lo_u & 0x3FFFF).astype(jnp.int32)
    return ox - HALF_RANGE, oy - HALF_RANGE, oz - HALF_RANGE
