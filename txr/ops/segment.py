"""Scatter-free voxel/segment reduction for TPU.

TPU scatter (and jax.ops.segment_sum, which lowers to scatter) costs ~350 ms
for 4M updates on v5e via XLA, while sort is 12-40 ms and cumsum ~10 ms
(measured on-chip). The fusion ops therefore reduce with sorts only:

  1. one lexicographic lax.sort carrying ALL payload columns (a variadic
     sort beats sort-permutation + gather by ~2x at 4M rows),
  2. column-stacked cumsum,
  3. compaction of segment ENDS to the front via a second 1-key sort,
  4. per-segment sums as adjacent differences of the compacted cumulative
     sums: seg_sum[k] = csum_at_end[k] - csum_at_end[k-1].

No scatter instruction is ever emitted. Precision note: the prefix-sum
difference accumulates f32 rounding over the whole array (~1e-4 relative for
millions of rows) — negligible against the 1e-3 chamfer fidelity target but
visible against float64 oracles.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

INT_MAX = jnp.iinfo(jnp.int32).max


def sorted_voxel_reduce(
    kx: jnp.ndarray,
    ky: jnp.ndarray,
    kz: jnp.ndarray,
    cols: Tuple[jnp.ndarray, ...],
    capacity: int,
):
    """Group rows by (kx, ky, kz) and sum each column per group.

    Args:
      kx, ky, kz: (N,) int32 keys. Invalid rows should carry INT_MAX keys and
        zeroed columns (they form a zero-weight tail segment).
      cols: tuple of (N,) float32 columns to segment-sum. Include a weight
        column to derive counts/validity.
      capacity: number of output rows (first `capacity` segments in key order).

    Returns:
      (okx, oky, okz, ocols, valid): each (capacity,) — one row per segment,
      in ascending key order; `valid` is False for slots past the last
      segment. ocols are segment SUMS.
    """
    n = kx.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    sorted_ops = jax.lax.sort((kx, ky, kz) + tuple(cols), num_keys=3)
    skx, sky, skz = sorted_ops[:3]
    scols = jnp.stack(sorted_ops[3:], axis=1)  # (N, D)

    last = (
        (skx != jnp.roll(skx, -1))
        | (sky != jnp.roll(sky, -1))
        | (skz != jnp.roll(skz, -1))
    ).at[n - 1].set(True)

    csum = jnp.cumsum(scols, axis=0, dtype=jnp.float32)  # (N, D)

    # Compact segment ends to the front in position (== key) order.
    order = jnp.where(last, pos, jnp.int32(n))
    _, perm = jax.lax.sort((order, pos), num_keys=1)
    perm_c = perm[:capacity]
    is_seg = order[perm_c] < n

    ends_csum = csum[perm_c]                  # (C, D) cumulative sums at ends
    prev = jnp.concatenate(
        [jnp.zeros((1, ends_csum.shape[1]), ends_csum.dtype), ends_csum[:-1]],
        axis=0)
    seg_sums = ends_csum - prev               # adjacent-difference trick
    seg_sums = jnp.where(is_seg[:, None], seg_sums, 0.0)

    okx = jnp.where(is_seg, skx[perm_c], INT_MAX)
    oky = jnp.where(is_seg, sky[perm_c], INT_MAX)
    okz = jnp.where(is_seg, skz[perm_c], INT_MAX)
    return okx, oky, okz, tuple(seg_sums.T), is_seg
