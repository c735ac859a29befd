"""Grid-accelerated kNN mean distance for large point sets.

The exact brute-force kNN (txr.ops.outlier) is O(N^2) — fine to ~100k points,
hopeless for the multi-million-point merged clouds the fusion CLIs produce.
This variant is the TPU equivalent of Open3D's KD-tree queries
(remove_statistical_outlier, reference depth_to_reconstruction.py:413-415):

  1. bin points into cells of edge `cell` (≈ the expected kNN radius),
  2. sort by packed cell key (10 bits/axis → one int32; the grid is clamped
     to 1024^3 — pick `cell` accordingly),
  3. per query point, scan the 27 neighbor cells; each cell's row range comes
     from two binary searches into the sorted keys; up to `per_cell`
     candidates per cell are gathered and ranked with top_k.

Approximate only in the tail: points whose true k-th neighbor lies beyond the
27-cell neighborhood (or past `per_cell` occupancy) see a truncated
neighborhood; the missing neighbors are charged 2*cell each, so the bias is
conservative (sparse points look farther, never closer). `auto_cell` picks
the cell size from the data's bounding box and count so dense regions hit
their full k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(3.0e38)
_BITS = 10
_GRID = 1 << _BITS  # cells per axis


@partial(jax.jit, static_argnames=("k", "per_cell"))
def auto_cell(xyz: jnp.ndarray, mask: jnp.ndarray, k: int = 20,
              per_cell: int = 8) -> jnp.ndarray:
    """Data-driven grid cell size for grid_knn_mean_distance.

    Targets an expected occupancy tau per cell such that the 27-cell
    neighborhood holds ~3k candidates without exceeding the per_cell gather
    cap: tau = min(0.6*per_cell, k/9, >=1). cell = spacing * tau^(1/3) with
    spacing estimated from the bounding-box volume (planar clouds
    underestimate spacing, which truncates neighborhoods conservatively —
    outlier removal then only gets stricter, never looser). Clamped so the
    longest bbox edge still fits the 1024-cell grid.
    """
    big = jnp.float32(3.0e38)
    lo = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], xyz, -big), axis=0)
    ext = jnp.maximum(hi - lo, 1e-9)
    cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    spacing = jnp.cbrt(ext[0] * ext[1] * ext[2] / cnt)
    tau = jnp.maximum(jnp.minimum(0.6 * per_cell, k / 9.0), 1.0)
    cell = spacing * jnp.cbrt(tau)
    return jnp.maximum(cell, jnp.max(ext) / (_GRID - 2))


@partial(jax.jit, static_argnames=("k", "per_cell", "chunk"))
def grid_knn_mean_distance(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    cell: float,
    k: int = 20,
    per_cell: int = 4,
    chunk: int = 65536,
) -> jnp.ndarray:
    """Approximate mean distance to the k nearest neighbors. (N,) float32;
    invalid points get +BIG."""
    n = xyz.shape[0]
    k = max(1, min(k, n - 1)) if n > 1 else 1

    big = jnp.float32(3.0e38)
    masked = jnp.where(mask[:, None], xyz, big)
    min_bound = jnp.min(masked, axis=0)
    cc = jnp.clip(jnp.floor((xyz - min_bound) / cell).astype(jnp.int32),
                  0, _GRID - 1)
    key = (cc[:, 0] << (2 * _BITS)) | (cc[:, 1] << _BITS) | cc[:, 2]
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)

    pos0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    skey, sx, sy, sz, sm, sperm = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2],
         mask.astype(jnp.int32), pos0), num_keys=1)
    sxyz = jnp.stack([sx, sy, sz], axis=1)
    sm = sm.astype(bool)

    # 27 neighbor-cell key offsets (arithmetic, NOT bitwise — negative
    # deltas must borrow across the packed fields).
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                offs.append(dx * (1 << (2 * _BITS)) + dy * (1 << _BITS) + dz)
    offs = jnp.asarray(offs, jnp.int32)  # (27,)

    pad = (-n) % chunk
    q_key = jnp.pad(key, (0, pad), constant_values=jnp.iinfo(jnp.int32).max)
    q_xyz = jnp.pad(xyz, ((0, pad), (0, 0)))
    q_mask = jnp.pad(mask, (0, pad))
    num_chunks = (n + pad) // chunk

    def body(_, ci):
        qk = jax.lax.dynamic_slice_in_dim(q_key, ci * chunk, chunk)      # (C,)
        qx = jax.lax.dynamic_slice_in_dim(q_xyz, ci * chunk, chunk)      # (C,3)
        qm = jax.lax.dynamic_slice_in_dim(q_mask, ci * chunk, chunk)

        nk = qk[:, None] + offs[None, :]                                  # (C,27)
        starts = jnp.searchsorted(skey, nk.reshape(-1), side="left")
        ends = jnp.searchsorted(skey, nk.reshape(-1), side="right")
        starts = starts.reshape(chunk, 27)
        counts = (ends.reshape(chunk, 27) - starts)

        # Gather up to per_cell candidates per neighbor cell.
        slot = jax.lax.broadcasted_iota(jnp.int32, (chunk, 27, per_cell), 2)
        cand = starts[:, :, None] + slot                                  # (C,27,P)
        cand_valid = slot < counts[:, :, None]
        cand = jnp.clip(cand, 0, n - 1).reshape(chunk, 27 * per_cell)
        cand_valid = cand_valid.reshape(chunk, 27 * per_cell)

        cxyz = sxyz[cand]                                                 # (C,M,3)
        cm = sm[cand] & cand_valid
        d2 = jnp.sum((cxyz - qx[:, None, :]) ** 2, axis=-1)
        # Exclude self: identical position at distance 0 — drop exactly one
        # zero by masking the first zero occurrence; cheaper: add +BIG where
        # the candidate row maps back to the query row itself.
        qpos = jax.lax.broadcasted_iota(jnp.int32, (chunk,), 0) + ci * chunk
        self_hit = sperm[cand] == qpos[:, None]
        d2 = jnp.where(cm & ~self_hit, d2, _BIG)

        neg_top, _ = jax.lax.top_k(-d2, k)
        nn_d = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
        valid_nn = (-neg_top) < 1.0e37
        cnt = jnp.sum(valid_nn.astype(jnp.int32), axis=-1)
        # Neighbors missing from the truncated 27-cell window lie at least a
        # cell away; charge them 2*cell so sparse points read FARTHER, never
        # closer (averaging only the found neighbors under-estimated isolated
        # points' distances and let planted outlier clusters survive).
        found_sum = jnp.sum(jnp.where(valid_nn, nn_d, 0.0), axis=-1)
        mean_d = (found_sum + (k - cnt).astype(jnp.float32) * 2.0 * cell) / k
        # Points with no neighbors found at all are extreme outliers.
        mean_d = jnp.where(cnt > 0, mean_d, _BIG / 2)
        return None, jnp.where(qm, mean_d, _BIG)

    _, out = jax.lax.scan(body, None, jnp.arange(num_chunks))
    return out.reshape(-1)[:n]
