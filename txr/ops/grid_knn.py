"""Grid-accelerated kNN mean distance for large point sets.

The exact brute-force kNN (txr.ops.outlier) is O(N^2) — fine to ~100k points,
hopeless for the multi-million-point merged clouds the fusion CLIs produce.
This is the TPU equivalent of Open3D's KD-tree queries
(remove_statistical_outlier, reference depth_to_reconstruction.py:413-415),
designed around the measured TPU gather law (CLAUDE.md: row gathers are
DESCRIPTOR-bound at ~50M rows/s regardless of row width):

  1. bin points into cells of edge `cell` (9 bits/axis, z in the low bits so
     a [z-1, z+1] span is CONTIGUOUS in key space),
  2. sort points by packed cell key,
  3. build a direct-address table T over all 2^27 flat keys with
     T[c] = first sorted index with key >= c — a boundary scatter (one row
     per occupied cell) followed by a reverse cummin; this replaces
     per-query vectorized binary searches (searchsorted = ~20 gather passes),
  4. per query, the 27 neighbor cells collapse into NINE (dx, dy) ranges
     (the 3-cell z-span per column is one contiguous sorted-index interval);
     each range needs ONE gather into a (2^27, 2) lo/hi table and ONE gather
     into a pre-packed sliding-window array PW[i] = sxyz[i : i + W] — so a
     query costs 18 gather descriptors instead of the ~1300 of the
     searchsorted + per-candidate formulation (measured ~6 s -> sub-second
     at 1M points, tools/probe_merge.py).

Approximate only in the tail: each (dx, dy) range is truncated to
W = 3 * per_cell candidates (taken in sorted z order, so over-extension at
z borders drops first); missing neighbors are charged 2 * cell each, so the
bias is conservative (sparse points look farther, never closer). `auto_cell`
picks the cell size from the data's bounding box and count so dense regions
hit their full k.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Python float, NOT np.float32: np-scalar module constants become device
# ArrayImpls under jax 0.9 (globally cached), get captured as lifted
# consts in later traces, and the C++ jit fastpath then drops them on
# repeat same-structure calls ("Execution supplied N buffers but
# compiled program expected N+1"). A Python float stays a jaxpr literal.
_BIG = 3.0e38
_BITS = 9
_GRID = 1 << _BITS  # cells per axis
_NKEYS = 1 << (3 * _BITS)


def _median_occupancy(xyz: jnp.ndarray, mask: jnp.ndarray, lo: jnp.ndarray,
                      cell: jnp.ndarray) -> jnp.ndarray:
    """Median points-per-occupied-cell at grid size `cell` (float scalar)."""
    big = 3.0e38  # Python float: stays a jaxpr literal (see _BIG note)
    n = xyz.shape[0]
    cc = jnp.clip(jnp.floor((xyz - lo) / cell).astype(jnp.int32),
                  0, _GRID - 1)
    key = (cc[:, 0] << (2 * _BITS)) | (cc[:, 1] << _BITS) | cc[:, 2]
    key = jnp.where(mask, key, _NKEYS)
    skey = jax.lax.sort(key)
    smv = skey < _NKEYS
    first_all = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    first = first_all & smv  # valid segment starts (counted for the median)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    # next boundary position after i (inclusive scan from the right); the
    # UNMASKED boundaries terminate the last occupied cell's segment at the
    # first invalid row — otherwise its length swallows the masked tail and
    # blows up the median on compact clouds.
    nb = jax.lax.cummin(
        jnp.where(jnp.concatenate([first_all[1:], jnp.ones((1,), bool)]),
                  idx + 1, n), reverse=True)
    seg_len = jnp.where(first, nb - idx, 0).astype(jnp.float32)
    # masked median over occupied cells (sort lengths, invalid -> +inf)
    lens = jnp.where(first, seg_len, big)
    lens = jax.lax.sort(lens)
    m = jnp.maximum(jnp.sum(first.astype(jnp.int32)), 1)
    return jnp.take(lens, (m - 1) // 2)


@partial(jax.jit, static_argnames=("k", "per_cell"))
def auto_cell(xyz: jnp.ndarray, mask: jnp.ndarray, k: int = 20,
              per_cell: int = 8) -> jnp.ndarray:
    """Data-driven grid cell size for grid_knn_mean_distance.

    Targets an expected occupancy tau per cell such that the 27-cell
    neighborhood holds ~3k candidates without exceeding the per-range gather
    cap: tau = min(0.6*per_cell, k/9, >=1). A bounding-box volume estimate
    alone fails in BOTH directions:

    - far outlier clusters stretch the bbox, the cell comes out many times
      the true spacing, every window truncates, and the inflated variance
      lets outliers through the mu+2*sigma test → refine DOWN by the
      measured median occupancy, cell0 * (tau/med)^(1/3);
    - PLANAR clouds (tunnel walls, a single fused depth plane) have a
      near-zero extent on one axis, so the volume estimate can sit far
      BELOW the true in-plane spacing — at that cell every 27-cell window
      is empty, every point reads the no-neighbor sentinel, and the outlier
      pass deletes the whole cloud (VERDICT r3 weak #1, golden scene).
      Refining up needs the local intrinsic dimension, which one probe
      cannot give: probe a 4x ladder (cell0, 4c0, 16c0, 64c0), take the
      first rung whose occupancy reaches tau, and interpolate within the
      bracket using d = log4(med_i / med_{i-1}) clamped to [0.5, 3].

    The ladder runs under lax.cond, so well-tuned volumetric clouds (the
    common fusion case) still pay exactly one probe. Clamped so the longest
    bbox edge still fits the 512-cell grid.
    """
    big = 3.0e38  # Python float: stays a jaxpr literal (see _BIG note)
    lo = jnp.min(jnp.where(mask[:, None], xyz, big), axis=0)
    hi = jnp.max(jnp.where(mask[:, None], xyz, -big), axis=0)
    ext = jnp.maximum(hi - lo, 1e-9)
    cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    spacing = jnp.cbrt(ext[0] * ext[1] * ext[2] / cnt)
    tau = jnp.maximum(jnp.minimum(0.6 * per_cell, k / 9.0), 1.0)
    cell0 = jnp.maximum(spacing * jnp.cbrt(tau),
                        jnp.max(ext) / (_GRID - 2))

    med0 = _median_occupancy(xyz, mask, lo, cell0)

    def refine_down(_):
        c = cell0 * jnp.cbrt(tau / jnp.maximum(med0, 1.0))
        return jnp.clip(c, 0.05 * cell0, cell0)

    def refine_up(_):
        cells = [cell0, 4.0 * cell0, 16.0 * cell0, 64.0 * cell0]
        meds = [med0] + [_median_occupancy(xyz, mask, lo, c)
                         for c in cells[1:]]
        # Extrapolate past the last rung if even 64*cell0 is under-occupied
        # (extreme sparsity); assume d=1 there — growth is always safe for
        # the 512-cell grid (fewer cells, never more).
        cell = cells[3] * jnp.clip(tau / jnp.maximum(meds[3], 1.0), 1.0, 16.0)
        for i in (3, 2, 1):
            d = jnp.log(jnp.maximum(meds[i], 1.0)
                        / jnp.maximum(meds[i - 1], 1.0)) / jnp.log(4.0)
            d = jnp.clip(d, 0.5, 3.0)
            cand = cells[i] * jnp.power(tau / jnp.maximum(meds[i], 1.0),
                                        1.0 / d)
            cand = jnp.clip(cand, cells[i - 1], cells[i])
            cell = jnp.where(meds[i] >= tau, cand, cell)
        return cell

    cell = jax.lax.cond(med0 >= tau, refine_down, refine_up, None)
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
    W = 3 * per_cell          # candidate cap per (dx, dy) z-range

    big = 3.0e38  # Python float: stays a jaxpr literal (see _BIG note)
    masked = jnp.where(mask[:, None], xyz, big)
    min_bound = jnp.min(masked, axis=0)
    cc = jnp.clip(jnp.floor((xyz - min_bound) / cell).astype(jnp.int32),
                  0, _GRID - 1)
    key = (cc[:, 0] << (2 * _BITS)) | (cc[:, 1] << _BITS) | cc[:, 2]
    key = jnp.where(mask, key, _NKEYS)  # invalid sorts last

    pos0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    skey, sx, sy, sz, sm, sperm = jax.lax.sort(
        (key, xyz[:, 0], xyz[:, 1], xyz[:, 2],
         mask.astype(jnp.int32), pos0), num_keys=1)
    sm = sm.astype(bool)
    # Invalid points (and the window's ragged tail) must never look like
    # near neighbors: give them +BIG coordinates before packing.
    sxyz = jnp.stack([sx, sy, sz], axis=1)
    sxyz = jnp.where(sm[:, None], sxyz, big)

    # ---- 3. direct-address first-index table over flat keys --------------
    # S[c] = sorted index of the first point in cell c (occupied cells only:
    # one scatter row per cell boundary), then T = reverse-cummin(S) gives
    # T[c] = first sorted index with key >= c for EVERY c — exactly
    # searchsorted(skey, c, 'left'), with no per-query binary search.
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    # The first INVALID row (key == _NKEYS) is a boundary too: it records
    # the valid/invalid split at S[_NKEYS], so ranges spanning past the last
    # occupied key read hi = n_valid rather than n. Without it, cnt inflates
    # by the masked-tail size and the window-centering shift below lands the
    # candidate window inside the +BIG tail — every point in the
    # lexicographically-last occupied cell then reads "no neighbors" and is
    # unconditionally dropped by the outlier pass.
    scat_idx = jnp.where(first, skey, _NKEYS + 8)  # non-boundaries -> drop
    S = jnp.full((_NKEYS + 4,), n, jnp.int32)
    S = S.at[scat_idx].min(pos0.astype(jnp.int32), mode="drop")
    T = jax.lax.cummin(S, reverse=True)
    # Range table: one 2-column row per key -> (lo, hi) of the contiguous
    # 3-z-cell span starting at that key: lo = T[c], hi = T[c + 3].
    T2 = jnp.stack([T[:_NKEYS], T[3:_NKEYS + 3]], axis=1)  # (2^27, 2)

    # ---- 4. packed sliding windows: PW[i] = sxyz[i : i + W] --------------
    padded = jnp.concatenate([sxyz, jnp.full((W, 3), big)], axis=0)
    PW = jnp.concatenate([padded[j:j + n] for j in range(W)],
                         axis=1)                             # (n, 3W)

    # 9 (dx, dy) column offsets; z handled by the 3-cell span.
    col_offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            col_offs.append((dx, dy))

    pad = (-n) % chunk
    # Pre-pad the sorted query arrays: dynamic_slice clamps at array ends,
    # which would misalign the final chunk.
    sxyz_p = jnp.concatenate([sxyz, jnp.full((pad, 3), big)], axis=0)
    sm_p = jnp.concatenate([sm, jnp.zeros((pad,), bool)])
    skey_p = jnp.concatenate(
        [skey, jnp.full((pad,), _NKEYS, jnp.int32)])
    num_chunks = (n + pad) // chunk

    def body(_, ci):
        # Queries processed in SORTED order: coordinates come from plain
        # dynamic slices of the sorted arrays (no gathers), and the self-
        # candidate is the one whose global sorted index equals the query's.
        base = ci * chunk
        qx = jax.lax.dynamic_slice_in_dim(sxyz_p, base, chunk)    # (C,3)
        qm = jax.lax.dynamic_slice_in_dim(sm_p, base, chunk)
        qk = jax.lax.dynamic_slice_in_dim(skey_p, base, chunk)
        zx = qk >> (2 * _BITS)
        zy = (qk >> _BITS) & (_GRID - 1)
        zz = qk & (_GRID - 1)
        qpos = jax.lax.broadcasted_iota(jnp.int32, (chunk,), 0) + base

        d2_all = []
        valid_all = []
        self_all = []
        for dx, dy in col_offs:
            xx = zx + dx
            yy = zy + dy
            inb = ((xx >= 0) & (xx < _GRID) & (yy >= 0) & (yy < _GRID)
                   & (qk < _NKEYS))
            # Clamp the 3-key span fully inside the column: at zz = GRID-1
            # an unclamped [zz-1, zz+2) wraps into the NEXT (x, y+1)
            # column's z=0 cell, and those spatially distant points consume
            # candidate-window slots (evicting genuine neighbors when the
            # range exceeds W). z0 = GRID-3 trades that for one extra
            # in-column cell below — same class as the z=0 border.
            z0 = jnp.clip(zz - 1, 0, _GRID - 3)
            k0 = (xx << (2 * _BITS)) | (yy << _BITS) | z0
            k0 = jnp.clip(k0, 0, _NKEYS - 1)
            rng = T2[k0]                                     # (C, 2)
            lo = jnp.where(inb, rng[:, 0], 0)
            hi = jnp.where(inb, rng[:, 1], 0)
            cnt = hi - lo
            # Over-full ranges: center the W-window in the range (the sorted
            # order within a cell is by x, so the window ends are spatially
            # biased; the center tracks the query's own column best).
            lo = lo + jnp.maximum(cnt - W, 0) // 2
            cnt = jnp.minimum(cnt, W)
            lo_c = jnp.clip(lo, 0, n - 1)
            cand = PW[lo_c].reshape(chunk, W, 3)             # one row gather
            slot = jax.lax.broadcasted_iota(jnp.int32, (chunk, W), 1)
            cv = slot < cnt[:, None]
            d2 = jnp.sum((cand - qx[:, None, :]) ** 2, axis=-1)  # (C, W)
            d2_all.append(d2)
            valid_all.append(cv)
            self_all.append((lo[:, None] + slot) == qpos[:, None])

        d2 = jnp.concatenate(d2_all, axis=1)                 # (C, 9W)
        cv = jnp.concatenate(valid_all, axis=1)
        sh = jnp.concatenate(self_all, axis=1)
        d2 = jnp.where(cv & ~sh, d2, _BIG)

        neg_top, _ = jax.lax.top_k(-d2, k)
        nn_d = jnp.sqrt(jnp.maximum(-neg_top, 0.0))
        valid_nn = (-neg_top) < 1.0e37
        cnt = jnp.sum(valid_nn.astype(jnp.int32), axis=-1)
        # Neighbors missing from the truncated window lie at least a cell
        # away; charge them 2*cell so sparse points read FARTHER, never
        # closer (averaging only the found neighbors under-estimated
        # isolated points' distances and let outlier clusters survive).
        found_sum = jnp.sum(jnp.where(valid_nn, nn_d, 0.0), axis=-1)
        mean_d = (found_sum + (k - cnt).astype(jnp.float32) * 2.0 * cell) / k
        # Points with no neighbors found at all are extreme outliers.
        mean_d = jnp.where(cnt > 0, mean_d, _BIG / 2)
        return None, jnp.where(qm, mean_d, _BIG)

    _, out = jax.lax.scan(body, None, jnp.arange(num_chunks))
    out_sorted = out.reshape(-1)[:n]

    # Unsort via a second small sort (cheaper than a scatter at this scale:
    # CLAUDE.md gather/scatter law).
    _, restored = jax.lax.sort((sperm, out_sorted), num_keys=1)
    return restored
