"""Chunked dense voxel merge: bounded device memory for long sequences.

The sequence-batched fusion/enhanced CLIs run dense back-projection + voxel
merge as ONE jitted program over every view (fusion_pipeline
_dense_merge_batch_fn) — the right dispatch shape through the relay, but
device memory is O(total views): a 256-view 1080p folder stages ~2 GB of
depth + ~1.6 GB of frames and sorts 133M rows in one program, ~10x past the
measured 13M-row sort envelope (CLAUDE.md). This module keeps the merge
EXACT while bounding device memory by a fixed view chunk:

  pass A (per chunk) backproject -> masked min of world coords; the host
         fold of chunk minima is the GLOBAL voxel origin, so the voxel
         partition matches the single-program path (which keys off the
         global masked min).
  pass B (per chunk) backproject -> per-voxel (sum_xyz, sum_rgb, weight)
         keyed to that origin (txr.ops.voxel.voxel_sums); the host fetches
         only the COMPACTED rows, power-of-two bucketed so slice programs
         compile O(log) times.
  pass C (once)     concatenate all chunks' rows (+ optional extra points,
         e.g. the enhanced CLI's sparse set) -> second sorted reduce ->
         per-voxel means (txr.ops.voxel.voxel_means_of_sums).

Sums over disjoint chunks add associatively, so the result equals the
single-program merge up to float summation order (pinned by
tests/test_chunked_merge.py). Reference semantics match
depth_to_reconstruction.py:386-420 (Open3D voxel_down_sample averaging).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from txr.core.types import PointSet
from txr.ops.backproject import backproject_world
from txr.ops.voxel import voxel_means_of_sums, voxel_sums

_raw = lambda f: getattr(f, "__wrapped__", f)
_backproject_raw = _raw(backproject_world)
_voxel_sums_raw = _raw(voxel_sums)

_CHUNK_FN_CACHE: dict = {}


def _chunk_fns(fx, fy, cx, cy, min_depth, max_depth, subsample, voxel_size):
    """Per-config jitted (pass A, pass B) pair. Camera/merge scalars are
    closed over, not runtime args (see _dense_merge_batch_fn's buffer-count
    note in fusion_pipeline.py)."""
    key = (fx, fy, cx, cy, min_depth, max_depth, subsample, voxel_size)
    if key in _CHUNK_FN_CACHE:
        return _CHUNK_FN_CACHE[key]

    def _flat(depths, bgrs, Rs, ts, scales, keep):
        def one(depth, bgr, Ri, ti, s):
            return _backproject_raw(depth, bgr[..., ::-1], Ri, ti,
                                    fx, fy, cx, cy, min_depth, max_depth,
                                    s, subsample)

        ps = jax.vmap(one)(depths, bgrs, Rs, ts, scales)
        m = ps.mask & keep[:, None]
        return PointSet(ps.xyz.reshape(-1, 3), ps.rgb.reshape(-1, 3),
                        m.reshape(-1)), jnp.sum(m, axis=1)

    @jax.jit
    def pass_a(depths, bgrs, Rs, ts, scales, keep):
        flat, _ = _flat(depths, bgrs, Rs, ts, scales, keep)
        big = 3.0e38  # Python float: stays a jaxpr literal (CLAUDE.md)
        return jnp.min(jnp.where(flat.mask[:, None], flat.xyz, big), axis=0)

    @jax.jit
    def pass_b(depths, bgrs, Rs, ts, scales, keep, origin):
        flat, counts = _flat(depths, bgrs, Rs, ts, scales, keep)
        keys, sums, _, n_vox = _voxel_sums_raw(flat, voxel_size, origin)
        return keys, sums, n_vox, counts

    _CHUNK_FN_CACHE[key] = (pass_a, pass_b)
    return pass_a, pass_b


@partial(jax.jit, static_argnames=("k",))
def _take_front(a, k: int):
    return a[:k]


def _pow2(n: int, lo: int = 1) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def chunked_dense_voxel_merge(
    depths,
    bgrs,
    Rs: np.ndarray,
    ts: np.ndarray,
    scales: np.ndarray,
    keep: np.ndarray,
    *,
    fx, fy, cx, cy, min_depth, max_depth,
    subsample: int,
    voxel_size: float,
    chunk_views: int = 8,
    extra: Optional[PointSet] = None,
) -> Tuple[PointSet, np.ndarray]:
    """Host-orchestrated chunked merge.

    `depths`/`bgrs` may be stacked (N, H, W[, 3]) arrays OR per-view
    sequences of mixed-shape arrays (None entries allowed for skipped
    views) — the padded (chunk, Hmax, Wmax) slab is built per chunk, so
    HOST memory is O(chunk) too, not a second O(views) padded copy of
    data the pipeline already holds. Each chunk is staged once per pass
    (twice total): re-staging costs H2D bandwidth but keeps device
    residency at a single chunk, which is the contract that makes long
    sequences fit.

    Returns (merged per-voxel means as a device PointSet, per-view point
    counts (N,) int32). `extra` (e.g. sparse SfM points) joins the final
    reduce as weight-1 rows, matching the single-program path's
    concatenate-then-downsample semantics (enhanced_pipeline.py).
    """
    n = len(depths)
    c = max(1, min(int(chunk_views), n))
    pass_a, pass_b = _chunk_fns(float(fx), float(fy), float(cx), float(cy),
                                float(min_depth), float(max_depth),
                                int(subsample), float(voxel_size))

    shapes = [d.shape for d in depths if d is not None]
    if not shapes:
        shapes = [(1, 1)]
    hmax = max(s[0] for s in shapes)
    wmax = max(s[1] for s in shapes)
    Rs_a = np.asarray(Rs, np.float32)
    ts_a = np.asarray(ts, np.float32)
    scales_a = np.asarray(scales, np.float32)
    keep_a = np.asarray(keep, bool)

    n_pad = int(np.ceil(n / c)) * c

    def pad_small(a, s):
        e = min(s + c, n)
        out = a[s:e]
        if s + c > e:
            out = np.concatenate(
                [out, np.zeros((s + c - e,) + a.shape[1:], a.dtype)])
        return out

    def stage(s):
        e = min(s + c, n)
        dep = np.zeros((c, hmax, wmax), np.float32)
        bgr = np.zeros((c, hmax, wmax, 3), np.uint8)
        for k in range(s, e):
            d = depths[k]
            if d is None:
                continue
            dep[k - s, :d.shape[0], :d.shape[1]] = d
            im = bgrs[k]
            if im is not None:
                if im.ndim == 2:
                    im = im[:, :, None]
                ih, iw = min(im.shape[0], hmax), min(im.shape[1], wmax)
                bgr[k - s, :ih, :iw] = im[:ih, :iw]
        return (jax.device_put(dep), jax.device_put(bgr),
                jax.device_put(pad_small(Rs_a, s)),
                jax.device_put(pad_small(ts_a, s)),
                jax.device_put(pad_small(scales_a, s)),
                jax.device_put(pad_small(keep_a, s)))

    starts = list(range(0, n_pad, c))
    mins = []
    for s in starts:
        args = stage(s)
        mins.append(np.asarray(pass_a(*args)))  # sync frees the chunk
        del args
    origin = np.min(np.stack(mins), axis=0)
    if extra is not None:
        exyz = np.asarray(extra.xyz, np.float32)
        emask = np.asarray(extra.mask, bool)
        if emask.any():
            origin = np.minimum(origin, exyz[emask].min(axis=0))
    origin_d = jax.device_put(origin.astype(np.float32))

    key_rows = []
    sum_rows = []
    counts = np.zeros(n_pad, np.int32)
    for s in starts:
        args = stage(s)  # re-staged: device residency stays O(chunk)
        keys, sums, n_vox, cnts = pass_b(*args, origin_d)
        del args
        bucket = _pow2(int(n_vox))
        key_rows.append(np.asarray(_take_front(keys, bucket)))
        sum_rows.append(np.asarray(_take_front(sums, bucket)))
        counts[s:s + c] = np.asarray(cnts)
    counts = counts[:n]

    if extra is not None and emask.any():
        ergb = np.asarray(extra.rgb, np.float32)
        sel = np.where(emask)[0]
        ek = np.floor((exyz[sel] - origin[None, :]) /
                      np.float32(voxel_size)).astype(np.int32)
        es = np.concatenate([exyz[sel], ergb[sel],
                             np.ones((len(sel), 1), np.float32)], axis=1)
        key_rows.append(ek)
        sum_rows.append(es)

    all_keys = np.concatenate(key_rows)
    all_sums = np.concatenate(sum_rows)
    m = _pow2(len(all_keys))
    pad = m - len(all_keys)
    if pad:
        imax = np.iinfo(np.int32).max
        all_keys = np.concatenate(
            [all_keys, np.full((pad, 3), imax, np.int32)])
        all_sums = np.concatenate([all_sums, np.zeros((pad, 7), np.float32)])
    merged = voxel_means_of_sums(jnp.asarray(all_keys), jnp.asarray(all_sums))
    return merged, counts
