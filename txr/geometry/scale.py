"""Metric-scale anchoring of relative depth from sparse SfM points.

Reference semantics, TWO variants served by one op:
- depth_enhanced_reconstruction.py:652-697: requires >= 5 input points and
  >= 3 valid samples, NO per-sample clamp (min_points=5,
  per_sample_clamp=False — the defaults).
- depth_to_reconstruction.py:297-326: no input-count gate, each ratio kept
  only if 0.001 < s < 1000, >= 3 survivors (min_points=0,
  per_sample_clamp=True). The final-result clamp of :315-319 is clamp_scale.
Both read the depth pixel with int() TRUNCATION of the sub-pixel keypoint
(f32->s32 convert rounds toward zero, matching Python int()); rounding read
a different pixel than the reference for ~half of all keypoints.

The median over a masked fixed-capacity set is computed by sorting with
invalid entries pushed to +inf and indexing at (count-1)//2 — the
masked-median trick that keeps everything static-shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots


@jax.jit
def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of values[mask]; NaN-free, returns 0.0 when nothing is valid
    (including capacity-0 inputs)."""
    if values.shape[0] == 0:
        return jnp.asarray(0.0, values.dtype)
    big = jnp.asarray(jnp.inf, values.dtype)
    v = jnp.where(mask, values, big)
    v = jnp.sort(v)
    cnt = jnp.sum(mask.astype(jnp.int32))
    lo = jnp.clip((cnt - 1) // 2, 0, values.shape[0] - 1)
    hi = jnp.clip(cnt // 2, 0, values.shape[0] - 1)
    med = 0.5 * (v[lo] + v[hi])
    return jnp.where(cnt > 0, med, 0.0)


@partial(jax.jit,
         static_argnames=("min_points", "min_valid", "per_sample_clamp"))
@f32_dots
def estimate_scale(
    sparse_xyz_cam: jnp.ndarray,
    sparse_uv: jnp.ndarray,
    sparse_mask: jnp.ndarray,
    depth_map: jnp.ndarray,
    min_points: int = 5,
    min_valid: int = 3,
    per_sample_clamp: bool = False,
) -> jnp.ndarray:
    """Scale factor aligning a relative depth map to metric sparse points.

    Args:
      sparse_xyz_cam: (M, 3) triangulated points in the camera frame.
      sparse_uv: (M, 2) their pixel coordinates (u, v).
      sparse_mask: (M,) validity.
      depth_map: (H, W) relative depth.
      min_points: minimum INPUT points (enhanced-reference gate; 0 disables).
      min_valid: minimum surviving samples.
      per_sample_clamp: gate each ratio to (0.001, 1000) BEFORE the median
        (depth_to_reconstruction.py:305-316 semantics).

    Returns:
      scalar scale; 1.0 on insufficient data (reference fallback).
    """
    if sparse_xyz_cam.shape[0] == 0:
        return jnp.asarray(1.0, jnp.float32)
    h, w = depth_map.shape
    # int() truncation, exactly the reference's pixel lookup (f32->s32
    # convert rounds toward zero). Note int(-0.9) == 0 passes the in-image
    # test in the reference too.
    u_raw = sparse_uv[:, 0].astype(jnp.int32)
    v_raw = sparse_uv[:, 1].astype(jnp.int32)
    # Out-of-image projections are EXCLUDED (reference
    # depth_enhanced_reconstruction.py:679-688), not clamped to the border.
    in_image = (u_raw >= 0) & (u_raw < w) & (v_raw >= 0) & (v_raw < h)
    u = jnp.clip(u_raw, 0, w - 1)
    v = jnp.clip(v_raw, 0, h - 1)
    d = depth_map[v, u]
    z = sparse_xyz_cam[:, 2]
    valid = (sparse_mask & in_image & (d > 1e-6) & (z > 0)
             & jnp.isfinite(d) & jnp.isfinite(z))
    ratio = jnp.where(valid, z / jnp.maximum(d, 1e-6), 0.0)
    if per_sample_clamp:
        valid = valid & (ratio > 0.001) & (ratio < 1000.0)
        ratio = jnp.where(valid, ratio, 0.0)
    med = masked_median(ratio, valid)
    n_in = jnp.sum(sparse_mask.astype(jnp.int32))
    n_valid = jnp.sum(valid.astype(jnp.int32))
    ok = (n_in >= min_points) & (n_valid >= min_valid) & (med > 0)
    return jnp.where(ok, med, 1.0)


def clamp_scale(scale, lo: float = 0.001, hi: float = 1000.0, default: float = 1.0):
    """Sanity clamp (reference depth_to_reconstruction.py:315-319)."""
    ok = (scale > lo) & (scale < hi) & jnp.isfinite(scale)
    return jnp.where(ok, scale, default)


def ema_scale(avg_scale, new_scale, alpha: float = 0.7):
    """Running scale EMA avg = alpha*avg + (1-alpha)*new (reference :650)."""
    return alpha * avg_scale + (1.0 - alpha) * new_scale


class DepthScaleEstimator:
    """Reference-named facade (depth_enhanced_reconstruction.py:652-697):
    estimate_scale(sparse_3d, sparse_2d, depth_map, K) -> float. K is
    accepted (the reference signature takes it) and unused (so does the
    reference)."""

    def __init__(self, min_points: int = 5, min_valid: int = 3):
        self.min_points = min_points
        self.min_valid = min_valid

    def estimate_scale(self, sparse_points, sparse_2d, depth_map,
                       K=None) -> float:
        import numpy as np

        sparse_points = jnp.asarray(np.asarray(sparse_points, np.float32))
        sparse_2d = jnp.asarray(np.asarray(sparse_2d, np.float32))
        if sparse_points.shape[0] == 0:
            return 1.0
        mask = jnp.ones(sparse_points.shape[0], bool)
        return float(estimate_scale(
            sparse_points, sparse_2d, mask, jnp.asarray(depth_map),
            min_points=self.min_points, min_valid=self.min_valid))
