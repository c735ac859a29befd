"""Metric-scale anchoring of relative depth from sparse SfM points.

Reference semantics: scale = median(sparse_Z / depth_at_pixel) over
triangulated points, requiring >= 5 input points and >= 3 valid samples, else
1.0 (depth_enhanced_reconstruction.py:652-697); plus the sanity clamp
0.001 < s < 1000 and the running EMA avg = 0.7*avg + 0.3*s of
depth_to_reconstruction.py:297-326, :650.

The median over a masked fixed-capacity set is computed by sorting with
invalid entries pushed to +inf and indexing at (count-1)//2 — the masked-median
trick that keeps everything static-shape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of values[mask]; NaN-free, returns 0.0 when nothing is valid."""
    big = jnp.asarray(jnp.inf, values.dtype)
    v = jnp.where(mask, values, big)
    v = jnp.sort(v)
    cnt = jnp.sum(mask.astype(jnp.int32))
    lo = jnp.clip((cnt - 1) // 2, 0, values.shape[0] - 1)
    hi = jnp.clip(cnt // 2, 0, values.shape[0] - 1)
    med = 0.5 * (v[lo] + v[hi])
    return jnp.where(cnt > 0, med, 0.0)


@jax.jit
def estimate_scale(
    sparse_xyz_cam: jnp.ndarray,
    sparse_uv: jnp.ndarray,
    sparse_mask: jnp.ndarray,
    depth_map: jnp.ndarray,
    min_points: int = 5,
    min_valid: int = 3,
) -> jnp.ndarray:
    """Scale factor aligning a relative depth map to metric sparse points.

    Args:
      sparse_xyz_cam: (M, 3) triangulated points in the camera frame.
      sparse_uv: (M, 2) their pixel coordinates (u, v).
      sparse_mask: (M,) validity.
      depth_map: (H, W) relative depth.

    Returns:
      scalar scale; 1.0 on insufficient data (reference fallback).
    """
    h, w = depth_map.shape
    u_raw = jnp.round(sparse_uv[:, 0]).astype(jnp.int32)
    v_raw = jnp.round(sparse_uv[:, 1]).astype(jnp.int32)
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
    estimate_scale(sparse_3d, sparse_2d, depth_map) -> float."""

    def __init__(self, min_points: int = 5, min_valid: int = 3):
        self.min_points = min_points
        self.min_valid = min_valid

    def estimate_scale(self, sparse_points, sparse_2d, depth_map) -> float:
        import numpy as np

        sparse_points = jnp.asarray(np.asarray(sparse_points, np.float32))
        sparse_2d = jnp.asarray(np.asarray(sparse_2d, np.float32))
        mask = jnp.ones(sparse_points.shape[0], bool)
        return float(estimate_scale(
            sparse_points, sparse_2d, mask, jnp.asarray(depth_map),
            min_points=self.min_points, min_valid=self.min_valid))
