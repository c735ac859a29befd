"""Depth → 3D back-projection as a batched XLA op.

The reference computes this three separate times in NumPy with precomputed
normalized-pixel grids (depth_processor.py:339-422,
depth_enhanced_reconstruction.py:554-613, depth_to_reconstruction.py:328-384).
Here it is one jitted op: the pixel grid is materialized by iota inside the
trace (free after fusion), masking follows the reference semantics
(min_depth < d < max_depth, finite), and the camera→world transform
``X_w = R^T (X_c - t)`` is fused in. Batched over frames with vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from txr.core.types import PointSet


@partial(jax.jit, static_argnames=("stride",))
def backproject(
    depth: jnp.ndarray,
    rgb: jnp.ndarray,
    fx,
    fy,
    cx,
    cy,
    min_depth=0.1,
    max_depth=50.0,
    depth_scale=1.0,
    stride: int = 1,
) -> PointSet:
    """Back-project a depth map to a camera-frame PointSet.

    Args:
      depth: (H, W) float32 depth.
      rgb:   (H, W, 3) uint8 or float RGB image (RGB order; callers convert
             from BGR at the host boundary).
      fx, fy, cx, cy: intrinsics (scalars; may be traced).
      min_depth, max_depth: validity range in meters.
      depth_scale: multiplicative scale applied to depth (metric anchor).
      stride: pixel subsampling factor (static).

    Returns:
      PointSet with capacity ceil(H/stride) * ceil(W/stride).
    """
    d = depth[::stride, ::stride].astype(jnp.float32) * depth_scale
    c = rgb[::stride, ::stride].astype(jnp.float32)
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        c = c / 255.0
    h, w = d.shape

    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * stride
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * stride

    x = (uu - cx) / fx * d
    y = (vv - cy) / fy * d
    valid = (d > min_depth) & (d < max_depth) & jnp.isfinite(d)

    xyz = jnp.stack([x, y, d], axis=-1).reshape(-1, 3)
    col = c.reshape(-1, 3)
    mask = valid.reshape(-1)
    xyz = jnp.where(mask[:, None], xyz, 0.0)
    col = jnp.where(mask[:, None], col, 0.0)
    return PointSet(xyz=xyz, rgb=col, mask=mask)


@jax.jit
def transform_to_world(points: PointSet, R: jnp.ndarray, t: jnp.ndarray) -> PointSet:
    """Camera-frame → world-frame transform X_w = R^T (X_c - t).

    Matches the reference convention where (R, t) map world→camera
    (depth_enhanced_reconstruction.py:602-607).
    """
    xyz = (points.xyz - t.reshape(1, 3)) @ R  # (X - t) @ R == R^T (X - t) rowwise
    xyz = jnp.where(points.mask[:, None], xyz, 0.0)
    return PointSet(xyz=xyz, rgb=points.rgb, mask=points.mask)


# Batched variant: depth (B, H, W), rgb (B, H, W, 3), poses (B, 3, 3)/(B, 3).
# vmaps the RAW function: composing the jitted one inside an outer trace
# converts Python-float intrinsics to captured Arrays (lifted constvars),
# which jax 0.9's C++ fastpath drops on later cache hits (see
# txr/pipelines/fusion_pipeline.py _raw).
backproject_batch = jax.vmap(
    backproject.__wrapped__,
    in_axes=(0, 0, None, None, None, None, None, None, None, None)
)


@partial(jax.jit, static_argnames=("stride",))
def backproject_world(
    depth, rgb, R, t, fx, fy, cx, cy, min_depth=0.1, max_depth=50.0,
    depth_scale=1.0, stride: int = 1,
) -> PointSet:
    """Fused backproject + world transform (one kernel after XLA fusion)."""
    pts = backproject(depth, rgb, fx, fy, cx, cy, min_depth, max_depth, depth_scale, stride)
    return transform_to_world(pts, R, t)
