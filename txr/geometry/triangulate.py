"""Batched DLT triangulation.

The reference triangulates one point at a time with a 4x4 SVD in Python
(depth_enhanced_reconstruction.py:823-842, depth_to_reconstruction.py:217-238
via cv2.triangulatePoints). Here all N points solve at once: the DLT null
vector is the smallest eigenvector of the 4x4 normal matrix A^T A, batched
with vmap — a shape the TPU eats for breakfast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots


def _dlt_single(P1, P2, pt1, pt2):
    A = jnp.stack([
        pt1[0] * P1[2] - P1[0],
        pt1[1] * P1[2] - P1[1],
        pt2[0] * P2[2] - P2[0],
        pt2[1] * P2[2] - P2[1],
    ])
    from txr.ops.eigsmall import smallest_eigvec

    X = smallest_eigvec(A.T @ A)
    w = X[3]
    return jnp.where(jnp.abs(w) > 1e-12, X[:3] / jnp.where(jnp.abs(w) > 1e-12, w, 1.0),
                     jnp.full(3, jnp.inf, X.dtype))


@jax.jit
@f32_dots
def triangulate(P1: jnp.ndarray, P2: jnp.ndarray,
                pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """Triangulate correspondences.

    Args:
      P1, P2: (3, 4) projection matrices.
      pts1, pts2: (N, 2) pixel coordinates.

    Returns:
      (N, 3) world points (inf where the homogeneous w vanishes).
    """
    return jax.vmap(_dlt_single, in_axes=(None, None, 0, 0))(P1, P2, pts1, pts2)


@jax.jit
@f32_dots
def reprojection_error(P: jnp.ndarray, X: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Pixel reprojection error of world points X (N,3) under P (3,4). (N,)"""
    Xh = jnp.concatenate([X, jnp.ones_like(X[:, :1])], axis=-1)
    proj = Xh @ P.T  # (N, 3)
    z = proj[:, 2]
    uv = proj[:, :2] / jnp.where(jnp.abs(z) > 1e-12, z, 1.0)[:, None]
    err = jnp.linalg.norm(uv - pts, axis=-1)
    return jnp.where(jnp.abs(z) > 1e-12, err, jnp.inf)


@jax.jit
@f32_dots
def depth_in_camera(R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Z coordinate of world points in the camera frame (R, t world→cam). (N,)"""
    return X @ R[2, :] + t[2]
