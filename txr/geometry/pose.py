"""Relative pose recovery from the essential matrix.

Reference semantics (depth_enhanced_reconstruction.py:845-889 and
cv2.recoverPose usage at depth_to_reconstruction.py:183-215): decompose E into
the four (R, t) candidates and pick the one with the most triangulated points
in front of both cameras (cheirality vote). All four candidates triangulate in
one batched pass here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots

from txr.geometry.triangulate import triangulate


def decompose_essential(E: jnp.ndarray):
    """E → (R1, R2, t) candidate building blocks."""
    from txr.ops.eigsmall import svd3

    U, _, Vt = svd3(E)
    # Keep proper rotations.
    Vt = jnp.where(jnp.linalg.det(U @ Vt) < 0, -Vt, Vt)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    t = U[:, 2]
    return R1, R2, t


@jax.jit
@f32_dots
def recover_pose(E: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray,
                 K: jnp.ndarray, mask: jnp.ndarray):
    """Cheirality-voted pose from E.

    Args:
      E: (3,3) essential matrix.
      pts1, pts2: (N,2) pixel correspondences.
      K: (3,3) intrinsics.
      mask: (N,) correspondence validity.

    Returns:
      R (3,3), t (3,) with ||t||=1, good_mask (N,) points in front of both
      cameras under the winning pose.
    """
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2])          # (4, 3, 3)
    ts = jnp.stack([t, -t, t, -t])            # (4, 3)

    K = K.astype(E.dtype)
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)

    def score(R, tv):
        P2 = K @ jnp.concatenate([R, tv[:, None]], axis=1)
        X = triangulate(P1, P2, pts1, pts2)          # (N, 3) in cam-1 frame
        z1 = X[:, 2]
        z2 = X @ R[2, :] + tv[2]
        good = (z1 > 0) & (z2 > 0) & jnp.isfinite(z1) & mask
        return jnp.sum(good), good

    counts, goods = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], goods[best]


def chain_pose(R_rel: jnp.ndarray, t_rel: jnp.ndarray,
               R_prev: jnp.ndarray, t_prev: jnp.ndarray):
    """Compose world→camera poses: camera_i = rel ∘ camera_{i-1}
    (reference pose chaining, depth_enhanced_reconstruction.py:1193-1196)."""
    R_new = R_rel @ R_prev
    t_new = R_rel @ t_prev + t_rel
    return R_new, t_new
