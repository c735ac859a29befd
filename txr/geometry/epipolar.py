"""Epipolar geometry as batched XLA ops.

Re-derivation of the reference's from-scratch stack
(depth_enhanced_reconstruction.py:704-889) in TPU-native form:

- Hartley normalization / 8-point / Sampson error operate on fixed-capacity
  masked correspondence sets (weights zero out invalid rows).
- The null vector of the (N, 9) design matrix is found by eigh of the 9x9
  normal matrix A^T A — tiny, symmetric, and batchable, instead of a tall SVD.
- RANSAC is a single vmapped batch of hypotheses: sampling-without-replacement
  is top-k of random priorities, all hypotheses solve and score in parallel
  (the reference runs 2000 sequential Python iterations with one SVD each).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots

_EPS = 1.0e-12


def normalize_transform(pts: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization matrix T (3,3) for weighted 2D points.

    Matches the reference's mean-distance scaling sqrt(2)/avg_dist
    (depth_enhanced_reconstruction.py:704-725), with invalid points excluded
    via weights.
    """
    w = weights.astype(pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    centroid = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - centroid) ** 2, axis=-1))
    avg = jnp.sum(d * w) / wsum
    scale = jnp.where(avg > _EPS, jnp.sqrt(2.0) / jnp.maximum(avg, _EPS), 1.0)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]], pts.dtype)
    T = T * scale
    T = T.at[0, 2].set(-scale * centroid[0])
    T = T.at[1, 2].set(-scale * centroid[1])
    T = T.at[2, 2].set(1.0)
    return T


def _homogeneous(pts: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def _smallest_eigvec(M: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric M with the smallest eigenvalue.

    Fixed-sweep Jacobi (txr/ops/eigsmall.py), not jnp.linalg.eigh: the
    RANSAC hot path calls this vmapped over ~1k tiny 9x9 normals, where
    eigh's while-loop QDWH lowering is latency-bound on TPU."""
    from txr.ops.eigsmall import smallest_eigvec

    return smallest_eigvec(M)


def eight_point(pts1: jnp.ndarray, pts2: jnp.ndarray,
                weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized 8-point fundamental matrix from weighted correspondences.

    pts1, pts2: (N, 2); weights: (N,) with zeros excluding rows. Returns (3,3)
    F with rank-2 enforced and F /= F[2,2] (reference :745-778 semantics).
    """
    n = pts1.shape[0]
    if weights is None:
        weights = jnp.ones((n,), pts1.dtype)
    w = weights.astype(pts1.dtype)

    T1 = normalize_transform(pts1, w)
    T2 = normalize_transform(pts2, w)
    p1 = _homogeneous(pts1) @ T1.T
    p2 = _homogeneous(pts2) @ T2.T

    x1, y1, w1 = p1[:, 0], p1[:, 1], p1[:, 2]
    x2, y2, w2 = p2[:, 0], p2[:, 1], p2[:, 2]
    A = jnp.stack(
        [x1 * x2, y1 * x2, w1 * x2,
         x1 * y2, y1 * y2, w1 * y2,
         x1 * w2, y1 * w2, w1 * w2], axis=-1)
    A = A * w[:, None]

    f = _smallest_eigvec(A.T @ A)
    F0 = f.reshape(3, 3)

    # Rank-2 enforcement by zeroing the smallest singular value.
    from txr.ops.eigsmall import svd3

    U, S, Vt = svd3(F0)
    S = S.at[2].set(0.0)
    F0 = (U * S[None, :]) @ Vt

    F = T2.T @ F0 @ T1
    f22 = F[2, 2]
    F = jnp.where(jnp.abs(f22) > _EPS, F / jnp.where(jnp.abs(f22) > _EPS, f22, 1.0), F)
    return F


def sampson_error(F: jnp.ndarray, pts1: jnp.ndarray, pts2: jnp.ndarray) -> jnp.ndarray:
    """Sampson distance per correspondence (reference :728-742). (N,)"""
    p1 = _homogeneous(pts1)
    p2 = _homogeneous(pts2)
    Fx1 = p1 @ F.T          # (N, 3) rows = F @ x1
    Ftx2 = p2 @ F           # (N, 3) rows = F^T @ x2
    x2tFx1 = jnp.sum(p2 * Fx1, axis=-1)
    denom = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return jnp.where(denom > _EPS, x2tFx1 ** 2 / jnp.maximum(denom, _EPS), jnp.inf)


@partial(jax.jit, static_argnames=("num_hypotheses",))
@f32_dots
def fundamental_ransac(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    threshold: float = 3.0,
    num_hypotheses: int = 1024,
):
    """Vmapped-hypothesis RANSAC for F.

    Args:
      pts1, pts2: (N, 2) fixed-capacity correspondences.
      mask: (N,) validity.
      key: PRNG key.
      threshold: Sampson-error inlier threshold (reference default 3.0).
      num_hypotheses: parallel minimal samples (replaces 2000 sequential iters).

    Returns:
      F (3,3), inlier_mask (N,) — refit on the best hypothesis's inliers.
    """
    n = pts1.shape[0]

    # Sample 8 distinct valid indices per hypothesis: top-8 random priorities.
    prio = jax.random.uniform(key, (num_hypotheses, n))
    prio = jnp.where(mask[None, :], prio, -1.0)
    _, idx = jax.lax.top_k(prio, 8)  # (B, 8)

    s1 = pts1[idx]  # (B, 8, 2)
    s2 = pts2[idx]

    F_hyp = jax.vmap(eight_point)(s1, s2)  # (B, 3, 3)
    errs = jax.vmap(sampson_error, in_axes=(0, None, None))(F_hyp, pts1, pts2)  # (B, N)
    inl = (errs < threshold) & mask[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    best_inliers = inl[best]
    # Refit on inliers (weighted rows; needs >= 8 inliers to be meaningful).
    F_refit = eight_point(pts1, pts2, best_inliers.astype(pts1.dtype))
    use_refit = jnp.sum(best_inliers) >= 8
    F = jnp.where(use_refit, F_refit, F_hyp[best])
    # Recompute the inlier set under the final F (reference keeps the
    # pre-refit inlier list; we keep that behavior).
    return F, best_inliers


@partial(jax.jit, static_argnames=("num_hypotheses",))
@f32_dots
def essential_ransac(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    mask: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    threshold: float = 2.0,
    num_hypotheses: int = 1024,
):
    """RANSAC essential matrix via 8-point on K-normalized coordinates.

    The pixel-space Sampson threshold is mapped into normalized coordinates
    by the mean focal length (cv2.findEssentialMat-style thresholding,
    reference depth_to_reconstruction.py:183-215).

    Returns E (3,3), inlier_mask (N,).
    """
    f_mean = (K[0, 0] + K[1, 1]) / 2.0
    Kinv = jnp.linalg.inv(K.astype(pts1.dtype))
    n1 = (_homogeneous(pts1) @ Kinv.T)[:, :2]
    n2 = (_homogeneous(pts2) @ Kinv.T)[:, :2]
    thr_norm = (threshold / f_mean) ** 2  # sampson err is squared distance

    fmask = mask

    prio = jax.random.uniform(key, (num_hypotheses, pts1.shape[0]))
    prio = jnp.where(fmask[None, :], prio, -1.0)
    _, idx = jax.lax.top_k(prio, 8)

    def solve(i):
        Fh = eight_point(n1[i], n2[i])
        # Project to the essential manifold: singular values (1, 1, 0).
        from txr.ops.eigsmall import svd3

        U, S, Vt = svd3(Fh)
        return (U * jnp.array([1.0, 1.0, 0.0], Fh.dtype)[None, :]) @ Vt

    E_hyp = jax.vmap(solve)(idx)
    errs = jax.vmap(sampson_error, in_axes=(0, None, None))(E_hyp, n1, n2)
    inl = (errs < thr_norm) & fmask[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    best_inliers = inl[best]
    F_refit = eight_point(n1, n2, best_inliers.astype(pts1.dtype))
    from txr.ops.eigsmall import svd3

    U, S, Vt = svd3(F_refit)
    E_refit = (U * jnp.array([1.0, 1.0, 0.0], F_refit.dtype)[None, :]) @ Vt
    use_refit = jnp.sum(best_inliers) >= 8
    E = jnp.where(use_refit, E_refit, E_hyp[best])
    return E, best_inliers
