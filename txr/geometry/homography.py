"""Homography estimation + decomposition for planar-degenerate two-view init.

The reference recovers pose with cv2.findEssentialMat's 5-point solver
(depth_to_reconstruction.py:183-215), which stays well-posed when the scene
is (near-)planar. Our vmapped 8-point essential RANSAC is degenerate there —
measured on the synthetic two-plane golden scene it returns a translation
40 degrees off axis (and the downstream depth scale lands at 50 instead of
the ground-truth 60). Textureless tunnels — this project's headline domain —
are exactly such scenes.

TPU-native fix, the classical one (ORB-SLAM's initializer): fit BOTH a
fundamental/essential model and a homography, and when the homography
explains the matches (planar scene), recover pose by SVD homography
decomposition (Faugeras; 8 candidate (R, t, n) solutions) with chirality
voting. Everything is fixed-shape and vmapped: 4-point DLT hypotheses in a
single batched solve, 8 decomposition candidates scored in one vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots

from txr.geometry.epipolar import _homogeneous, normalize_transform
from txr.geometry.triangulate import triangulate

_EPS = 1e-12


def homography_dlt(pts1: jnp.ndarray, pts2: jnp.ndarray,
                   weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Normalized DLT homography from >= 4 correspondences. (3,3), H x1 ~ x2."""
    n = pts1.shape[0]
    w = jnp.ones((n,), pts1.dtype) if weights is None else weights
    T1 = normalize_transform(pts1, w)
    T2 = normalize_transform(pts2, w)
    p1 = _homogeneous(pts1) @ T1.T
    p2 = _homogeneous(pts2) @ T2.T

    zero = jnp.zeros_like(p1)
    # Rows: [0, -x1, y2*x1; x1, 0, -x2*x1] per correspondence.
    r1 = jnp.concatenate([zero, -p1, p2[:, 1:2] * p1], axis=1)
    r2 = jnp.concatenate([p1, zero, -p2[:, 0:1] * p1], axis=1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N, 9)
    from txr.ops.eigsmall import smallest_eigvec

    Hn = smallest_eigvec(A.T @ A).reshape(3, 3)
    from txr.ops.eigsmall import inv3

    H = inv3(T2) @ Hn @ T1
    return H / jnp.where(jnp.abs(H[2, 2]) > _EPS, H[2, 2], 1.0)


def transfer_error(H: jnp.ndarray, pts1: jnp.ndarray,
                   pts2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric squared transfer error per correspondence. (N,)"""
    p1 = _homogeneous(pts1)
    p2 = _homogeneous(pts2)
    q2 = p1 @ H.T
    from txr.ops.eigsmall import inv3

    q1 = p2 @ inv3(H).T
    z2 = jnp.where(jnp.abs(q2[:, 2:3]) > _EPS, q2[:, 2:3], _EPS)
    z1 = jnp.where(jnp.abs(q1[:, 2:3]) > _EPS, q1[:, 2:3], _EPS)
    e12 = jnp.sum((q2[:, :2] / z2 - pts2) ** 2, axis=-1)
    e21 = jnp.sum((q1[:, :2] / z1 - pts1) ** 2, axis=-1)
    return e12 + e21


@partial(jax.jit, static_argnames=("num_hypotheses",))
@f32_dots
def homography_ransac(pts1: jnp.ndarray, pts2: jnp.ndarray, mask: jnp.ndarray,
                      key: jax.Array, threshold: float = 3.0,
                      num_hypotheses: int = 1024):
    """Vmapped 4-point RANSAC. Returns H (3,3), inlier_mask (N,).

    threshold is in pixels; the symmetric transfer test uses 2*threshold^2
    (two squared distances summed), mirroring the Sampson threshold scale
    of fundamental_ransac.
    """
    n = pts1.shape[0]
    prio = jax.random.uniform(key, (num_hypotheses, n))
    prio = jnp.where(mask[None, :], prio, -1.0)
    _, idx = jax.lax.top_k(prio, 4)

    H_hyp = jax.vmap(homography_dlt)(pts1[idx], pts2[idx])
    errs = jax.vmap(transfer_error, in_axes=(0, None, None))(H_hyp, pts1, pts2)
    thr = 2.0 * threshold * threshold
    inl = (errs < thr) & mask[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    best_inliers = inl[best]
    H_refit = homography_dlt(pts1, pts2, best_inliers.astype(pts1.dtype))
    use_refit = jnp.sum(best_inliers) >= 4
    H = jnp.where(use_refit, H_refit, H_hyp[best])
    return H, best_inliers


def decompose_homography(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras SVD decomposition: 8 candidate (R, t, n) with ||t|| = 1.

    A = K^-1 H K = d R + t n^T up to sign/scale. Follows the standard
    two-case (d' = +-d2) construction; degenerate candidates (equal singular
    values) come out near-identity and simply lose the chirality vote.
    """
    dt = H.dtype
    A = jnp.linalg.inv(K.astype(dt)) @ H @ K.astype(dt)
    from txr.ops.eigsmall import svd3

    U, S, Vt = svd3(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = S[0], S[1], S[2]

    denom = jnp.maximum(d1 * d1 - d3 * d3, _EPS)
    aux1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    aux3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1], dt)
    x3s = jnp.array([aux3, -aux3, aux3, -aux3], dt)

    # Case d' = +d2
    st_aux = (jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                                0.0, None))
              / jnp.maximum((d1 + d3) * d2, _EPS))
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, _EPS)
    stp = jnp.array([st_aux, -st_aux, -st_aux, st_aux], dt)

    def build_pos(x1, x3, st):
        Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]], dt)
        tp = (d1 - d3) * jnp.array([x1, 0.0, -x3], dt)
        npl = jnp.array([x1, 0.0, x3], dt)
        return s * U @ Rp @ Vt, U @ tp, (Vt.T @ npl)

    Rs_p, ts_p, ns_p = jax.vmap(build_pos)(x1s, x3s, stp)

    # Case d' = -d2
    sp_aux = (jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3),
                                0.0, None))
              / jnp.maximum((d1 - d3) * d2, _EPS))
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, _EPS)
    spp = jnp.array([sp_aux, -sp_aux, -sp_aux, sp_aux], dt)

    def build_neg(x1, x3, sp):
        Rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]], dt)
        tp = (d1 + d3) * jnp.array([x1, 0.0, x3], dt)
        npl = jnp.array([x1, 0.0, x3], dt)
        return s * U @ Rp @ Vt, U @ tp, (Vt.T @ npl)

    Rs_n, ts_n, ns_n = jax.vmap(build_neg)(x1s, x3s, spp)

    Rs = jnp.concatenate([Rs_p, Rs_n])            # (8, 3, 3)
    ts = jnp.concatenate([ts_p, ts_n])            # (8, 3)
    ns = jnp.concatenate([ns_p, ns_n])            # (8, 3)
    tn = jnp.linalg.norm(ts, axis=-1, keepdims=True)
    ts = ts / jnp.maximum(tn, _EPS)
    return Rs, ts, ns


@jax.jit
@f32_dots
def recover_pose_homography(H: jnp.ndarray, pts1: jnp.ndarray,
                            pts2: jnp.ndarray, K: jnp.ndarray,
                            mask: jnp.ndarray):
    """Chirality-voted pose from H (same contract as pose.recover_pose)."""
    Rs, ts, _ = decompose_homography(H, K)
    dt = H.dtype
    K = K.astype(dt)
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=dt),
                              jnp.zeros((3, 1), dt)], axis=1)

    def score(R, tv):
        P2 = K @ jnp.concatenate([R, tv[:, None]], axis=1)
        X = triangulate(P1, P2, pts1, pts2)
        z1 = X[:, 2]
        z2 = X @ R[2, :] + tv[2]
        good = (z1 > 0) & (z2 > 0) & jnp.isfinite(z1) & mask
        return jnp.sum(good), good

    counts, goods = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], goods[best]
