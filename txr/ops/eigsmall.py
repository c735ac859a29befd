"""Batched tiny symmetric eigensolvers for the RANSAC/triangulation hot path.

`jnp.linalg.eigh`/`svd` on TPU lower to QDWH-class algorithms built around
`lax.while_loop`s and full-tile matmuls — correct at LAPACK scale, but the
geometry stack calls them at the OPPOSITE corner: thousands of independent
9x9 / 4x4 / 3x3 problems per RANSAC (essential/homography hypothesis null
vectors, per-point DLT triangulation; see txr/geometry/epipolar.py,
triangulate.py). There the while-loop latency and tile padding dominate by
orders of magnitude.

This module implements fixed-sweep cyclic Jacobi diagonalization: for small
static d, a compile-time-unrolled sequence of d*(d-1)/2 plane rotations per
sweep, each touching two rows + two columns (static-index dynamic-slices, no
scatter, no while loops, fully batchable over any leading axes). Cyclic
Jacobi converges quadratically; SWEEPS=6 reaches ~f32 machine precision for
d<=9 (pinned against numpy in tests/test_eigsmall.py).

Reference equivalence: the reference relies on cv2/numpy SVD for the same
solves (e.g. depth_to_reconstruction.py:183-271 pose/triangulation); only
the factorization algorithm differs, not the math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from txr.core.precision import f32_dots

_SWEEPS = 6


def _rotate(A, V, p: int, q: int):
    """One batched Jacobi rotation zeroing A[..., p, q] (p < q static)."""
    app = A[..., p, p]
    aqq = A[..., q, q]
    apq = A[..., p, q]
    # tan(2θ) = 2 a_pq / (a_qq - a_pp); stable single-rotation form.
    small = jnp.abs(apq) <= 1e-30 * (jnp.abs(app) + jnp.abs(aqq) + 1e-30)
    tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
    # Zero-safe sign: jnp.sign(0) == 0 would skip the rotation entirely when
    # a_pp == a_qq exactly with a_pq != 0 (reachable from structured data —
    # regular grids, synthetic scenes), silently returning wrong eigenpairs.
    # tau == 0 must rotate with t = 1 (the standard 45-degree rotation).
    sgn = jnp.where(tau >= 0.0, 1.0, -1.0)
    t = sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
    t = jnp.where(small, 0.0, t)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = t * c
    cc, ss = c[..., None], s[..., None]

    # Rows p,q of A (A J on the right is the column update; J^T A on rows).
    rp, rq = A[..., p, :], A[..., q, :]
    A = A.at[..., p, :].set(cc * rp - ss * rq)
    A = A.at[..., q, :].set(ss * rp + cc * rq)
    cp, cq = A[..., :, p], A[..., :, q]
    A = A.at[..., :, p].set(cc * cp - ss * cq)
    A = A.at[..., :, q].set(ss * cp + cc * cq)
    vp, vq = V[..., :, p], V[..., :, q]
    V = V.at[..., :, p].set(cc * vp - ss * vq)
    V = V.at[..., :, q].set(ss * vp + cc * vq)
    return A, V


@f32_dots
def eigh_jacobi(M: jnp.ndarray, sweeps: int = _SWEEPS):
    """Eigendecomposition of symmetric M (..., d, d), d small and static.

    Returns (w, V) with M V = V diag(w); w UNSORTED (use argmin/argmax).
    Matches jnp.linalg.eigh up to column order/sign at f32 precision.

    The sweep loop runs under lax.scan so the traced program stays
    `sweeps`-fold smaller than a full Python unroll — the unrolled form
    cost ~41 s of tracing + multi-second persistent-cache deserialization
    per geometry program on the 1-CPU test box and minutes of remote TPU
    compile (measured round 5)."""
    d = M.shape[-1]
    A = M.astype(jnp.float32)
    V = jnp.broadcast_to(jnp.eye(d, dtype=jnp.float32), A.shape)
    V = V + jnp.zeros_like(A)  # materialize per-batch identity

    # One SWEEP stays statically unrolled (static p,q slices fuse well on
    # the VPU); the scan only runs over the 6 sweeps. Scanning over every
    # rotation with dynamic p,q measured slower on-device (216 tiny
    # sequential dynamic-slice iterations are latency-bound at RANSAC
    # batch sizes), while this form keeps both wins: jaxpr ~sweeps-fold
    # smaller than the full unroll AND unrolled-speed device code.
    def sweep(carry, _):
        A, V = carry
        for p in range(d - 1):
            for q in range(p + 1, d):
                A, V = _rotate(A, V, p, q)
        return (A, V), None

    (A, V), _ = lax.scan(sweep, (A, V), None, length=sweeps)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    return w, V


@f32_dots
def smallest_eigvec(M: jnp.ndarray, sweeps: int = _SWEEPS) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue of symmetric M (..., d, d).

    Drop-in for `jnp.linalg.eigh(M)[1][..., 0]` on PSD design-matrix normals
    (A^T A) — the RANSAC null-vector solve.
    """
    w, V = eigh_jacobi(M, sweeps)
    idx = jnp.argmin(w, axis=-1)
    return jnp.take_along_axis(V, idx[..., None, None], axis=-1)[..., 0]


@f32_dots
def svd3(F: jnp.ndarray, sweeps: int = _SWEEPS):
    """SVD of (..., 3, 3) via two-sided Jacobi eigensolves.

    Returns (U, s, Vt) with F = U diag(s) Vt, s sorted DESCENDING, s >= 0,
    U/V proper orthogonal up to per-column signs (U chosen so U diag(s) Vt
    reconstructs F; the (1,1,0) essential-matrix projection U diag(1,1,0) Vt
    is invariant to the remaining sign ambiguity paired across U/V).
    """
    Ft = jnp.swapaxes(F, -1, -2)
    w, V = eigh_jacobi(Ft @ F, sweeps)          # F^T F = V diag(s^2) V^T
    order = jnp.argsort(-w, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    s2 = jnp.take_along_axis(w, order, axis=-1)
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    FV = F @ V
    # U columns: u_i = F v_i / s_i for the two largest; u_2 ALWAYS from the
    # cross product (sign-matched to F v_2). Dividing by s_2 is a trap: an
    # essential-manifold F has s_2 = 0 exactly, and f32 Jacobi reports
    # s_2 ~ 1e-4·s_0 — large enough to look "safe" but the quotient is pure
    # rounding noise in a random direction (cost a 60° pose error before the
    # cross-product rule).

    def _unit(v):
        return v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)

    u0 = _unit(FV[..., :, 0])
    u1 = FV[..., :, 1] - jnp.sum(FV[..., :, 1] * u0, -1, keepdims=True) * u0
    u1 = _unit(u1)
    u2 = jnp.cross(u0, u1, axis=-1)
    sgn = jnp.sum(FV[..., :, 2] * u2, -1, keepdims=True)
    u2 = u2 * jnp.where(sgn < 0.0, -1.0, 1.0)
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)


def inv3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of (..., 3, 3) — batched, no LU.

    `jnp.linalg.inv` lowers to LU custom calls; at RANSAC batch sizes the
    tiny-problem overhead dominates. No singularity guard: callers pass
    normalization affines / accepted homographies (invertible by
    construction), matching jnp.linalg.inv's behavior on singular input
    (non-finite entries).
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
        jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]
