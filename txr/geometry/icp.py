"""Point-to-plane ICP as a fixed-iteration XLA op.

Named a first-class kernel by the north star (BASELINE.json): the reference
gets frame-to-frame registration from RTAB-Map's C++ odometry
(slam.launch.py:105-123); the streaming reconstruction mode rebuilds it here.

Formulation: fixed `iterations` Gauss-Newton steps inside lax.fori_loop.
Correspondences are nearest-neighbor via chunked MXU distance matmuls against
a (masked, fixed-capacity) target cloud with precomputed normals; pairs beyond
`max_correspondence` are weight-zeroed. The 6x6 normal system solves in f32
with Cholesky. Everything is static-shape: no early exit, convergence handled
by the residual weights going stable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots

# Python float, NOT np.float32: np-scalar module constants become device
# ArrayImpls under jax 0.9 (globally cached), get captured as lifted
# consts in later traces, and the C++ jit fastpath then drops them on
# repeat same-structure calls ("Execution supplied N buffers but
# compiled program expected N+1"). A Python float stays a jaxpr literal.
_BIG = 3.0e38


def _so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (3,) axis-angle → (3,3) rotation.

    Written smooth at w = 0 (Taylor branch + guarded denominators) so it is
    safe under jacfwd — bundle adjustment differentiates through this at
    exactly zero, where d||w||/dw is undefined in the naive form.
    """
    t2 = jnp.sum(w * w)
    t = jnp.sqrt(t2 + 1e-24)
    A = jnp.where(t2 > 1e-8, jnp.sin(t) / t, 1.0 - t2 / 6.0)
    B = jnp.where(t2 > 1e-8, (1.0 - jnp.cos(t)) / (t2 + 1e-24), 0.5 - t2 / 24.0)
    K = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ], w.dtype)
    return jnp.eye(3, dtype=w.dtype) + A * K + B * (K @ K)


@partial(jax.jit, static_argnames=("k",))
@f32_dots
def estimate_normals(xyz: jnp.ndarray, mask: jnp.ndarray, k: int = 8) -> jnp.ndarray:
    """Per-point normals from the k-NN covariance's smallest eigenvector.

    Exact kNN via a dense distance matrix — intended for map sizes up to a
    few 10^4 points (keyframe maps); larger maps should pre-voxelize.
    """
    n = xyz.shape[0]
    sq = jnp.sum(xyz * xyz, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        xyz, xyz.T, preferred_element_type=jnp.float32)
    d2 = jnp.where(mask[None, :], d2, _BIG)
    d2 = jnp.where(jnp.eye(n, dtype=bool), 0.0, d2)  # include self
    _, idx = jax.lax.top_k(-d2, k)                   # (n, k)
    nbrs = xyz[idx]                                  # (n, k, 3)
    mean = jnp.mean(nbrs, axis=1, keepdims=True)
    c = nbrs - mean
    cov = jnp.einsum("nki,nkj->nij", c, c) / k
    # Batched tiny 3x3 eigensolve: fixed-sweep Jacobi (txr/ops/eigsmall.py)
    # instead of eigh's while-loop lowering — this runs over the full ICP
    # target sample every streaming batch.
    from txr.ops.eigsmall import smallest_eigvec

    normals = smallest_eigvec(cov)
    return jnp.where(mask[:, None], normals, 0.0)


@partial(jax.jit, static_argnames=("iterations", "chunk"))
@f32_dots
def icp_point_to_plane(
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_normals: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    R_init: jnp.ndarray,
    t_init: jnp.ndarray,
    iterations: int = 10,
    max_correspondence: float = 0.1,
    chunk: int = 1024,
):
    """Register src onto tgt. Returns (R, t, rmse, inlier_frac) with
    x_tgt ≈ R @ x_src + t."""
    nt = tgt_xyz.shape[0]
    ns = src_xyz.shape[0]
    pad = (-ns) % chunk
    src_p = jnp.pad(src_xyz, ((0, pad), (0, 0)))
    srcm_p = jnp.pad(src_mask, (0, pad))
    tsq = jnp.sum(tgt_xyz * tgt_xyz, axis=-1)
    inv_t = jnp.where(tgt_mask, 0.0, _BIG)
    max_d2 = max_correspondence * max_correspondence

    def nn_chunk(pts):
        """Nearest target index for a chunk of transformed source points."""
        psq = jnp.sum(pts * pts, axis=-1)
        d2 = psq[:, None] + tsq[None, :] - 2.0 * jnp.dot(
            pts, tgt_xyz.T, preferred_element_type=jnp.float32)
        d2 = d2 + inv_t[None, :]
        neg, idx = jax.lax.top_k(-d2, 1)
        return idx[:, 0], -neg[:, 0]

    num_chunks = (ns + pad) // chunk

    def nn_all(moved):
        """Chunked nearest-target lookup for every (padded) source point —
        shared by the GN loop and the final statistics so the two can never
        desynchronize."""

        def do_chunk(i):
            pts = jax.lax.dynamic_slice_in_dim(moved, i * chunk, chunk)
            return nn_chunk(pts)

        idxs, d2s = jax.lax.map(do_chunk, jnp.arange(num_chunks))
        return idxs.reshape(-1), d2s.reshape(-1)

    def step(_, carry):
        R, t = carry
        moved = src_p @ R.T + t  # (ns+pad, 3)
        idx, d2 = nn_all(moved)

        q = tgt_xyz[idx]           # (N, 3) matched target points
        nrm = tgt_normals[idx]     # (N, 3)
        w = (srcm_p & (d2 < max_d2)).astype(jnp.float32)

        p = moved
        r = jnp.sum((p - q) * nrm, axis=-1)            # point-to-plane residual
        J = jnp.concatenate([jnp.cross(p, nrm), nrm], axis=-1)  # (N, 6)
        Jw = J * w[:, None]
        H = Jw.T @ J + 1e-6 * jnp.eye(6, dtype=J.dtype)
        g = Jw.T @ r
        delta = -jnp.linalg.solve(H, g)                # (6,) [omega, v]
        dR = _so3_exp(delta[:3])
        R_new = dR @ R
        t_new = dR @ t + delta[3:]
        return (R_new, t_new)

    R, t = jax.lax.fori_loop(0, iterations, step,
                             (R_init.astype(jnp.float32),
                              t_init.astype(jnp.float32)))

    # Final residual statistics.
    moved = src_p @ R.T + t
    _, d2 = nn_all(moved)
    ok = srcm_p & (d2 < max_d2)
    cnt = jnp.maximum(jnp.sum(ok), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(ok, d2, 0.0)) / cnt)
    frac = cnt / jnp.maximum(jnp.sum(srcm_p), 1)
    return R, t, rmse, frac
