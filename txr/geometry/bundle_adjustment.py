"""Bundle adjustment — the capability the reference declares but never ships.

The reference imports GTSAM behind a flag and logs "bundle adjustment
disabled" (depth_enhanced_reconstruction.py:45-50); no BA ever runs. This
module provides it TPU-natively as **alternating Gauss-Newton**
(resection–intersection):

  - point step: every 3D point refines independently given the poses —
    a (3,3) normal-equation solve per point, vmapped;
  - camera step: every camera refines independently given the points —
    a (6,6) solve per camera (axis-angle ⊕ translation), vmapped;
  - Huber-weighted reprojection residuals; camera 0 is the gauge and stays
    fixed.

Everything is fixed-capacity and masked: observations are (K,) index arrays
with a validity mask, per-point/per-camera accumulation uses segment sums
(small K — scatter cost is negligible here), and iterations are a static
Python loop under one jit. Alternation converges slower than a sparse-Schur
LM on huge problems, but for the incremental pipelines' scale (tens of
cameras, thousands of points) it reaches the same optimum and maps perfectly
onto vmap.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots

from txr.geometry.icp import _so3_exp


class BAProblem(NamedTuple):
    """Fixed-capacity bundle-adjustment problem.

    rotations: (C, 3, 3) world→camera; translations: (C, 3).
    points: (M, 3) world points; point_mask: (M,).
    obs_cam / obs_point: (K,) int32 indices; obs_uv: (K, 2); obs_mask: (K,).
    """

    rotations: jnp.ndarray
    translations: jnp.ndarray
    points: jnp.ndarray
    point_mask: jnp.ndarray
    obs_cam: jnp.ndarray
    obs_point: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_mask: jnp.ndarray


def _project(K, R, t, X):
    """World point → pixel. Returns (uv (2,), z)."""
    Xc = R @ X + t
    z = Xc[2]
    uv = (K @ Xc)[:2] / jnp.where(jnp.abs(z) > 1e-9, z, 1.0)
    return uv, z


def _residual_one(K, R, t, X, uv_obs):
    uv, z = _project(K, R, t, X)
    r = uv - uv_obs
    return r, z


def _huber_weight(r, delta):
    n = jnp.linalg.norm(r) + 1e-12
    return jnp.minimum(1.0, delta / n)


@partial(jax.jit, static_argnames=("iterations",))
@f32_dots
def bundle_adjust(problem: BAProblem, K: jnp.ndarray, iterations: int = 10,
                  damping: float = 1e-3, huber_delta: float = 4.0):
    """Refine poses and points by alternating GN. Returns
    (rotations, translations, points, rms_history (iterations+1,))."""
    K = K.astype(jnp.float32)
    C = problem.rotations.shape[0]
    M = problem.points.shape[0]
    w_obs = problem.obs_mask.astype(jnp.float32)

    def rms(R, t, X):
        def one(ci, pi, uv, w):
            r, z = _residual_one(K, R[ci], t[ci], X[pi], uv)
            ok = w * (z > 1e-6)
            return jnp.sum(r * r) * ok, ok

        sq, ok = jax.vmap(one)(problem.obs_cam, problem.obs_point,
                               problem.obs_uv, w_obs)
        return jnp.sqrt(jnp.sum(sq) / jnp.maximum(jnp.sum(ok) * 2.0, 1.0))

    def point_step(R, t, X):
        """vmapped 3x3 GN per point (poses fixed)."""

        def obs_terms(ci, pi, uv, w):
            def res(Xj):
                r, z = _residual_one(K, R[ci], t[ci], Xj, uv)
                return r

            Xj = X[pi]
            r = res(Xj)
            J = jax.jacfwd(res)(Xj)                       # (2, 3)
            # behind-camera observations (z<=0: sign-flipped projection,
            # huge spurious residual) must not steer the step — rms() below
            # already excludes them, and optimizing what the monitor hides
            # let BA 'converge' while dragging points the wrong way
            _, z = _residual_one(K, R[ci], t[ci], Xj, uv)
            hw = w * _huber_weight(r, huber_delta) * (z > 1e-6)
            return J.T @ J * hw, J.T @ r * hw             # (3,3), (3,)

        JtJ, Jtr = jax.vmap(obs_terms)(problem.obs_cam, problem.obs_point,
                                       problem.obs_uv, w_obs)
        H = jax.ops.segment_sum(JtJ, problem.obs_point, num_segments=M)
        g = jax.ops.segment_sum(Jtr, problem.obs_point, num_segments=M)
        H = H + damping * jnp.eye(3)[None]
        delta = jnp.linalg.solve(H, -g[..., None])[..., 0]  # (M, 3)
        delta = jnp.where(problem.point_mask[:, None], delta, 0.0)
        return X + delta

    def camera_step(R, t, X):
        """vmapped 6x6 GN per camera (points fixed); camera 0 is the gauge."""

        def obs_terms(ci, pi, uv, w):
            def res(theta):
                dR = _so3_exp(theta[:3])
                r, z = _residual_one(K, dR @ R[ci], dR @ t[ci] + theta[3:],
                                     X[pi], uv)
                return r

            theta0 = jnp.zeros(6, jnp.float32)
            r = res(theta0)
            J = jax.jacfwd(res)(theta0)                   # (2, 6)
            _, z = _residual_one(K, R[ci], t[ci], X[pi], uv)
            hw = w * _huber_weight(r, huber_delta) * (z > 1e-6)
            return J.T @ J * hw, J.T @ r * hw             # (6,6), (6,)

        JtJ, Jtr = jax.vmap(obs_terms)(problem.obs_cam, problem.obs_point,
                                       problem.obs_uv, w_obs)
        H = jax.ops.segment_sum(JtJ, problem.obs_cam, num_segments=C)
        g = jax.ops.segment_sum(Jtr, problem.obs_cam, num_segments=C)
        H = H + damping * jnp.eye(6)[None]
        delta = jnp.linalg.solve(H, -g[..., None])[..., 0]  # (C, 6)
        delta = delta.at[0].set(0.0)  # gauge: camera 0 fixed

        dR = jax.vmap(_so3_exp)(delta[:, :3])
        R_new = jnp.einsum("cij,cjk->cik", dR, R)
        t_new = jnp.einsum("cij,cj->ci", dR, t) + delta[:, 3:]
        return R_new, t_new

    R = problem.rotations.astype(jnp.float32)
    t = problem.translations.astype(jnp.float32)
    X = problem.points.astype(jnp.float32)
    history = [rms(R, t, X)]
    for _ in range(iterations):
        X = point_step(R, t, X)
        R, t = camera_step(R, t, X)
        history.append(rms(R, t, X))
    return R, t, X, jnp.stack(history)


def build_problem(poses, points, observations, max_obs: int | None = None
                  ) -> BAProblem:
    """Assemble a BAProblem from host-side lists.

    poses: list of (R (3,3), t (3,)) world→camera.
    points: (M, 3) array.
    observations: list of (cam_idx, point_idx, (u, v)).
    """
    import numpy as np

    C = len(poses)
    Rs = np.stack([np.asarray(R, np.float32) for R, _ in poses])
    ts = np.stack([np.asarray(t, np.float32).reshape(3) for _, t in poses])
    X = np.asarray(points, np.float32)
    K_obs = len(observations)
    cap = max_obs if max_obs is not None else K_obs
    oc = np.zeros(cap, np.int32)
    op = np.zeros(cap, np.int32)
    uv = np.zeros((cap, 2), np.float32)
    om = np.zeros(cap, bool)
    for i, (ci, pi, p) in enumerate(observations[:cap]):
        oc[i], op[i] = ci, pi
        uv[i] = p
        om[i] = True
    return BAProblem(
        rotations=jnp.asarray(Rs), translations=jnp.asarray(ts),
        points=jnp.asarray(X), point_mask=jnp.ones(len(X), bool),
        obs_cam=jnp.asarray(oc), obs_point=jnp.asarray(op),
        obs_uv=jnp.asarray(uv), obs_mask=jnp.asarray(om),
    )
