"""Two-view pose refinement: Gauss-Newton on the essential manifold.

Minimal-solver poses (8-point essential, homography decomposition) carry
fraction-of-a-degree rotation errors from pixel noise; at small-baseline
parallax (f*B/Z of a few pixels) that bias multiplies straight into
triangulated depth — measured 25-40% depth error on the synthetic golden
scene, where the reference's cv2 5-point + recoverPose lands within ~3%.

This refines (R, t) by Gauss-Newton on the Sampson error of the epipolar
constraint, parameterized minimally: omega in so(3) for R and a 2-D tangent
step for the unit translation. Fixed iteration count, 5x5 normal equations,
everything batched — jit/TPU friendly (lax loop, no data-dependent shapes).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from txr.core.precision import f32_dots

# One shared jacfwd-safe so(3) exponential for the whole geometry stack
# (Taylor branch at w=0); a second local reimplementation was a duplicated
# numerical edge case [code-review r2].
from txr.geometry.icp import _so3_exp as _expm_so3

_EPS = 1e-12


def _skew(v):
    return jnp.array([[0.0, -v[2], v[1]],
                      [v[2], 0.0, -v[0]],
                      [-v[1], v[0], 0.0]], v.dtype)


def _tangent_basis(t):
    """Two unit vectors orthogonal to t (deterministic)."""
    a = jnp.where(jnp.abs(t[0]) < 0.9,
                  jnp.array([1.0, 0.0, 0.0], t.dtype),
                  jnp.array([0.0, 1.0, 0.0], t.dtype))
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.maximum(jnp.linalg.norm(b1), _EPS)
    b2 = jnp.cross(t, b1)
    return b1, b2


def _sampson(E, n1, n2):
    """Signed Sampson residual per correspondence on normalized coords."""
    p1 = jnp.concatenate([n1, jnp.ones_like(n1[:, :1])], axis=1)
    p2 = jnp.concatenate([n2, jnp.ones_like(n2[:, :1])], axis=1)
    Ex1 = p1 @ E.T
    Etx2 = p2 @ E
    num = jnp.sum(p2 * Ex1, axis=-1)
    den = jnp.sqrt(jnp.maximum(
        Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2,
        _EPS))
    return num / den


@partial(jax.jit, static_argnames=("iters",))
@f32_dots
def refine_pose(R0: jnp.ndarray, t0: jnp.ndarray, uv1: jnp.ndarray,
                uv2: jnp.ndarray, K: jnp.ndarray, mask: jnp.ndarray,
                iters: int = 10, damping: float = 1e-6):
    """Gauss-Newton refinement of (R, t) over masked correspondences.

    Returns (R, t) with ||t|| = 1. The objective is masked mean squared
    Sampson error in normalized coordinates; a step is only accepted when it
    reduces the objective, so the result is never worse than the input.
    """
    dt = R0.dtype
    Kinv = jnp.linalg.inv(K.astype(dt))
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=1) @ Kinv.T
    p2 = jnp.concatenate([uv2, jnp.ones_like(uv2[:, :1])], axis=1) @ Kinv.T
    n1 = p1[:, :2] / p1[:, 2:3]
    n2 = p2[:, :2] / p2[:, 2:3]
    m = mask.astype(dt)
    msum = jnp.maximum(jnp.sum(m), 1.0)

    def cost_res(params, R, t):
        w, v = params[:3], params[3:]
        b1, b2 = _tangent_basis(t)
        tn = t + v[0] * b1 + v[1] * b2
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), _EPS)
        Rn = _expm_so3(w) @ R
        E = _skew(tn) @ Rn
        return _sampson(E, n1, n2) * m

    def step(carry, _):
        R, t, c_old = carry                 # carried accepted cost
        z5 = jnp.zeros((5,), dt)
        r = cost_res(z5, R, t)
        J = jax.jacfwd(cost_res)(z5, R, t)          # (N, 5)
        JtJ = J.T @ J + damping * jnp.eye(5, dtype=dt)
        g = J.T @ r
        delta = -jnp.linalg.solve(JtJ, g)
        r_new = cost_res(delta, R, t)
        c_new = jnp.sum(r_new ** 2) / msum
        accept = c_new < c_old
        w, v = delta[:3], delta[3:]
        b1, b2 = _tangent_basis(t)
        tn = t + v[0] * b1 + v[1] * b2
        tn = tn / jnp.maximum(jnp.linalg.norm(tn), _EPS)
        Rn = _expm_so3(w) @ R
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        return (R, t, jnp.where(accept, c_new, c_old)), None

    r0 = cost_res(jnp.zeros((5,), dt), R0, t0)
    c0 = jnp.sum(r0 ** 2) / msum
    (R, t, _), _ = jax.lax.scan(step, (R0, t0, c0), None, length=iters)
    return R, t
