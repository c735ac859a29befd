"""Chamfer distance between point clouds — the fidelity metric.

BASELINE.json's north star requires fused PLYs within 1e-3 chamfer of the
reference output. Computed as the symmetric mean nearest-neighbor distance,
with the distance matrix evaluated in MXU-friendly chunks (same formulation
as txr.ops.outlier).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def _one_sided(a: jnp.ndarray, b: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """mean_i min_j ||a_i - b_j||  (a: (N,3) padded, b: (M,3) padded)."""
    n = a.shape[0]
    pad = (-n) % chunk
    ap = jnp.pad(a, ((0, pad), (0, 0)))
    bsq = jnp.sum(b * b, axis=-1)

    def body(_, i):
        q = jax.lax.dynamic_slice_in_dim(ap, i * chunk, chunk)
        qsq = jnp.sum(q * q, axis=-1)
        # Pass 1: approximate argmin via the MXU formulation (the
        # |a|^2+|b|^2-2ab expansion cancels catastrophically in f32 at large
        # coordinates — fine for ranking, not for the value).
        d2 = qsq[:, None] + bsq[None, :] - 2.0 * jnp.dot(
            q, b.T, preferred_element_type=jnp.float32)
        idx = jnp.argmin(d2, axis=-1)
        # Pass 2: exact distance to the selected neighbor by direct
        # subtraction (no cancellation).
        nn = b[idx]
        return None, jnp.linalg.norm(q - nn, axis=-1)

    _, out = jax.lax.scan(body, None, jnp.arange((n + pad) // chunk))
    return jnp.mean(out.reshape(-1)[:n])


def chamfer_distance(a: np.ndarray, b: np.ndarray,
                     max_points: int = 200_000, seed: int = 0) -> float:
    """Symmetric chamfer distance between two (N,3)/(M,3) clouds.

    Clouds larger than max_points are subsampled deterministically (the
    estimate converges well below 1e-4 at 200k samples for typical scenes).
    """
    rng = np.random.default_rng(seed)
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if len(a) == 0 or len(b) == 0:
        return float("inf")
    if len(a) > max_points:
        a = a[rng.choice(len(a), max_points, replace=False)]
    if len(b) > max_points:
        b = b[rng.choice(len(b), max_points, replace=False)]
    d_ab = float(_one_sided(jnp.asarray(a), jnp.asarray(b)))
    d_ba = float(_one_sided(jnp.asarray(b), jnp.asarray(a)))
    return 0.5 * (d_ab + d_ba)


def chamfer_between_plys(path_a: str, path_b: str, **kw) -> float:
    from txr.io.ply import read_ply

    xa, _ = read_ply(path_a)
    xb, _ = read_ply(path_b)
    return chamfer_distance(xa, xb, **kw)


if __name__ == "__main__":  # python -m txr.utils.chamfer a.ply b.ply
    import sys

    d = chamfer_between_plys(sys.argv[1], sys.argv[2])
    print(f"chamfer: {d:.6f}")
