#!/usr/bin/env python3
"""Stage-level TPU probe for the pair_step / SIFT device cost (VERDICT r2 #2).

BENCH_CONFIGS attributes 652 ms/frame to the fusion CLI's pairs program and
509 ms/frame to batched SIFT at 640x480 on a v5e — orders above any FLOP
estimate. This probe times each candidate sub-stage as its own jitted
program (CLAUDE.md TIMING: >=N dispatches + ONE terminal sync, minus the
measured floor; per-dispatch ~10-15 ms class means small ops read as
dispatch rate — fine for triage).

Suspects: vmapped jnp.linalg.eigh(9x9) x1024 (essential/homography RANSAC
hypothesis solves), svd(3x3) x1024 (E projection), per-point eigh(4x4)
x4096 (DLT triangulation) — batched tiny eigendecompositions lower to
QDWH/Jacobi while-loops on padded tiles on TPU.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def floor_ms(n=8):
    one = jnp.ones((8,), jnp.float32)
    float(jnp.sum(one))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(one))
    return (time.perf_counter() - t0) / n * 1000.0


def timeit(name, fn, args, n=10):
    out = fn(*args)  # compile
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    fl = floor_ms()
    t0 = time.perf_counter()
    outs = []
    for _ in range(n):
        outs.append(fn(*args))
    leaves = [x for x in jax.tree_util.tree_leaves(outs[-1])
              if hasattr(x, "dtype")]
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    ms = ((time.perf_counter() - t0) * 1000.0 - fl) / n
    log(f"{name:34s} {ms:9.2f} ms  (floor {fl:.1f})")
    return ms


def main():
    from txr.geometry.epipolar import essential_ransac
    from txr.geometry.homography import homography_ransac
    from txr.geometry.pose import recover_pose
    from txr.geometry.triangulate import triangulate
    from txr.ops.matching import match_l2_ratio
    from txr.ops.sift import sift_features
    from txr.pipelines.fusion_pipeline import pair_step

    rng = np.random.default_rng(0)
    N = 4096
    K = jnp.asarray([[525.0, 0, 320], [0, 525.0, 240], [0, 0, 1]],
                    jnp.float32)
    # Synthetic correspondences: random 3D points seen from two poses.
    X = rng.uniform([-2, -2, 2], [2, 2, 8], (N, 3)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.2, 0.0, 0.0], np.float32)
    Kn = np.asarray(K)

    def proj(X, R, t):
        Xc = X @ R.T + t
        uv = Xc @ Kn.T
        return (uv[:, :2] / uv[:, 2:3]).astype(np.float32)

    uv1 = jnp.asarray(proj(X, np.eye(3, dtype=np.float32), np.zeros(3)))
    uv2 = jnp.asarray(proj(X, R, t))
    mask = jnp.ones((N,), bool)
    desc1 = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    desc2 = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    log(f"devices: {jax.devices()}")

    timeit("match_l2_ratio (4096x4096x128)",
           jax.jit(lambda a, b, m1, m2: match_l2_ratio.__wrapped__(
               a, b, m1, m2, 0.75)), (desc1, desc2, mask, mask))

    timeit("essential_ransac 1024hyp",
           jax.jit(lambda a, b, m, k: essential_ransac(a, b, m, K, k,
                                                       2.0, 1024)),
           (uv1, uv2, mask, key))

    timeit("homography_ransac 1024hyp",
           jax.jit(lambda a, b, m, k: homography_ransac(a, b, m, k,
                                                        3.0, 1024)),
           (uv1, uv2, mask, key))

    # Sub-pieces of the hypothesis solve, isolated at batch 1024:
    A9 = jnp.asarray(rng.normal(size=(1024, 9, 9)).astype(np.float32))
    A9 = A9 @ jnp.swapaxes(A9, 1, 2)
    timeit("vmapped eigh(9x9) x1024",
           jax.jit(lambda a: jnp.linalg.eigh(a)[1]), (A9,))
    E3 = jnp.asarray(rng.normal(size=(1024, 3, 3)).astype(np.float32))
    timeit("vmapped svd(3x3) x1024",
           jax.jit(lambda a: jnp.linalg.svd(a)[0]), (E3,))
    A4 = jnp.asarray(rng.normal(size=(N, 4, 4)).astype(np.float32))
    A4 = A4 @ jnp.swapaxes(A4, 1, 2)
    timeit("vmapped eigh(4x4) x4096",
           jax.jit(lambda a: jnp.linalg.eigh(a)[1]), (A4,))

    E = jnp.asarray(np.float32(np.cross(np.eye(3), t)[None] @ R))[0]
    timeit("recover_pose (incl. triangulate)",
           jax.jit(lambda e, a, b, m: recover_pose(e, a, b, K, m)),
           (E, uv1, uv2, mask))

    timeit("pair_step full",
           jax.jit(lambda a, b, m, k: pair_step.__wrapped__(
               a, b, m, K, k, 2.0, 0.1, 500.0)),
           (uv1, uv2, mask, key))

    g1 = jnp.asarray(rng.integers(0, 256, (480, 640), np.uint8))
    timeit("sift_features 640x480 cap4096",
           jax.jit(lambda g: sift_features(g, capacity=4096)), (g1,))
    gb = jnp.asarray(rng.integers(0, 256, (8, 480, 640), np.uint8))
    timeit("sift batch8 (vmap) 640x480",
           jax.jit(lambda g: jax.vmap(
               lambda x: sift_features(x, capacity=4096))(g)), (gb,))


if __name__ == "__main__":
    main()
