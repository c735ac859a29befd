"""Decompose merge_pointclouds cost at config1 scale (~0.9M points, cap 2^20).

Stages: H2D upload, voxel_downsample, grid outlier removal (auto_cell +
grid_knn_mean_distance), compact D2H. Times with loop-N + one terminal sync
per CLAUDE.md TIMING.
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

from txr.core.types import PointSet
from txr.ops.voxel import voxel_downsample
from txr.ops.outlier import remove_statistical_outliers_grid


def timeit(fn, *args, n=6, name=""):
    r = fn(*args)
    jnp.sum(r.xyz if hasattr(r, "xyz") else r).block_until_ready()
    float(jnp.sum(r.xyz if hasattr(r, "xyz") else r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r.xyz if hasattr(r, "xyz") else r))
    tot = (time.perf_counter() - t0) * 1e3
    print(f"{name:28s} ~{(tot - 40.0) / n:8.2f} ms/iter (raw {tot/n:.1f})",
          flush=True)
    return r


def main():
    rng = np.random.default_rng(0)
    n, cap = 900_000, 1 << 20
    # tunnel-like: elongated box 60 x 4 x 4 with surface structure
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n, 0] = rng.uniform(0, 60, n)
    xyz[:n, 1] = rng.uniform(0, 4, n)
    xyz[:n, 2] = (np.sin(xyz[:n, 0]) + rng.normal(0, 0.02, n)).astype(np.float32)
    rgb = np.zeros((cap, 3), np.float32)
    mask = np.arange(cap) < n
    ps = PointSet(jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(mask))

    t0 = time.perf_counter()
    float(jnp.sum(ps.xyz))
    print(f"H2D {xyz.nbytes*2/1e6:.0f} MB: {time.perf_counter()-t0:.2f}s")

    vd = jax.jit(lambda p: voxel_downsample(p, 0.02))
    ps2 = timeit(vd, ps, name="voxel_downsample")
    print("voxels:", int(jnp.sum(ps2.mask)))

    out = jax.jit(lambda p: remove_statistical_outliers_grid(
        p, cell=None, nb_neighbors=20, std_ratio=2.0))
    ps3 = timeit(out, ps2, n=3, name="outlier grid (auto cell)")
    print("kept:", int(jnp.sum(ps3.mask)))


if __name__ == "__main__":
    main()
