#!/usr/bin/env python3
"""Insert micro-bench: offset_map (the canonical 4-operand map) at bench
scale (cap 2^21 + 16 frames x 518k points = 10.4M rows). Historical: the
7-operand packed_map ancestor measured ~15% slower before its deletion
(VERDICT r2 #8)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from txr.core.types import PointSet
from txr.fusion.offset_map import (create_offset_map, offset_map_insert,
                                   offset_map_size)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    n = 16 * 518400
    cap = 1 << 21
    rng = np.random.default_rng(0)
    # surface-ish point distribution at bench-like density
    xyz = rng.normal(0, 2.0, (n, 3)).astype(np.float32)
    xyz[:, 2] = np.abs(xyz[:, 2]) + 0.5
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pts = PointSet(jax.device_put(jnp.asarray(xyz)),
                   jax.device_put(jnp.asarray(rgb)),
                   jnp.ones((n,), bool))

    reps = 6
    for name, create, insert, size in [
            ("offset_map (4 ops)", create_offset_map, offset_map_insert,
             offset_map_size)]:
        vm = create(cap, 0.01)
        vm = insert(vm, pts)
        sync(vm.khi)
        t0 = time.perf_counter()
        for _ in range(reps):
            vm = insert(vm, pts)
        sync(vm.khi)
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:24s} {dt:7.2f} ms/insert   voxels={int(size(vm))}")


if __name__ == "__main__":
    main()
