#!/usr/bin/env python3
"""Cumsum strategy micro-bench at insert scale (10.4M x 7 f32)."""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from txr.fusion.packed_map import _hier_cumsum
from txr.ops.scan import matmul_cumsum


def sync(x):
    return float(jnp.sum(x[-1]))


def main():
    n = (1 << 21) + 16 * 518400
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.uniform(0, 1, (n, 7)).astype(np.float32))

    mm_def = jax.jit(partial(matmul_cumsum, radix=512))
    mm_256 = jax.jit(partial(matmul_cumsum, radix=256))
    mm_1024 = jax.jit(partial(matmul_cumsum, radix=1024))
    hier = jax.jit(_hier_cumsum)

    outs = {}
    for name, fn in [("hier_cumsum (current)", hier),
                     ("matmul_cumsum r512", mm_def),
                     ("matmul_cumsum r256", mm_256),
                     ("matmul_cumsum r1024", mm_1024)]:
        o = fn(x)
        sync(o)
        outs[name] = o[-1]
        t0 = time.perf_counter()
        for _ in range(8):
            o = fn(x)
        sync(o)
        dt = (time.perf_counter() - t0) / 8 * 1000
        print(f"{name:28s} {dt:7.2f} ms")
    ref = outs["hier_cumsum (current)"]
    for name, v in outs.items():
        err = float(jnp.max(jnp.abs(v - ref) / jnp.abs(ref)))
        print(f"{name:28s} tail rel-diff vs hier: {err:.2e}")


if __name__ == "__main__":
    main()
