"""lax.sort cost vs operand count at insert scale (13M rows, B24 bench).

Decides whether repacking the offset-map's 5 sort columns (CLAUDE.md
"insert sort 53 ms @ B16/10.4M rows") into 4 (44-bit key + 10-bit offsets +
rgb24 + w12) buys enough to matter. num_keys=2 in all cases (key order is
decided by the first two columns; payload bits in the low bits of column 2
only tie-break within a voxel segment).
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

N = int(os.environ.get("N", str(13_000_000)))


def timeit(fn, args, n=4, name=""):
    r = fn(*args)
    float(jnp.sum(r[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r[0]))
    dt = (time.perf_counter() - t0) / n * 1e3 - 26.0 / n
    print(f"{name:28s} {dt:7.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    cols = [jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int32))
            for _ in range(5)]
    for k in (3, 4, 5):
        f = jax.jit(lambda *c: jax.lax.sort(c, num_keys=2))
        timeit(f, cols[:k], name=f"sort {k} ops (2 keys) @{N/1e6:.1f}M")


if __name__ == "__main__":
    main()
