#!/usr/bin/env python3
"""Cost of the insert-compaction gather and its restructuring options.

The offset-map insert spends ~118 ms/batch in `csum[perm_c]` + two key
gathers + epilogue (tools/bench_insert_stages.py). Candidates:
  g1   : one (2M,) single-column gather from 10.4M rows
  g7   : (2M, 7) row gather from an interleaved (10.4M, 7) f32 table
  g9   : one (2M, 9) row gather from [csum7 | bitcast khi | bitcast klo]
  g7+2 : the current shape — (2M,7) row gather + 2 single-col i32 gathers
  cummax7: XLA cummax over (10.4M, 7) f32 — the scan that would replace the
         compacted prev-end trick if we moved the epilogue to full length
Indices ascending (top_k output order), as in the real insert.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=10, name=""):
    r = fn(*args)
    sync(r if not isinstance(r, tuple) else r[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r if not isinstance(r, tuple) else r[0])
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:14s} {dt:8.2f} ms")
    return dt


def main():
    n, k = 16 * 518400 + (1 << 21), 1 << 21
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(n, 7)).astype(np.float32))
    khi = jnp.asarray(rng.integers(0, 1 << 30, (n,), dtype=np.int32))
    klo = jnp.asarray(rng.integers(0, 1 << 30, (n,), dtype=np.int32))
    idx = jnp.asarray(np.sort(rng.choice(n, k, replace=False)).astype(np.int32))

    timeit(jax.jit(lambda t, i: t[:, 0][i]), tab, idx, name="g1")
    timeit(jax.jit(lambda t, i: t[i]), tab, idx, name="g7")

    @jax.jit
    def g9(t, a, b, i):
        full = jnp.concatenate(
            [t, jax.lax.bitcast_convert_type(a, jnp.float32)[:, None],
             jax.lax.bitcast_convert_type(b, jnp.float32)[:, None]], axis=1)
        return full[i]

    timeit(g9, tab, khi, klo, idx, name="g9+concat")

    @jax.jit
    def g7p2(t, a, b, i):
        return t[i], a[i], b[i]

    timeit(g7p2, tab, khi, klo, idx, name="g7+2x1")

    timeit(jax.jit(lambda t: jax.lax.cummax(t, axis=0)), tab, name="cummax7")


if __name__ == "__main__":
    main()
