"""Bench + parity: Pallas segmented scan vs matmul_cumsum at insert scale.

The offset-map insert needs per-segment sums. matmul_cumsum (global prefix +
adjacent differences) has error growing with TOTAL accumulated map weight
(ADVICE r1); the segmented scan's error scales with each segment's own sum.
This tool checks the Pallas kernel compiles on axon at bench scale (2-D grid)
and times both at 10.4M x 7.
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

from txr.ops.scan import matmul_cumsum, segmented_cumsum_cols

N = 10_400_000
D = 7
SEGS = 2_000_000


def main():
    rng = np.random.default_rng(0)
    cols_np = rng.random((D, N), np.float32)
    # Segment starts: ~2M segments over 10.4M sorted rows.
    starts_np = np.zeros(N, bool)
    starts_np[0] = True
    starts_np[rng.choice(N, SEGS, replace=False)] = True
    print(f"rows={N} cols={D} segments={starts_np.sum()}", file=sys.stderr)

    cols = tuple(jnp.asarray(cols_np[i]) for i in range(D))
    stacked = jnp.asarray(cols_np.T.copy())
    starts = jnp.asarray(starts_np)

    mm = jax.jit(matmul_cumsum)
    seg = jax.jit(lambda c, s: segmented_cumsum_cols(c, s))

    t0 = time.time()
    out_mm = mm(stacked)
    _ = float(jnp.sum(out_mm[:, 0]))
    print(f"matmul_cumsum compile+run: {time.time()-t0:.1f}s", file=sys.stderr)
    t0 = time.time()
    out_seg = seg(cols, starts)
    _ = float(jnp.sum(out_seg[0]))
    print(f"segscan compile+run: {time.time()-t0:.1f}s", file=sys.stderr)

    for name, fn, args, red in [
        ("matmul_cumsum", mm, (stacked,), lambda o: o[:, 0]),
        ("segscan", seg, (cols, starts), lambda o: o[0]),
    ]:
        # warm
        _ = float(jnp.sum(red(fn(*args))))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            _ = float(jnp.sum(red(fn(*args))))
        dt = (time.time() - t0) / reps * 1000
        print(f"{name}: {dt:.1f} ms (incl ~26ms sync)", file=sys.stderr)

    # Parity at segment ends vs float64 oracle, first 200k rows.
    M = 200_000
    seg_np = np.asarray(jax.device_get(out_seg[0][:M]), np.float64)
    oracle = np.zeros(M)
    acc = 0.0
    for i in range(M):
        if starts_np[i]:
            acc = 0.0
        acc += float(cols_np[0, i])
        oracle[i] = acc
    err = np.abs(seg_np - oracle).max()
    print(f"segscan max abs err vs f64 oracle (first {M}): {err:.3e}",
          file=sys.stderr)
    assert err < 1e-3, err
    print("OK", file=sys.stderr)


if __name__ == "__main__":
    main()
