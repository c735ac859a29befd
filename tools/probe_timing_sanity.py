"""Timing-harness sanity check on the axon relay.

probe_conv1.py measured 6 reps of a 7.5ms-FLOP-floor conv in 18.5 ms wall —
physically impossible if all 6 executed. Hypotheses: the relay prunes or
memoizes repeated identical computations whose results are never fetched.
This probe times head_conv1 three ways:

  loop-N     N identical calls, one terminal sync   (the historical pattern)
  chained    each call's input depends on the previous output (unprunable)
  per-iter   sync every iteration (round-trip floor included)

and a trivial op to measure the sync floor itself.
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
import ml_dtypes

B, H, W, CIN, COUT = 16, 296, 528, 256, 128


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)).astype(ml_dtypes.bfloat16))
    w = jnp.asarray((rng.normal(size=(3, 3, CIN, COUT)) * 0.05).astype(
        ml_dtypes.bfloat16))
    f = jax.jit(conv)

    # chained: scalar from prev output perturbs the input (cheap: one lane)
    def chained_step(x, w, prev):
        s = prev[0, 0, 0, 0].astype(jnp.bfloat16) * 0
        return f(x + s, w)
    g = jax.jit(chained_step)

    tiny = jax.jit(lambda a: a + 1.0)
    z = jnp.zeros((8, 128), jnp.float32)

    # sync floor
    float(jnp.sum(tiny(z)))
    t0 = time.perf_counter()
    for _ in range(10):
        float(jnp.sum(tiny(z)))
    floor = (time.perf_counter() - t0) / 10 * 1e3
    print(f"sync floor: {floor:.2f} ms", flush=True)

    # loop-N for N in 2, 6, 12 (if per-iter cost falls with N -> pruning)
    r = f(x, w); float(jnp.sum(r))
    for n in (2, 6, 12):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(x, w)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"loop-{n:2d}: {dt:7.2f} ms/iter", flush=True)

    # chained
    r = g(x, w, r); float(jnp.sum(r))
    for n in (2, 6):
        t0 = time.perf_counter()
        for _ in range(n):
            r = g(x, w, r)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"chain-{n}: {dt:7.2f} ms/iter", flush=True)

    # per-iter sync
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        r = f(x, w)
        float(jnp.sum(r))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"per-iter sync: {sorted(ts)[len(ts)//2]:.2f} ms median "
          f"(floor {floor:.2f})", flush=True)


if __name__ == "__main__":
    main()
