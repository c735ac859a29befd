#!/usr/bin/env python3
"""Is s8 x s8 -> s32 on the v5e MXU actually ~2x bf16 through XLA?

Shapes mirror the ViT-L bench forward: tokens = batch16 x 2443 seq, and the
three dense shapes per block (qkv 1024->3072, proj 1024->1024, fc 1024->4096).
Also times the W8A8 dynamic-quant pattern end to end (rowmax quant + int8 dot
+ rescale) vs a plain bf16 dense, which is the real integration decision.
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


def timeit(fn, *args, reps=100):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    rng = np.random.default_rng(0)
    M = 16 * 2443
    M = (M + 255) // 256 * 256  # 39168
    for K, N in ((1024, 3072), (1024, 1024), (1024, 4096), (4096, 1024)):
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        xb, wb = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
        xq = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(w * 30), -127, 127).astype(jnp.int8)
        sw = jnp.max(jnp.abs(w), axis=0) / 127.0

        @jax.jit
        def f_bf16(a, b):
            return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

        @jax.jit
        def f_i8(a, b):
            return jax.lax.dot(a, b, preferred_element_type=jnp.int32)

        @jax.jit
        def f_w8a8(a, b, s):
            # dynamic per-row activation quant + int8 dot + rescale, bf16 out
            sx = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0
            aq = jnp.round(a / sx).astype(jnp.int8)
            y = jax.lax.dot(aq, b, preferred_element_type=jnp.int32)
            return (y.astype(jnp.float32) * (sx * s)).astype(jnp.bfloat16)

        from txr.ops.quant_pallas import int8_linear

        t_bf = timeit(f_bf16, xb, wb)
        t_i8 = timeit(f_i8, xq, wq)
        t_w8a8 = timeit(f_w8a8, xb, wq, sw)
        t_pl = timeit(jax.jit(int8_linear), xb, wb)
        gflop = 2 * M * K * N / 1e9
        print(f"({M},{K})x({K},{N}): bf16 {t_bf:7.2f} ms ({gflop/t_bf:6.0f} GF/ms)"
              f"  i8 {t_i8:7.2f} ms ({gflop/t_i8:6.0f})"
              f"  w8a8+quant {t_w8a8:7.2f} ms ({gflop/t_w8a8:6.0f})"
              f"  pallas {t_pl:7.2f} ms ({gflop/t_pl:6.0f})", flush=True)


if __name__ == "__main__":
    main()
