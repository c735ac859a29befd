"""TPU bench: fused DPT tail kernel vs unfused XLA at bench shape.

Target (B=16): unfused resize 20 ms + conv2/conv3 ~10 ms. Kernel estimate
~10 ms (MXU ~8.7 effective + DMA 3.2 overlapped).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from txr.ops.dpt_tail import fused_head_tail, head_tail_reference

B, HIN, WIN, C, F = 16, 296, 528, 128, 32
HO, WO = 518, 924


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=10, name=""):
    print(f"compiling {name}...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    r = fn(*args)
    sync(r)
    print(f"  compile+first: {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:34s} {dt:8.2f} ms", flush=True)
    return r


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(B, HIN, WIN, C)).astype(ml_dtypes.bfloat16))
    w2 = jnp.asarray((rng.normal(size=(3, 3, C, F)) * 0.05), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(size=(F,)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(F,)), jnp.bfloat16)
    b3 = jnp.asarray(rng.normal(size=(1,)), jnp.bfloat16)

    fused = jax.jit(lambda *a: fused_head_tail(*a, out_h=HO, out_w=WO))
    ref = jax.jit(lambda *a: head_tail_reference(*a, out_h=HO, out_w=WO))

    got = timeit(fused, x, w2, b2, w3, b3, name="fused tail kernel")
    want = timeit(ref, x, w2, b2, w3, b3, name="unfused XLA tail")

    g = np.asarray(got[:2], np.float32)
    w = np.asarray(want[:2], np.float32)
    err = np.abs(g - w)
    rel = err.max() / max(np.abs(w).max(), 1e-6)
    print(f"max abs err {err.max():.4f}  (rel {rel:.5f})")
    assert rel < 0.02, rel
    print("OK")


if __name__ == "__main__":
    main()
