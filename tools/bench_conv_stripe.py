"""TPU bench: flat-stripe conv3x3 vs XLA conv at DPT head shapes."""

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

from txr.ops.conv_stripe import conv3x3_stripe, conv3x3_reference

B = 16


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=10, name=""):
    print(f"compiling {name}...", file=sys.stderr, flush=True)
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)
    return r


def run(h, w, c, f, relu_in, label):
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(B, h, w, c)).astype(ml_dtypes.bfloat16))
    wk = jnp.asarray(rng.normal(size=(3, 3, c, f)) * 0.05, jnp.bfloat16)
    bb = jnp.asarray(rng.normal(size=(f,)), jnp.bfloat16)
    fused = jax.jit(lambda a, b_, c_: conv3x3_stripe(a, b_, c_, relu_in=relu_in))
    ref = jax.jit(lambda a, b_, c_: conv3x3_reference(a, b_, c_, relu_in=relu_in))
    got = timeit(fused, x, wk, bb, name=f"stripe conv {label}")
    want = timeit(ref, x, wk, bb, name=f"XLA conv    {label}")
    g = np.asarray(got[:2], np.float32)
    v = np.asarray(want[:2], np.float32)
    rel = np.abs(g - v).max() / max(np.abs(v).max(), 1e-6)
    print(f"  rel err {rel:.5f}")
    assert rel < 0.02, rel


def main():
    run(148, 264, 256, 256, True, "RCU 148x264 c256 (floor 3.7)")
    run(296, 528, 256, 128, False, "conv1 296x528 256->128 (floor 7.5)")
    run(296, 528, 256, 256, True, "RCU 296x528 c256 (fusion_0 out)")


if __name__ == "__main__":
    main()
