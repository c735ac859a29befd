"""Does f32-accumulation output speed up the head convs?

probe_conv1.py measured head_conv1 (296x528, 256->128) at 13.5 ms bf16-out
vs 12.3 ms f32-out(+cast) at B16. This probes the same swap at the RCU
shape (148x264, 256->256) and on the whole fusion_0 block, deciding whether
DPT-head convs should set preferred_element_type=f32.
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

B = 16


def timeit(fn, *args, n=8, name=""):
    r = fn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n * 1e3 - 26.0 / n
    print(f"{name:34s} {dt:7.2f} ms", flush=True)


def conv(x, w, f32):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if f32 else None)
    return y.astype(x.dtype)


def rcu(x, w1, w2, f32):
    h = jax.nn.relu(x)
    h = conv(h, w1, f32)
    h = jax.nn.relu(h)
    h = conv(h, w2, f32)
    return x + h


def main():
    rng = np.random.default_rng(0)

    def dev(shape):
        return jnp.asarray((rng.normal(size=shape) * 0.05).astype(
            ml_dtypes.bfloat16))

    for (h, w, cin, cout, label) in [
        (148, 264, 256, 256, "RCU conv 148x264 c256"),
        (296, 528, 256, 256, "RCU conv 296x528 c256"),
        (296, 528, 256, 128, "head_conv1 296x528 256->128"),
    ]:
        x = dev((B, h, w, cin))
        k = dev((3, 3, cin, cout))
        timeit(jax.jit(lambda a, b: conv(a, b, False)), x, k,
               name=f"{label} bf16-acc")
        timeit(jax.jit(lambda a, b: conv(a, b, True)), x, k,
               name=f"{label} f32-acc")

    x = dev((B, 148, 264, 256))
    k1, k2 = dev((3, 3, 256, 256)), dev((3, 3, 256, 256))
    timeit(jax.jit(lambda a, b, c: rcu(a, b, c, False)), x, k1, k2,
           name="RCU block 148x264 bf16-acc")
    timeit(jax.jit(lambda a, b, c: rcu(a, b, c, True)), x, k1, k2,
           name="RCU block 148x264 f32-acc")


if __name__ == "__main__":
    main()
