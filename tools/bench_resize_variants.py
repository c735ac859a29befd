"""Bench bilinear-resize variants at the DPT output-head shape.

Target: (B, 296, 528, 128) bf16 -> (518, 924), align_corners=True.
Baseline dense-matmul resize measures ~20 ms at B=16 vs ~5.2 ms MXU-FLOP
floor + ~6 ms HBM traffic. Variants probe whether 2-tap gather+lerp (no MXU
FLOPs, pure bandwidth) beats the dense matmul at c128, per axis.
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

from txr.ops.resize import _source_coords, _linear_matrix, resize_bilinear

B, H, W, C = 16, 296, 528, 128
HO, WO = 518, 924


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
    print(f"{name:42s} {dt:8.2f} ms", flush=True)
    return r, dt


def taps(out_size, in_size):
    src = np.asarray(_source_coords(out_size, in_size, True))
    lo = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    w = (src - np.floor(src)).astype(np.float32)
    return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(w)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(B, H, W, C)).astype(ml_dtypes.bfloat16))

    hlo, hhi, hw = taps(HO, H)
    wlo, whi, ww = taps(WO, W)
    hwb = hw.astype(jnp.bfloat16)[None, :, None, None]
    wwb = ww.astype(jnp.bfloat16)[None, None, :, None]

    @jax.jit
    def dense(x):
        return resize_bilinear(x, HO, WO, align_corners=True)

    @jax.jit
    def take_both(x):
        y = jnp.take(x, hlo, axis=1) * (1 - hwb) + jnp.take(x, hhi, axis=1) * hwb
        y = jnp.take(y, wlo, axis=2) * (1 - wwb) + jnp.take(y, whi, axis=2) * wwb
        return y

    Mh = _linear_matrix(HO, H, True).astype(jnp.bfloat16)
    Mw = _linear_matrix(WO, W, True).astype(jnp.bfloat16)

    @jax.jit
    def take_h_mm_w(x):
        y = jnp.take(x, hlo, axis=1) * (1 - hwb) + jnp.take(x, hhi, axis=1) * hwb
        return jnp.einsum("oW,bhWc->bhoc", Mw, y,
                          preferred_element_type=jnp.float32).astype(x.dtype)

    @jax.jit
    def mm_h_take_w(x):
        y = jnp.einsum("oh,bhwc->bowc", Mh, x,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return jnp.take(y, wlo, axis=2) * (1 - wwb) + jnp.take(y, whi, axis=2) * wwb

    # take expressed as one interleaved gather of stacked lo/hi rows
    @jax.jit
    def take_both_v2(x):
        # (B,H,W,C) -> lerp H via dynamic_slice-free gather on axis 1
        xl = x[:, hlo]
        xh = x[:, hhi]
        y = xl + (xh - xl) * hwb
        yl = y[:, :, wlo]
        yh = y[:, :, whi]
        return yl + (yh - yl) * wwb

    ref, _ = timeit(dense, x, name="dense matmul (baseline)")
    for name, fn in [("take+lerp both axes", take_both),
                     ("take H, matmul W", take_h_mm_w),
                     ("matmul H, take W", mm_h_take_w),
                     ("index+lerp both (sub form)", take_both_v2)]:
        got, _ = timeit(fn, x, name=name)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"    max abs err vs dense: {err:.4f}")


if __name__ == "__main__":
    main()
