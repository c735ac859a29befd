"""Probe head_conv1 (296x528, 256->128 3x3) standalone XLA cost + variants.

CLAUDE.md attributes ~21 ms at B16 to conv1 (profile_dpt.py, pre-tail-fusion
attribution: output head 41 ms - matmul-resize 20 ms). Traffic floor is
~1.9 GB = 2.4 ms + 7.5 ms MXU floor => ~10 ms achievable if XLA keeps the
9-tap accumulation in VMEM. Variants:

  conv      lax.conv NHWC bf16 (what nn.Conv emits)
  convf32   same with f32 accumulation output (then cast)
  ninedot   9 shifted (BHW, 256)@(256, 128) dots summed (traffic-bound probe)
  packdj    3 dots (one per W-tap) to (BHW, 3*128) on H-shifted inputs,
            lane-sliced sum — XLA-level version of the dpt_tail conv2 trick
  dot1x1    (BHW, 256)@(256, 1152) single dot with conv1's exact FLOPs
            (MXU ceiling probe, wrong numerics)

Timing per CLAUDE.md: float(jnp.sum(.)) readback, axon relay ~26 ms floor.
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
MODES = sys.argv[1:] or ["conv", "convf32", "packdj", "dot1x1"]


def timeit(fn, *args, n=12, name=""):
    # One terminal sync: the relay round-trip floor (26-40 ms, drifts by day
    # — tools/probe_timing_sanity.py) amortizes over n dispatches, so per-op
    # cost ~= (total - floor)/n. Per-iteration floor subtraction (the old
    # "dt - 26.0") double-counts the floor n times and can go negative.
    r = fn(*args)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jnp.sum(r))
    tot = (time.perf_counter() - t0) * 1e3
    print(f"{name:10s} ~{(tot - 40.0) / n:7.2f} ms  "
          f"(raw {tot / n:.2f}/iter, floor 40 amortized)", flush=True)
    return r


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def convf32(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def ninedot(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            t = jnp.einsum("bhwc,cf->bhwf", xp[:, dy:dy + H, dx:dx + W],
                           w[dy, dx], preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def packdj(x, w):
    # One dot per W-tap dx: project H-shifted input against (CIN, 3*COUT)
    # where lanes hold the 3 H-taps; combine with H-shifted lane slices.
    wp = jnp.transpose(w, (1, 2, 0, 3)).reshape(3, CIN, 3 * COUT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dx in range(3):
        proj = jnp.einsum("bhwc,cf->bhwf", xp[:, :, dx:dx + W],
                          wp[dx], preferred_element_type=jnp.float32)
        t = (proj[:, 0:H, :, 0:COUT] + proj[:, 1:H + 1, :, COUT:2 * COUT]
             + proj[:, 2:H + 2, :, 2 * COUT:3 * COUT])
        acc = t if acc is None else acc + t
    return acc.astype(x.dtype)


def dot1x1(x, w):
    w2 = w.reshape(9 * CIN, COUT)[: CIN, :].repeat(9, axis=1)  # (256, 1152)
    return jnp.einsum("bhwc,cf->bhwf", x, w2,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)).astype(ml_dtypes.bfloat16))
    w = jnp.asarray((rng.normal(size=(3, 3, CIN, COUT)) * 0.05).astype(
        ml_dtypes.bfloat16))
    fns = {"conv": conv, "convf32": convf32, "ninedot": ninedot,
           "packdj": packdj, "dot1x1": dot1x1}
    ref = None
    for m in MODES:
        f = jax.jit(fns[m])
        r = timeit(f, x, w, name=m)
        if m in ("conv", "convf32", "packdj", "ninedot"):
            if ref is None:
                ref = np.asarray(r[0, :8, :8], np.float32)
            else:
                g = np.asarray(r[0, :8, :8], np.float32)
                rel = np.abs(g - ref).max() / max(np.abs(ref).max(), 1e-6)
                print(f"  {m} rel err vs first: {rel:.4f}")


if __name__ == "__main__":
    main()
