"""True chip-time of the device feature kernels (VERDICT r3 weak #3).

BENCH_CONFIGS' profiled pass timed detect()/detect_batch() end-to-end —
H2D staging of the frames INCLUDED — and the recording ran while the relay
was at 0.3 MB/s, so "device SIFT 508 ms/frame" could not distinguish chip
time from relay transfer. This probe pre-stages the gray batch on device,
syncs, THEN times N dispatches with one terminal sync (CLAUDE.md TIMING
discipline): (total - floor)/N = chip + dispatch-class cost, no staging.

Run on the TPU:  python tools/probe_device_features.py [sift|hybrid|all]
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


def floor_ms(n=10):
    one = jnp.ones((8,), jnp.float32)
    float(jnp.sum(one))
    t0 = time.perf_counter()
    for _ in range(n):
        float(jnp.sum(one))
    return (time.perf_counter() - t0) / n * 1000.0


def timed(fn, args, n=10, label=""):
    out = fn(*args)           # warm/compile
    fl = floor_ms()
    t0 = time.perf_counter()
    for _ in range(n - 1):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    total = (time.perf_counter() - t0) * 1000.0
    per = (total - fl) / (n - 1)
    print(f"{label}: {per:.1f} ms/dispatch (floor {fl:.1f} ms)", flush=True)
    return per


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    h, w = 480, 640
    print("backend:", jax.default_backend(), flush=True)

    if which in ("sift", "all"):
        from txr.geometry.features import SIFTDetector

        det = SIFTDetector(n_features=3000, capacity=8192, backend="device")
        fn = det._device_batch_fn(h, w)
        grays = jnp.asarray(rng.integers(0, 255, (det.BATCH, h, w), np.uint8))
        float(jnp.sum(grays.astype(jnp.float32)))  # staged + synced
        per = timed(fn, (grays,), label=f"sift batch-{det.BATCH} 640x480")
        print(f"  = {per / det.BATCH:.1f} ms/frame chip+dispatch", flush=True)

    if which in ("hybrid", "all"):
        from txr.geometry.hybrid import HybridFeatureDetector

        det = HybridFeatureDetector(backend="device")
        if hasattr(det, "_device_batch_fn"):
            B = getattr(det, "BATCH", 4)
            fn = det._device_batch_fn(h, w)
            grays = jnp.asarray(rng.integers(0, 255, (B, h, w), np.uint8))
            float(jnp.sum(grays.astype(jnp.float32)))
            per = timed(fn, (grays,), label=f"hybrid batch-{B} 640x480")
            print(f"  = {per / B:.1f} ms/frame chip+dispatch", flush=True)
        else:
            print("hybrid: no _device_batch_fn; skipping", flush=True)


if __name__ == "__main__":
    main()
