#!/usr/bin/env python3
"""Attribute the fused streaming batch step's device time to stages.

Round-5 finding to explain: config5 (streaming folder replay) records
fused_batch_step at 1547 ms/frame (r4) vs 584 (r3) while the component
probes say model+SIFT+insert should sum to ~100 ms/frame. This probe
builds VARIANTS of build_fused_stream_batch_step with stages disabled and
times each on the chip per CLAUDE.md discipline (N dispatches + ONE
terminal sync, floor-subtracted), so the difference between variants is
the stage's cost inside the real program.

Variants:
  full        — the exact config5 program (vits, 640x480, B=8, icp on)
  no_icp      — use_icp=False (drops ICP + normals + map gather)
  no_sift     — sift_features stubbed to zeros (drops DoG/orientation/desc)
  no_pair     — pair_step stubbed (drops RANSAC/eig/triangulation)
  model_only  — just the batched depth forward + resizes

Usage: python tools/probe_stream_stages.py [--iters 4]
Env: TXR_F32_DOTS=0 additionally disables the geometry full-f32 contexts
(measures the precision tax).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variants", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from txr.core.config import StreamingConfig
    from txr.core.intrinsics import CameraIntrinsics
    from txr.models.depth_anything import DepthAnythingModel
    import txr.pipelines.stream_step as ss

    H, W, B = 480, 640, args.batch
    intr = CameraIntrinsics(fx=512.0, fy=512.0, cx=W / 2, cy=H / 2,
                            width=W, height=H)
    cfg = StreamingConfig(voxel_size=0.01, subsample_factor=2,
                          max_depth=10.0)
    model = DepthAnythingModel(version="v2", encoder="vits")

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (B, H, W, 3), np.uint8))
    float(jnp.sum(frames[0, 0, 0]))  # staged

    def sync_floor():
        one = jnp.ones((8,), jnp.float32)
        float(jnp.sum(one))
        t0 = time.perf_counter()
        for _ in range(5):
            float(jnp.sum(one))
        return (time.perf_counter() - t0) / 5

    def time_step(step_fn, state0, label):
        t0 = time.perf_counter()
        st, diag = step_fn(model.params, state0, frames, jnp.asarray(B))
        float(jnp.sum(st.t))
        compile_s = time.perf_counter() - t0
        floor = sync_floor()
        # N dispatches, ONE terminal sync (amortizes the relay floor).
        t0 = time.perf_counter()
        st = state0
        for _ in range(args.iters):
            st, diag = step_fn(model.params, st, frames, jnp.asarray(B))
        float(jnp.sum(st.t))
        dt = time.perf_counter() - t0 - floor
        ms_frame = dt / (args.iters * B) * 1000.0
        log(f"{label:12s} compile {compile_s:7.1f}s   "
            f"{ms_frame:8.1f} ms/frame   (floor {floor*1000:.0f} ms)")
        return ms_frame

    def make_state():
        cap = 1 << 20
        return ss.init_fused_state(cap, cfg.voxel_size,
                                   feature_capacity=4096)

    results = {}
    want = set(args.variants.split(",")) if args.variants else None

    def run(label, **kw):
        if want is not None and label not in want:
            return
        patches = kw.pop("patches", {})
        saved = {}
        for name, repl in patches.items():
            saved[name] = getattr(ss, name)
            setattr(ss, name, repl)
        try:
            step = ss.build_fused_stream_batch_step(
                model, intr, cfg, h=H, w=W, batch=B,
                n_features=3000, **kw)
            results[label] = time_step(step, make_state(), label)
        finally:
            for name, fn in saved.items():
                setattr(ss, name, fn)

    # Stubs keep shapes/dtypes identical so downstream stages survive.
    real_sift = ss.sift_features

    def stub_sift(gray, capacity=4096, **kw):
        f = real_sift(gray, capacity=capacity, **kw)
        z = jax.tree_util.tree_map(jnp.zeros_like, f)
        return z

    real_pair = ss.pair_step

    class StubPair:
        @staticmethod
        def __wrapped__(uv1, uv2, ok, K, key, thr, mind, maxd):
            R = jnp.eye(3, dtype=jnp.float32)
            t = jnp.zeros((3,), jnp.float32)
            X = jnp.zeros((uv1.shape[0], 3), jnp.float32)
            valid = jnp.zeros((uv1.shape[0],), bool)
            return R, t, X, valid, jnp.asarray(0, jnp.int32)

    run("full")
    run("no_icp", use_icp=False)
    run("no_sift", patches={"sift_features": stub_sift})
    run("no_pair", patches={"pair_step": StubPair})

    # model_only: time the bare batched forward at the same shapes.
    if want is None or "model_only" in want:
        from txr.ops.resize import (IMAGENET_MEAN, IMAGENET_STD,
                                    compute_da_resize, resize_bicubic,
                                    resize_bilinear)
        in_h, in_w = compute_da_resize(H, W, model.input_size)
        fm = model.model

        @jax.jit
        def fwd(params, frames_u8):
            x = frames_u8[..., ::-1].astype(jnp.float32) / 255.0
            x = resize_bicubic(x, in_h, in_w, align_corners=False)
            x = (x - jnp.asarray(IMAGENET_MEAN, jnp.float32)) / jnp.asarray(
                IMAGENET_STD, jnp.float32)
            d = fm.apply({"params": params}, x)
            return resize_bilinear(d[..., None], H, W,
                                   align_corners=True)[..., 0]

        t0 = time.perf_counter()
        float(jnp.sum(fwd(model.params, frames)))
        log(f"model_only compile {time.perf_counter()-t0:.1f}s")
        floor = sync_floor()
        t0 = time.perf_counter()
        d = None
        for _ in range(args.iters):
            d = fwd(model.params, frames)
        float(jnp.sum(d))
        dt = time.perf_counter() - t0 - floor
        results["model_only"] = dt / (args.iters * B) * 1000.0
        log(f"{'model_only':12s} {'':>18s} "
            f"{results['model_only']:8.1f} ms/frame")

    import json
    print(json.dumps({k: round(v, 1) for k, v in results.items()}))


if __name__ == "__main__":
    main()
