#!/usr/bin/env python3
"""Device-vs-host breakdown for the fused streaming step (VERDICT r2 #2).

The streaming_folder config measured ~1 s/frame on the relay while its fused
path syncs only once per 8 frames — this tool splits that second into (a)
the fused program's actual device time, (b) per-stage device time of its
components (depth forward / SIFT / match+RANSAC / ICP / map insert), and
(c) the residual host+dispatch tax, using the relay timing discipline from
CLAUDE.md: N dispatches + ONE terminal sync, floor subtracted once.

Usage: python tools/profile_stream.py [n_reps] [map_pow2]
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


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timed(fn, *args, n=10, sync_out=None):
    """(total - floor)/n with one terminal sync; floor measured separately."""
    out = None
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    if sync_out is not None:
        sync_out(out)
    else:
        sync(out)
    return (time.perf_counter() - t0) / n * 1000.0, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    map_pow = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    h, w = 480, 640

    from txr.core.config import StreamingConfig
    from txr.core.intrinsics import CameraIntrinsics
    from txr.models.depth_anything import DepthAnythingModel
    from txr.pipelines.stream_step import (
        build_fused_stream_step,
        init_fused_state,
    )

    from txr.utils.tpu_wait import wait_for_backend

    wait_for_backend(log=log)

    model = DepthAnythingModel(version="v2", encoder="vits", seed=0)
    intr = CameraIntrinsics.default(w, h)
    cfg = StreamingConfig(voxel_size=0.02, subsample_factor=2,
                          max_depth=10.0, max_map_points=1 << map_pow)

    log(f"platform: {jax.devices()[0].platform} {jax.devices()[0].device_kind}")

    # sync floor: warm the probe program first (its first call pays compile
    # and any relay wake-up), then take the median of 9 — a single
    # contaminated sample made every stage number negative once (r3).
    one = jnp.ones((8,), jnp.float32)
    for _ in range(3):
        float(jnp.sum(one))
    samples = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(jnp.sum(one))
        samples.append((time.perf_counter() - t0) * 1000)
    floor = float(np.median(samples))
    log(f"sync floor ~{floor:.1f} ms (median of {len(samples)})")

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
              for _ in range(4)]

    step = build_fused_stream_step(model, intr, cfg, h=h, w=w)
    state = init_fused_state(1 << map_pow, cfg.voxel_size, 4096)

    # warm + populate the map with a few frames
    t0 = time.perf_counter()
    for f in frames:
        state, diag = step(model.params, state, jnp.asarray(f))
    sync(diag.t)
    log(f"warm 4 frames (incl compile): {time.perf_counter() - t0:.1f}s, "
        f"map={int(diag.map_size)}")

    # (a) fused step device+dispatch time
    dev = jnp.asarray(frames[0])

    def run_step(s):
        s2, d = step(model.params, s, dev)
        return s2

    t0 = time.perf_counter()
    s = state
    for _ in range(n):
        s = run_step(s)
    sync(s.t)
    fused_ms = (time.perf_counter() - t0 - floor / 1000) / n * 1000
    log(f"fused step: {fused_ms:.1f} ms/frame (n={n})")

    # (b) components, each its own jitted program
    from txr.ops.resize import (
        IMAGENET_MEAN, IMAGENET_STD, compute_da_resize,
        resize_bicubic, resize_bilinear)
    in_h, in_w = compute_da_resize(h, w, model.input_size)
    flax_model = model.model

    @jax.jit
    def fwd(params, bgr):
        x = bgr[..., ::-1].astype(jnp.float32) / 255.0
        x = resize_bicubic(x, in_h, in_w, align_corners=False)
        x = ((x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD))[None]
        d = flax_model.apply({"params": params}, x)
        return resize_bilinear(d[..., None], h, w, align_corners=True)[0, ..., 0]

    from txr.ops.clahe import clahe
    from txr.ops.sift import sift_features
    from txr.pipelines.stream_step import _bgr_to_gray_u8

    @jax.jit
    def sift_only(bgr):
        g = _bgr_to_gray_u8(bgr)
        g = clahe.__wrapped__(g, 2.0, 8)
        f = sift_features(g, capacity=4096)
        return f.uv

    from txr.fusion.offset_map import offset_map_insert, offset_map_points
    from txr.ops.backproject import backproject, transform_to_world

    @jax.jit
    def backproj_only(depth, bgr):
        return backproject.__wrapped__(
            depth, bgr[..., ::-1], intr.fx, intr.fy, intr.cx, intr.cy,
            cfg.min_depth, cfg.max_depth, 1.0, cfg.subsample_factor)

    @jax.jit
    def insert_only(vm, ps):
        return offset_map_insert.__wrapped__(vm, ps)

    from txr.geometry.icp import estimate_normals, icp_point_to_plane

    @jax.jit
    def icp_only(vm, ps):
        map_ps = offset_map_points.__wrapped__(vm)
        icp_sample = 4096
        sstep = max(1, ps.xyz.shape[0] // icp_sample)
        src_xyz = ps.xyz[::sstep][:icp_sample]
        src_mask = ps.mask[::sstep][:icp_sample]
        tcap = min(icp_sample * 4, map_ps.xyz.shape[0])
        tstep = max(1, map_ps.xyz.shape[0] // tcap)
        tgt_xyz = map_ps.xyz[::tstep][:tcap]
        tgt_mask = map_ps.mask[::tstep][:tcap]
        normals = estimate_normals.__wrapped__(tgt_xyz, tgt_mask, 8)
        Rc, tc, rmse, frac = icp_point_to_plane.__wrapped__(
            src_xyz, src_mask, tgt_xyz, normals, tgt_mask,
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            cfg.icp_iterations, cfg.icp_max_correspondence, 1024)
        return tc

    from txr.ops.matching import match_l2_ratio
    from txr.pipelines.fusion_pipeline import pair_step

    @jax.jit
    def pose_only(uv1, d1, m1, uv2c, d2, m2, key):
        K = jnp.asarray(intr.to_matrix(), jnp.float32)
        idx2, ok = match_l2_ratio.__wrapped__(d1, d2, m1, m2, 0.75)
        return pair_step.__wrapped__(uv1, uv2c[idx2], ok, K, key, 2.0,
                                     cfg.min_depth, cfg.max_depth * 10)[4]

    # stage inputs
    depth = fwd(model.params, dev)
    ps = transform_to_world(backproj_only(depth, dev),
                            jnp.eye(3, dtype=jnp.float32),
                            jnp.zeros(3, jnp.float32))
    f_uv = sift_only(dev)
    fobj_uv, fobj_desc, fobj_mask = (
        s.prev_uv, s.prev_desc, s.prev_mask)
    key = jax.random.PRNGKey(1)
    vm = s.vm

    stages = {}
    for name, fn, args in (
            ("depth_fwd", fwd, (model.params, dev)),
            ("sift", sift_only, (dev,)),
            ("match+ransac", pose_only,
             (fobj_uv, fobj_desc, fobj_mask, fobj_uv, fobj_desc, fobj_mask,
              key)),
            ("backproject", backproj_only, (depth, dev)),
            ("icp", icp_only, (vm, ps)),
            ("insert", insert_only, (vm, ps)),
    ):
        # warm
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        ms = (time.perf_counter() - t0 - floor / 1000) / n * 1000
        stages[name] = ms
        log(f"  {name:13s} {ms:8.1f} ms")

    total_stage = sum(stages.values())
    log(f"stage sum: {total_stage:.1f} ms vs fused {fused_ms:.1f} ms "
        f"(fusion saves dispatch+overlap)")

    # (c) host-side costs: frame staging
    t0 = time.perf_counter()
    for _ in range(n):
        x = jnp.asarray(frames[0])
    sync(x)
    h2d = (time.perf_counter() - t0 - floor / 1000) / n * 1000
    log(f"H2D frame stage: {h2d:.1f} ms")

    import json
    print(json.dumps({"fused_step_ms": round(fused_ms, 1),
                      "stages_ms": {k: round(v, 1) for k, v in stages.items()},
                      "h2d_ms": round(h2d, 1),
                      "floor_ms": round(floor, 1)}))


if __name__ == "__main__":
    main()
