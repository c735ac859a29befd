#!/usr/bin/env python3
"""Stage-level timing of the bench pipeline on the real chip.

Times each stage as its own jitted program, K reps between syncs
(axon relay: block_until_ready is a no-op; sync via float(jnp.sum())).
Diagnostics to stderr/stdout freely — this is a tool, not bench.py.
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from txr.core.types import PointSet
from txr.models.depth_anything import build_model
from txr.ops.resize import (IMAGENET_MEAN, IMAGENET_STD, compute_da_resize,
                            resize_bicubic)
from txr.ops.backproject import backproject_world
from txr.fusion.offset_map import (create_offset_map, offset_map_insert,
                                   offset_map_size)


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, reps=8, donate=None, name=""):
    # warmup/compile
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:40s} {dt:8.2f} ms")
    return dt, out


def main():
    batch = int(os.environ.get("TXR_BENCH_BATCH", "16"))
    encoder = os.environ.get("TXR_BENCH_ENCODER", "vitl")
    H, W = 1080, 1920
    in_h, in_w = compute_da_resize(H, W, 518)
    print(f"batch={batch} encoder={encoder} model input {in_w}x{in_h}",
          file=sys.stderr)

    model, vit_cfg, dpt_cfg = build_model("v2", encoder)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 56, 56, 3), jnp.float32))["params"]
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)

    fx = fy = 0.8 * W
    cx, cy = W / 2.0, H / 2.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    eye = jnp.eye(3, dtype=jnp.float32)
    zero_t = jnp.zeros(3, jnp.float32)

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 255, (batch, H, W, 3),
                                         dtype=np.uint8))

    @jax.jit
    def preprocess(frames_u8):
        x = frames_u8.astype(jnp.float32) / 255.0
        xm = resize_bicubic(x, in_h, in_w, align_corners=False)
        return ((xm - mean) / std).astype(jnp.bfloat16), xm

    @jax.jit
    def forward(params, xm):
        return model.apply({"params": params}, xm).astype(jnp.float32)

    from txr.models.vit import ViTEncoder

    enc_model = ViTEncoder(vit_cfg)

    @jax.jit
    def forward_encoder(params, xm):
        return enc_model.apply({"params": params["encoder"]}, xm)[-1]

    # mirror bench.py: back-project on the model depth grid, RGB from the
    # bicubic-resized model input.
    sx, sy = in_w / W, in_h / H

    @jax.jit
    def post(depth, rgb_m):
        def one(depth_i, rgb_i):
            return backproject_world(depth_i, rgb_i, eye, zero_t,
                                     fx * sx, fy * sy, cx * sx, cy * sy,
                                     1e-4, 1e6, 1.0, 1)
        ps = jax.vmap(one)(depth, rgb_m)
        n = ps.xyz.shape[0] * ps.xyz.shape[1]
        return PointSet(ps.xyz.reshape(n, 3), ps.rgb.reshape(n, 3),
                        ps.mask.reshape(n))

    t_pre, (xm, rgb_m) = timeit(preprocess, frames,
                                name="preprocess (resize+norm)")
    t_fwd, depth = timeit(forward, params, xm, name="model forward")
    if os.environ.get("TXR_PROFILE_ENCODER"):
        timeit(forward_encoder, params, xm, name="encoder only")
    t_post, flat = timeit(post, depth, rgb_m, name="backproject (model grid)")

    # insert: state is donated inside the map insert; rebuild each reps
    vm = create_offset_map(1 << 21, 0.01)
    vm = offset_map_insert(vm, flat)  # warm state + compile
    sync(vm.khi)
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        vm = offset_map_insert(vm, flat)
    sync(vm.khi)
    t_ins = (time.perf_counter() - t0) / reps * 1000
    print(f"{'offset_map_insert':40s} {t_ins:8.2f} ms")
    print(f"map voxels: {int(offset_map_size(vm))}")

    tot = t_pre + t_fwd + t_post + t_ins
    print(f"{'TOTAL (sum of stages)':40s} {tot:8.2f} ms  "
          f"-> {batch / tot * 1000:.2f} fps")
    for nm, t in [("preprocess", t_pre), ("forward", t_fwd),
                  ("post", t_post), ("insert", t_ins)]:
        print(f"  {nm:12s} {t / batch:6.2f} ms/frame")


if __name__ == "__main__":
    main()
