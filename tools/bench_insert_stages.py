#!/usr/bin/env python3
"""Decompose offset_map_insert cost: sort / +cumsum / full (diffs = stages)."""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from txr.core.types import PointSet
from txr.fusion.offset_map import (_point_cols, _unpack_klo_x, _unpack_rgb,
                                   _dq, create_offset_map, offset_map_insert)
from txr.ops.scan import matmul_cumsum


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def prep(vm, points):
    bcols = _point_cols(points, vm.voxel_size)
    return tuple(jnp.concatenate([v, b]) for v, b in zip(vm[:4], bcols))


@jax.jit
def upto_sort(vm, points):
    s = jax.lax.sort(prep(vm, points), num_keys=2)
    return s[0], s[3]


@jax.jit
def upto_cumsum(vm, points):
    s = jax.lax.sort(prep(vm, points), num_keys=2)
    _, u_x = _unpack_klo_x(s[1])
    u_yzw = s[2].astype(jnp.uint32)
    u_rgb = s[3].astype(jnp.uint32)
    w = (u_yzw & 0x7FF).astype(jnp.float32)
    rr, gg, bb = _unpack_rgb(u_rgb)
    scols = jnp.stack([
        _dq(u_x, 10) * w, _dq((u_yzw >> 21) & 0x3FF, 10) * w,
        _dq((u_yzw >> 11) & 0x3FF, 10) * w, rr * w, gg * w, bb * w, w],
        axis=1)
    csum = matmul_cumsum(scols)
    return s[0], csum[-1]


@jax.jit
def upto_topk(vm, points):
    s = jax.lax.sort(prep(vm, points), num_keys=2)
    skhi = s[0]
    sklo, _ = _unpack_klo_x(s[1])
    n = skhi.shape[0]
    last = ((skhi != jnp.roll(skhi, -1)) | (sklo != jnp.roll(sklo, -1))
            ).at[n - 1].set(True)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    order = jnp.where(last, pos, jnp.int32(n))
    neg_top, perm_c = jax.lax.top_k(-order, vm.khi.shape[0])
    return neg_top, perm_c


def main():
    n = 16 * 518400
    cap = 1 << 21
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 2.0, (n, 3)).astype(np.float32)
    xyz[:, 2] = np.abs(xyz[:, 2]) + 0.5
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    pts = PointSet(jax.device_put(jnp.asarray(xyz)),
                   jax.device_put(jnp.asarray(rgb)), jnp.ones((n,), bool))

    vm = create_offset_map(cap, 0.01)
    vm = offset_map_insert(vm, pts)
    sync(vm.khi)

    def run(fn, name, reps=6):
        o = fn(vm, pts)
        sync(o[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn(vm, pts)
        sync(o[0])
        dt = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:20s} {dt:7.2f} ms")
        return dt

    t1 = run(upto_sort, "prep+sort")
    t2 = run(upto_cumsum, "+unpack+cumsum")
    t3 = run(upto_topk, "sort+last+topk")

    # full insert (donating copy)
    import copy
    vm2 = create_offset_map(cap, 0.01)
    vm2 = offset_map_insert(vm2, pts)
    sync(vm2.khi)
    t0 = time.perf_counter()
    for _ in range(6):
        vm2 = offset_map_insert(vm2, pts)
    sync(vm2.khi)
    t4 = (time.perf_counter() - t0) / 6 * 1000
    print(f"{'full insert':20s} {t4:7.2f} ms")
    print(f"stages: sort={t1:.0f} cumsum={t2 - t1:.0f} topk={t3 - t1:.0f} "
          f"gather+epilogue={t4 - t2 - (t3 - t1):.0f}")


if __name__ == "__main__":
    main()
