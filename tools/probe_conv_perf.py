"""Isolate the flat-stripe conv kernel's slowness at the RCU shape.

Modes: base (full kernel), nodot (copy loop only), nocopy (dots only),
aligned (dots from 8-aligned starts — wrong numerics, perf probe),
unroll (python-unrolled copy loop instead of fori),
bf16acc (dots emit bf16 — halves s-accumulator VMEM traffic),
dotonly (ONE dense dot at the step's exact M/K/N — MXU ceiling probe).
Env: HBO (default 16).
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C, F = 16, 148, 264, 256, 256
HBO = int(os.environ.get("HBO", "16"))
MODES = sys.argv[1:] or ["base", "nodot", "nocopy", "aligned"]


def make(mode):
    wr = -(-(W + 1) // 8) * 8
    nhb = -(-H // HBO)

    def kern(x0_ref, x1_ref, w_ref, o_ref, xs_ref):
        c = C
        zpad = jnp.zeros((wr - W, c), jnp.float32)

        if mode != "nocopy":
            def copy_row(ho, _):
                a0 = x0_ref[0, jnp.clip(ho, 0, HBO - 1)]
                a1 = x1_ref[0, jnp.clip(ho - HBO, 0, HBO - 1)]
                row = jnp.where(ho < HBO, a0, a1).astype(jnp.float32)
                rowp = jnp.concatenate([jnp.maximum(row, 0.0), zpad], axis=0)
                base = pl.multiple_of(8 + ho * wr, 8)
                xs_ref[pl.ds(base, wr), :] = rowp.astype(xs_ref.dtype)
                return 0
            jax.lax.fori_loop(0, HBO + 2, copy_row, 0)

        if mode == "nodot":
            o_ref[0] = xs_ref[8:8 + HBO * wr, 0:F].reshape(
                HBO, wr, F)[:, :W, :].astype(o_ref.dtype)
            return

        nr = HBO * wr
        if mode == "dotonly":
            rows = xs_ref[pl.ds(8, nr + 2 * wr), :]
            proj = jax.lax.dot_general(
                rows, w_ref[0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0] = proj[0:nr, 0:F].reshape(
                HBO, wr, F)[:, :W, :].astype(o_ref.dtype)
            return
        s = None
        for dj in range(3):
            start = {"aligned": 8 * dj}.get(mode, 7 + dj)
            rows = xs_ref[pl.ds(start, nr + 2 * wr), :]
            proj = jax.lax.dot_general(
                rows, w_ref[dj],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mode == "bf16acc":   # halve s-accumulator VMEM traffic
                proj = proj.astype(jnp.bfloat16)
            s = proj if s is None else s + proj
        acc = (s[0:nr, 0:F].astype(jnp.float32)
               + s[wr:wr + nr, F:2 * F]
               + s[2 * wr:2 * wr + nr, 2 * F:3 * F])
        o_ref[0] = acc.reshape(HBO, wr, F)[:, :W, :].astype(o_ref.dtype)

    hp = (nhb + 1) * HBO

    @jax.jit
    def run(xp, wp):
        return pl.pallas_call(
            kern,
            grid=(B, nhb),
            in_specs=[
                pl.BlockSpec((1, HBO, W, C), lambda bi, i: (bi, i, 0, 0)),
                pl.BlockSpec((1, HBO, W, C), lambda bi, i: (bi, i + 1, 0, 0)),
                pl.BlockSpec((3, C, 3 * F), lambda bi, i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, HBO, W, F), lambda bi, i: (bi, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, nhb * HBO, W, F), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((8 + (HBO + 2) * wr + 8, C), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(xp, xp, wp)
    return run, hp


def main():
    rng = np.random.default_rng(0)
    wp = jnp.asarray(rng.normal(size=(3, C, 3 * F)) * 0.02, jnp.bfloat16)
    for mode in MODES:
        run, hp = make(mode)
        xp = jax.device_put(rng.normal(size=(B, hp, W, C)).astype(ml_dtypes.bfloat16))
        r = run(xp, wp)
        float(jnp.sum(r.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(10):
            r = run(xp, wp)
        float(jnp.sum(r.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 10 * 1000
        print(f"{mode:10s} {dt:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
