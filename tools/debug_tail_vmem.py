"""Bisect the fused-tail kernel's VMEM blowup: compile reduced variants."""

import os
import sys
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

from txr.ops.resize import _linear_matrix

B, HIN, WIN, C, F = 16, 296, 528, 128, 32
HO, WO = 518, 924
HBO = HBI = 8
MODE = sys.argv[1] if len(sys.argv) > 1 else "full"


def kernel(x0_ref, x1_ref, mw_ref, w2_ref, o_ref, xw_ref, *, mode):
    i = pl.program_id(1)
    sh = (HIN - 1) / (HO - 1)
    g0 = i * HBO - 1
    fl0 = jnp.floor(g0 * sh).astype(jnp.int32)
    idx = jnp.clip(fl0 // HBI, 0, HIN // HBI - 1)
    start = idx * HBI
    c = C

    xw_ref[:, 0, :] = jnp.zeros((HBO + 2, c), xw_ref.dtype)
    for z in range(WO + 1, xw_ref.shape[1]):
        xw_ref[:, z, :] = jnp.zeros((HBO + 2, c), xw_ref.dtype)

    if mode in ("full", "lerponly", "lerpnomm"):
        def body(ho, _):
            g = g0 + ho
            src = g * sh
            fl = jnp.floor(src)
            frac = (src - fl).astype(jnp.float32)
            lo = jnp.clip(fl.astype(jnp.int32), 0, HIN - 1)
            hi = jnp.clip(lo + 1, 0, HIN - 1)
            lo_l, hi_l = lo - start, hi - start
            valid = jnp.float32(1.0) * ((g >= 0) & (g < HO))
            a0 = x0_ref[0, jnp.clip(lo_l, 0, HBI - 1)]
            a1 = x1_ref[0, jnp.clip(lo_l - HBI, 0, HBI - 1)]
            a = jnp.where(lo_l < HBI, a0, a1).astype(jnp.float32)
            b0 = x0_ref[0, jnp.clip(hi_l, 0, HBI - 1)]
            b1 = x1_ref[0, jnp.clip(hi_l - HBI, 0, HBI - 1)]
            bb = jnp.where(hi_l < HBI, b0, b1).astype(jnp.float32)
            row = (a * (1.0 - frac) + bb * frac) * valid
            if mode == "lerpnomm":
                xw_ref[ho, 1:1 + WIN, :] = row.astype(xw_ref.dtype)
            else:
                y = jnp.dot(mw_ref[...], row.astype(mw_ref.dtype),
                            preferred_element_type=jnp.float32)
                xw_ref[ho, 1:1 + WO, :] = y.astype(xw_ref.dtype)
            return 0
        jax.lax.fori_loop(0, HBO + 2, body, 0)

    if mode in ("full", "convonly"):
        wconv = WO + 2
        acc = jnp.zeros((HBO, WO, F), jnp.float32)
        for di in range(3):
            rows = xw_ref[di:di + HBO, 0:wconv, :]
            proj = jax.lax.dot_general(
                rows.reshape(HBO * wconv, c), w2_ref[di],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(HBO, wconv, 3 * F)
            for dj in range(3):
                acc = acc + proj[:, dj:dj + WO, dj * F:(dj + 1) * F]
        o_ref[0] = jnp.sum(acc, axis=-1).astype(o_ref.dtype)
    else:
        o_ref[0] = jnp.sum(xw_ref[1:1 + HBO, 1:1 + WO, :],
                           axis=-1).astype(o_ref.dtype)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.normal(size=(B, HIN, WIN, C)).astype(ml_dtypes.bfloat16))
    mw = _linear_matrix(WO, WIN, True).astype(jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(3, C, 3 * F)) * 0.05, jnp.bfloat16)
    sh = (HIN - 1) / (HO - 1)
    nblk = HIN // HBI
    wpad = -(-(WO + 2) // 8) * 8

    def hidx(bi, i):
        g0 = i * HBO - 1
        fl0 = jnp.floor(g0 * sh).astype(jnp.int32)
        return jnp.clip(fl0 // HBI, 0, nblk - 1)

    out = pl.pallas_call(
        partial(kernel, mode=MODE),
        grid=(B, -(-HO // HBO)),
        in_specs=[
            pl.BlockSpec((1, HBI, WIN, C), lambda bi, i: (bi, hidx(bi, i), 0, 0)),
            pl.BlockSpec((1, HBI, WIN, C),
                         lambda bi, i: (bi, jnp.minimum(hidx(bi, i) + 1, nblk - 1), 0, 0)),
            pl.BlockSpec((WO, WIN), lambda bi, i: (0, 0)),
            pl.BlockSpec((3, C, 3 * F), lambda bi, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, HBO, WO), lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B, HO, WO), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((HBO + 2, wpad, C), jnp.bfloat16)],
    )(x, x, mw, w2)
    r = float(jnp.sum(out.astype(jnp.float32)))
    print(f"{MODE}: compiled+ran, sum={r:.3f}")


if __name__ == "__main__":
    main()
