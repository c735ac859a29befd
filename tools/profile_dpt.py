#!/usr/bin/env python3
"""Decompose the DPT head cost at vitl bench shapes (B=16, ph=37, pw=66).

FLOP floor (v5e 197 TF/s bf16): reassemble ~7 ms, fusion ~19 ms (fusion_0's
two 256-ch 3x3 RCD convs at 148x264 are 15 of it), output head ~16 ms
(conv1 7.5 + resize-to-924x518 5.2 + conv2 2.9). Total ~42 ms.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, "/root/repo")
from txr.models.dpt import DPTConfig, DPTHead, FeatureFusionBlock, ResidualConvUnit
from txr.ops.resize import resize_bilinear


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
    print(f"{name:30s} {dt:8.2f} ms")
    return dt


def main():
    B, ph, pw, D = 16, 37, 66, 1024
    cfg = DPTConfig(features=256, out_channels=(256, 512, 1024, 1024))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    import ml_dtypes
    def dev_bf16(shape):
        a = rng.normal(size=shape).astype(ml_dtypes.bfloat16)
        print(f"H2D {a.nbytes/1e6:.0f} MB...", file=sys.stderr, flush=True)
        return jax.device_put(a)

    hs = [dev_bf16((B, 1 + ph * pw, D)) for _ in range(4)]
    # fusion_0-equivalent: FeatureFusionBlock with residual at (148, 264).
    x = dev_bf16((B, 148, 264, 256))
    fb = FeatureFusionBlock(256)
    pf = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                fb.init(key, x, x))
    timeit(jax.jit(lambda p, a, b: fb.apply(p, a, b)), pf, x, x,
           name="fusion_0 block (148x264)")

    # output head: conv1 at (296,528,256) -> resize (518,924) -> conv2+conv3
    y0 = dev_bf16((B, 296, 528, 256))

    class OutHead(nn.Module):
        @nn.compact
        def __call__(self, y):
            y = nn.Conv(128, (3, 3), padding=1)(y)
            y = resize_bilinear(y, 518, 924, align_corners=True)
            y = nn.Conv(32, (3, 3), padding=1)(y)
            y = nn.relu(y)
            return nn.Conv(1, (1, 1))(y)

    oh = OutHead()
    po = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                oh.init(key, y0))
    timeit(jax.jit(lambda p, y: oh.apply(p, y)), po, y0, name="output head")

    # the resize alone at 128 channels
    y1 = dev_bf16((B, 296, 528, 128))
    timeit(jax.jit(lambda y: resize_bilinear(y, 518, 924, align_corners=True)),
           y1, name="resize 296x528->518x924 c128")

    # conv1 + fused tail (the current TPU path), incl. the XLA->Pallas
    # layout boundary — vs the sum of the isolated pieces.
    from txr.ops.dpt_tail import fused_head_tail

    class OutHeadFused(nn.Module):
        @nn.compact
        def __call__(self, y):
            y = nn.Conv(128, (3, 3), padding=1)(y)
            w2 = self.param("w2", nn.initializers.lecun_normal(),
                            (3, 3, 128, 32))
            b2 = self.param("b2", nn.initializers.zeros, (32,))
            w3 = self.param("w3", nn.initializers.lecun_normal(),
                            (1, 1, 32, 1))
            b3 = self.param("b3", nn.initializers.zeros, (1,))
            return fused_head_tail(y, w2, b2, w3, b3, 518, 924)

    ohf = OutHeadFused()
    pof = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                 ohf.init(key, y0))
    timeit(jax.jit(lambda p, y: ohf.apply(p, y)), pof, y0,
           name="output head conv1+fused tail")

    head = DPTHead(cfg)
    p = head.init(key, hs, ph, pw)
    p = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), p)
    f = jax.jit(lambda p, h: head.apply(p, h, ph, pw))
    timeit(f, p, hs, name="DPT head total (fused tail)")
    cfg_uf = DPTConfig(features=256, out_channels=(256, 512, 1024, 1024),
                       fused_head=False)
    head_uf = DPTHead(cfg_uf)
    f_uf = jax.jit(lambda p, h: head_uf.apply(p, h, ph, pw))
    timeit(f_uf, p, hs, name="DPT head total (unfused)")


def conv_variants():
    """Lone-conv efficiency probes at fusion_0 shapes."""
    import flax.linen as nn
    import ml_dtypes
    B = 16
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    def dev_bf16(shape):
        a = rng.normal(size=shape).astype(ml_dtypes.bfloat16)
        return jax.device_put(a)

    x = dev_bf16((B, 148, 264, 256))
    conv = nn.Conv(256, (3, 3), padding=1)
    p = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                               conv.init(key, x))
    t = timeit(jax.jit(lambda p, x: conv.apply(p, x)), p, x,
               name="conv3x3 256ch @148x264 (3.7 floor)")

    # same conv as an explicit 9-shift matmul sum (halo via pad+slice)
    w = p["params"]["kernel"]           # (3,3,256,256)
    b = p["params"]["bias"]

    @jax.jit
    def conv_shift(w, b, x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, wd = x.shape[1], x.shape[2]
        acc = None
        for di in range(3):
            for dj in range(3):
                xs = xp[:, di:di + h, dj:dj + wd, :]
                y = jnp.einsum("bhwc,cf->bhwf", xs, w[di, dj],
                               preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        return (acc + b).astype(x.dtype)

    t2 = timeit(conv_shift, w, b, x, name="conv3x3 as 9 shifted matmuls")

    # pixel-shuffle einsum at reassemble-0 shapes
    from txr.models.dpt import PixelShuffleUp
    x0 = dev_bf16((B, 37, 66, 256))
    ps4 = PixelShuffleUp(256, 4)
    pp = jax.tree_util.tree_map(lambda v: v.astype(jnp.bfloat16),
                                ps4.init(key, x0))
    timeit(jax.jit(lambda p, x: ps4.apply(p, x)), pp, x0,
           name="pixelshuffle 4x 256ch @37x66")


if __name__ == "__main__":
    import sys as _s
    if "--convs" in _s.argv:
        conv_variants()
    else:
        main()
