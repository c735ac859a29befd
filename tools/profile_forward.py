#!/usr/bin/env python3
"""Decompose the ViT-L forward cost at bench shapes (B=16, 924x518).

Times, each as its own jitted program (one sync per rep loop):
  full model        — DepthAnythingFlax.apply (cached from profile_bench)
  encoder only      — ViTEncoder at (16, 2443, 1024)
  one block         — a single transformer Block
  attention kernel  — fused flash attention on the qkv tensor
  mlp               — fc1+gelu+fc2 at block shapes
Roofline: dense 23.6 TFLOP + attn 9.4 TFLOP per batch -> 168 ms at 197 TF/s.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from txr.models.depth_anything import build_model
from txr.models.vit import Block, ViTEncoder, VIT_PRESETS
from txr.ops.attention import fused_attention


def sync(x):
    if isinstance(x, (list, tuple)):
        x = x[0]
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, reps=10, name=""):
    r = fn(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:28s} {dt:8.2f} ms")
    return dt


def main():
    B, S, D = 16, 2443, 1024
    cfg = VIT_PRESETS["vitl"]
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    model, _, _ = build_model("v2", "vitl")
    params = model.init(key, jnp.zeros((1, 56, 56, 3), jnp.float32))["params"]
    params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    px = jnp.asarray(rng.normal(size=(B, 518, 924, 3)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))
    t_model = timeit(fwd, params, px, name="full model")

    enc = ViTEncoder(cfg)
    ep = {"params": params["encoder"]} if "encoder" in params else None
    if ep is None:
        # find the encoder scope name
        k = [k for k in params if "vit" in k.lower() or "encoder" in k.lower()]
        ep = {"params": params[k[0]]}
    efwd = jax.jit(lambda p, x: enc.apply(p, x))
    t_enc = timeit(efwd, ep, px, name="encoder (24 blocks+embed)")

    blk = Block(cfg)
    x = jnp.asarray(rng.normal(size=(B, S, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    bp = blk.init(key, x)
    bfwd = jax.jit(lambda p, x: blk.apply(p, x))
    t_blk = timeit(bfwd, bp, x, name="one block")

    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * D)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    afwd = jax.jit(lambda q: fused_attention(q, cfg.num_heads, D // cfg.num_heads))
    t_att = timeit(afwd, qkv, name="fused flash attention")

    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(4 * D)(x)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(D)(h)

    m = M()
    mp = m.init(key, x)
    mfwd = jax.jit(lambda p, x: m.apply(p, x))
    t_mlp = timeit(mfwd, mp, x, name="mlp (fc1+gelu+fc2)")

    qf = jax.jit(lambda p, x: jnp.einsum("bsd,df->bsf", x, p))
    wq = jnp.asarray(rng.normal(size=(D, 3 * D)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    t_qkv = timeit(qf, wq, x, name="qkv dense alone")

    print(f"\nper-block parts attn {t_att:.2f} + mlp {t_mlp:.2f} + qkv "
          f"{t_qkv:.2f} = {t_att + t_mlp + t_qkv:.2f} "
          f"(blk measured {t_blk:.2f}); 24 x blk = {24*t_blk:.1f} "
          f"vs encoder {t_enc:.1f} vs model {t_model:.1f} "
          f"-> dpt+embed {t_model - t_enc:.1f}")


if __name__ == "__main__":
    main()
