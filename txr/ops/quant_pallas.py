"""Fused W8A8 linear as a Pallas TPU kernel.

XLA's dynamic-quant pattern (rowmax -> round -> s8 dot -> rescale) wins per
matmul in isolation (tools/bench_int8_matmul.py: s8xs8 dot runs 226-279
GF/ms vs 138-158 bf16 on v5e) but loses its edge inside the full network,
where the quantize/rescale passes materialize extra HBM traffic instead of
fusing. This kernel does the whole thing in one HBM round trip:

  per (bm, bn) tile: read x (bm, K) bf16 from VMEM, rowmax + scale to int8
  IN REGISTERS, s8 x s8 -> s32 on the MXU, rescale by (row_scale x col_scale),
  add bias, write bf16.

Weights are quantized per output column OUTSIDE the kernel (one cheap XLA
pass over the unchanged bf16/f32 param tree per forward, ~25 MB/layer), so
checkpoints and converters stay untouched.

The activation quantization is recomputed for each N-tile of the same M rows
(N/bn times); that redundant VPU work is ~0.1% of the tile's MXU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from txr.ops.quant import quantize_weight


def _interpret() -> bool:
    return jax.default_backend() in ("cpu",)


def _kernel(x_ref, w_ref, s_ref, b_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)                 # (bm, K)
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.round(x / sx).astype(jnp.int8)
    acc = jax.lax.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * s_ref[0])    # (bm, bn)
    y = y + b_ref[0]
    o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def int8_linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None,
                block_m: int = 256, block_n: int = 512) -> jnp.ndarray:
    """y = x @ w + b with in-kernel W8A8 dynamic quantization.

    x: (..., K) float; w: (K, N) float (quantized per column here);
    b: (N,) or None. Returns x.dtype.
    """
    shape = x.shape
    k = shape[-1]
    n = w.shape[1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    wq, sw = quantize_weight(w)
    bias = jnp.zeros((n,), jnp.float32) if b is None else b.astype(jnp.float32)

    rem_m = (-m) % block_m
    if rem_m:
        x2 = jnp.pad(x2, ((0, rem_m), (0, 0)))
    mp = x2.shape[0]
    rem_n = (-n) % block_n
    if rem_n:
        wq = jnp.pad(wq, ((0, 0), (0, rem_n)))
        sw = jnp.pad(sw, (0, rem_n))
        bias = jnp.pad(bias, (0, rem_n))
    np_ = wq.shape[1]

    grid = (mp // block_m, np_ // block_n)
    out = pl.pallas_call(
        _kernel,
        interpret=_interpret(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
    )(x2, wq, sw.reshape(1, -1), bias.reshape(1, -1))
    return out[:m, :n].reshape(*shape[:-1], n)


class Int8DensePallas:
    """Marker namespace; the flax module lives in txr.ops.quant to keep one
    import site for both backends."""
