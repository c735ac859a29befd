"""W8A8 dynamic quantization for MXU int8 matmuls.

v5e executes s8 x s8 -> s32 on the MXU at ~2x bf16 throughput (measured in
tools/bench_int8_matmul.py). This module provides the standard
dynamic-activation / static-per-channel-weight recipe:

  weight:     per-output-column symmetric int8, scale = colmax(|W|)/127
  activation: per-row (per-token) symmetric int8 computed inside the jitted
              forward, scale = rowmax(|x|)/127
  y = (x_q @ W_q) * (s_x ⊗ s_w) + b     (accumulated in int32, rescaled f32)

Weight quantization happens in-jit from the same f32/bf16 param tree the
bf16 path uses (one elementwise pass over the weights, ~1 ms for all of
ViT-L on v5e — negligible next to the matmuls it accelerates), so checkpoint
layout, conversion, and initializers are untouched; int8 is a pure runtime
policy flag.

Accuracy: ViT blocks quantize only post-LayerNorm / post-nonlinearity
activations (the matmul inputs), which are well-ranged; the residual stream
itself stays bf16/f32. The depth-output error bound vs the f32 forward is
pinned by tests/test_quant.py.

The reference runs its encoder in fp16/fp32 (torch, depth_processor.py); an
int8 path is a TPU-native extension, opt-in via ViTConfig.quant.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """(K, N) float -> (int8 (K, N), f32 (N,) per-column scale)."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0) / 127.0
    s = jnp.maximum(s, 1e-12)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127
                  ).astype(jnp.int8)
    return wq, s


def int8_matmul(x: jnp.ndarray, wq: jnp.ndarray, sw: jnp.ndarray,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dynamic per-row W8A8 matmul: x (..., K) @ wq (K, N) -> (..., N)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1]).astype(jnp.float32)
    sx = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-12)
    xq = jnp.round(x2 / sx).astype(jnp.int8)
    y = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * sw)
    return y.astype(out_dtype).reshape(*shape[:-1], wq.shape[-1])


class Int8Dense(nn.Module):
    """Drop-in nn.Dense with an int8 MXU forward.

    Identical param tree ("kernel" (K, N), "bias" (N,)) so a module tree can
    flip between nn.Dense and Int8Dense without touching checkpoints.
    """

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        wq, sw = quantize_weight(k)
        y = int8_matmul(x, wq, sw, out_dtype=x.dtype)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class Int8DensePallas(nn.Module):
    """nn.Dense-compatible dense layer backed by the fused Pallas W8A8
    kernel (txr.ops.quant_pallas.int8_linear): activation quantization
    happens in-register inside the matmul kernel instead of as separate XLA
    passes. Same param tree as nn.Dense/Int8Dense."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from txr.ops.quant_pallas import int8_linear

        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features))
        b = (self.param("bias", nn.initializers.zeros, (self.features,))
             if self.use_bias else None)
        return int8_linear(x, k, b)
