"""Multi-head attention: Pallas flash-attention kernel + XLA fallback.

The ViT encoder's attention over (518/14)^2 + 1 = 1370 patch tokens is the
hottest op in the depth model (SURVEY §5.7: single-chip flash attention
suffices — no sequence parallelism needed at this length). The Pallas kernel
implements the standard online-softmax streaming formulation: Q blocks stay
resident in VMEM while K/V blocks stream through, carrying running max and
normalizer. Padded key positions (sequences rounded up to the block size) are
masked with a large negative logit.

The XLA einsum path is used on CPU (tests), for tiny shapes, and under
autodiff (the Pallas kernel is forward-only for now).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1.0e30


def attention_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  kv_len: int | None = None) -> jnp.ndarray:
    """Reference attention. q, k, v: (B, H, S, D). Returns (B, H, S, D)."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kv_len is not None and kv_len < k.shape[2]:
        kidx = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 3)
        logits = jnp.where(kidx < kv_len, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int,
                  sm_scale: float):
    """One Q block against the full K/V stream with online softmax.

    Matmuls run in the input dtype (bf16 on the inference path — 2x MXU rate)
    with f32 accumulation; softmax statistics stay f32.
    """
    q = q_ref[0]                                      # (block_q, d)
    block_q, d = q.shape
    num_k = k_ref.shape[1] // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
        kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
        s = jnp.where(kidx < kv_len, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)               # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                                   # (bq, bk) f32
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kv_len", "block_q", "block_k"))
def attention_flash(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    kv_len: int | None = None,
                    block_q: int = 512, block_k: int = 512) -> jnp.ndarray:
    # 512x512 blocks measured ~3x faster than 256x256 at ViT shapes on v5e
    # (less K/V re-streaming per query block).
    """Pallas flash attention. q, k, v: (B, H, S, D); S padded internally."""
    b, h, s, d = q.shape
    if kv_len is None:
        kv_len = s

    def pad_to(x, m, axis):
        rem = (-x.shape[axis]) % m
        if rem == 0:
            return x
        pads = [(0, 0)] * x.ndim
        pads[axis] = (0, rem)
        return jnp.pad(x, pads)

    qp = pad_to(q, block_q, 2)
    kp = pad_to(k, block_k, 2)
    vp = pad_to(v, block_k, 2)
    sq = qp.shape[2]
    sk = kp.shape[2]

    bh = b * h
    qp = qp.reshape(bh, sq, d)
    kp = kp.reshape(bh, sk, d)
    vp = vp.reshape(bh, sk, d)

    grid = (bh, sq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, kv_len=kv_len, block_k=block_k,
                          sm_scale=d ** -0.5),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, sq, d)[:, :, :s, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_with_vjp(q, k, v, kv_len):
    return attention_flash(q, k, v, kv_len=kv_len)


def _flash_fwd(q, k, v, kv_len):
    return attention_flash(q, k, v, kv_len=kv_len), (q, k, v)


def _flash_bwd(kv_len, res, g):
    # Backward recomputes through the XLA reference (cheap at 1370 tokens);
    # the Pallas kernel stays forward-only.
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: attention_xla(a, b, c, kv_len), q, k, v)
    return vjp(g)


_flash_with_vjp.defvjp(_flash_fwd, _flash_bwd)


def multi_head_attention(q, k, v, kv_len: int | None = None,
                         use_flash: bool | None = None):
    """Dispatch: Pallas flash kernel on TPU (differentiable via XLA-recompute
    backward), XLA einsum on CPU or when forced off."""
    if use_flash is None:
        use_flash = jax.default_backend() not in ("cpu",)
    if use_flash:
        return _flash_with_vjp(q, k, v, kv_len)
    return attention_xla(q, k, v, kv_len=kv_len)
