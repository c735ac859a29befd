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
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1.0e30


def _interpret() -> bool:
    """Pallas interpret mode on CPU so the test suite executes the kernels'
    exact logic (tiny shapes only); compiled path on TPU. Evaluated lazily —
    module import must not force backend initialization."""
    return jax.default_backend() in ("cpu",)


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
        interpret=_interpret(),
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


def _fused_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, block_k: int,
                  sm_scale: float, d: int):
    """Two heads per program, reading the fused (B, S, 3*H*D) qkv directly."""
    q2 = q_ref[0]                       # (block_q, 2d)
    sk = k_ref.shape[1]
    num_k = sk // block_k
    bq = q2.shape[0]
    outs = []
    for hh in (0, 1):
        q = q2[:, hh * d:(hh + 1) * d]

        def body(i, carry):
            acc, m_prev, l_prev = carry
            k = k_ref[0, pl.ds(i * block_k, block_k), hh * d:(hh + 1) * d]
            v = v_ref[0, pl.ds(i * block_k, block_k), hh * d:(hh + 1) * d]
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * sm_scale
            kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_k
            s = jnp.where(kidx < kv_len, s, _NEG_INF)
            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32)
            return acc, m_new, l_new

        acc0 = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        acc, _, l = jax.lax.fori_loop(0, num_k, body, (acc0, m0, l0))
        outs.append(acc / jnp.maximum(l, 1e-30))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def _fused_kernel_1pass(q_ref, k_ref, v_ref, o_ref, *, pad_count: int,
                        sm_scale: float, d: int, score_mode: str = "f32max"):
    """Two heads per program, full-K single pass, zero-pad normalizer trick.

    K/V are zero-padded to the block length. A zero K row gives logit exactly
    0 for every query, so instead of masking the (block_q, S) score matrix
    (3 VPU passes: iota, compare, select), the pad columns' softmax mass is
    removed analytically from the normalizer: l -= pad_count * exp(-m).
    No online-softmax carries either — max/exp/sum run once per program.
    (Caveat: if every VALID logit is below ~-80 the pad mass dominates and
    the output degrades to 0; scaled ViT logits never approach that.)

    The kernel is VPU/VMEM-pass-bound over the (block_q, S) score set
    (CLAUDE.md: ~3 passes ≈ 5.5 ms/layer-batch at bench shape), so
    score_mode trades score-pass bandwidth against softmax-shift policy:
      f32max   — f32 scores from the MXU, exact row max (16 B/elem moved).
      boundmax — the max pass is replaced by a per-row Cauchy-Schwarz bound
                 m = min(c*|q_r|*max_k|k|, 60) computed from the tiny (S, d)
                 operands (1/40th of a score pass), cutting score traffic to
                 12 B/elem with NO extra rounding (scores stay f32; softmax
                 is shift-invariant, so any row constant m is exact math).
                 exp2 arguments are clamped at +60 so p <= 2^60 and the f32
                 normalizer (<= S * 2^60) cannot overflow; the result is
                 EXACT standard softmax whenever scaled logits stay within
                 ~83 nats of the bound (ViT logits are +-~30; bf16's f32-
                 width exponent keeps 2^-126 tails representable), and
                 degrades to a saturated-but-finite approximation beyond —
                 the same assumption class as the zero-pad trick above.
    (A bf16-scores mode is impossible: Mosaic's tpu.matmul requires a
    32-bit accumulator, and a separate f32->bf16 convert pass costs more
    than the narrower reads save.)
    """
    q2 = q_ref[0]                       # (block_q, 2d)
    bq = q2.shape[0]
    # exp(s*scale - m) == exp2(s*scale*log2e - m'): fold log2e into the q
    # pre-scale so the inner loop uses the single-op exp2.
    c = sm_scale * 1.4426950408889634
    outs = []
    for hh in (0, 1):
        qf = q2[:, hh * d:(hh + 1) * d].astype(jnp.float32) * c
        q = qf.astype(q2.dtype)
        k = k_ref[0, :, hh * d:(hh + 1) * d]
        v = v_ref[0, :, hh * d:(hh + 1) * d]
        if score_mode == "f32max":
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)      # (bq, 1) f32
            p = jnp.exp2(s - m).astype(v.dtype)         # (bq, S) bf16
        elif score_mode == "boundmax":
            # m >= every |scaled logit| by Cauchy-Schwarz (q is pre-scaled
            # by c, so qn carries c); capped at 60 so the low tail stays
            # >= 2^-126 whenever some logit is within ~83 nats of the bound.
            qn = jnp.sqrt(jnp.sum(qf * qf, axis=1, keepdims=True))
            kf = k.astype(jnp.float32)
            kn = jnp.sqrt(jnp.max(jnp.sum(kf * kf, axis=1)))
            m = jnp.minimum(qn * kn, 60.0)              # (bq, 1) f32
            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            p = jnp.exp2(jnp.minimum(s - m, 60.0)).astype(v.dtype)
        else:  # pragma: no cover
            raise ValueError(f"unknown score_mode {score_mode!r}")
        # normalizer from the bf16 p (half the read bandwidth); f32 accum
        l = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
        if pad_count:
            # Each pad column contributed the bf16-ROUNDED exp2(-m) to l
            # (p was cast before the sum); subtract that identical rounded
            # value, not the exact f32 one — the pads' rounding errors are
            # all equal, so they add coherently and an exact-f32 correction
            # leaves a residual of up to pad_count * 2^-9 * 2^-m in l
            # [code-review r2].
            pad_p = jnp.exp2(-m).astype(v.dtype).astype(jnp.float32)
            l = l - pad_count * pad_p
        acc = jnp.dot(p, v, preferred_element_type=jnp.float32)
        outs.append(acc / jnp.maximum(l, 1e-30))
    o_ref[0] = jnp.concatenate(outs, axis=1).astype(o_ref.dtype)


def default_score_mode() -> str:
    """Score-pass dtype/max policy for the 1-pass kernel (see
    _fused_kernel_1pass). Overridable via TXR_ATTN_SCORES for experiments."""
    import os

    return os.environ.get("TXR_ATTN_SCORES", "f32max")


def attention_flash_fused(qkv: jnp.ndarray, num_heads: int, head_dim: int,
                          kv_len: int | None = None,
                          block_q: int = 512,
                          block_k: int | None = None,
                          score_mode: str | None = None) -> jnp.ndarray:
    """Transpose-free flash attention on the fused qkv projection.

    qkv: (B, S, 3*H*D) straight from the qkv Dense (component-major q|k|v) —
    no (B,S,H,D)→(B,H,S,D) relayouts anywhere; each program handles a PAIR of
    heads so blocks are 128 channels wide (TPU lane tiling). Requires an even
    head count (all DINOv2 presets qualify). Returns (B, S, H*D), ready for
    the output projection.

    This wrapper resolves the TXR_ATTN_SCORES default OUTSIDE the jit: the
    env var must not be read at trace time, or the first call's value would
    be baked into the cache entry for score_mode=None and later env changes
    silently ignored [code-review r2].
    """
    return _attention_flash_fused(
        qkv, num_heads=num_heads, head_dim=head_dim, kv_len=kv_len,
        block_q=block_q, block_k=block_k,
        score_mode=score_mode or default_score_mode())


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "head_dim", "kv_len",
                                    "block_q", "block_k", "score_mode"))
def _attention_flash_fused(qkv: jnp.ndarray, num_heads: int, head_dim: int,
                           kv_len: int | None,
                           block_q: int,
                           block_k: int | None,
                           score_mode: str) -> jnp.ndarray:
    b, s, c = qkv.shape
    h, d = num_heads, head_dim
    assert c == 3 * h * d and h % 2 == 0
    if kv_len is None:
        kv_len = s
    # Pad to a common multiple of both block sizes: the grid floor-divides
    # by block_q and the kernel by block_k, so a max() pad silently dropped
    # keys or left output rows unwritten for non-dividing combinations
    # [code-review r2, confirmed at S=700 with 512/768 blocks].
    mult = block_q if block_k is None else math.lcm(block_q, block_k)
    rem = (-s) % mult
    if rem:
        qkv = jnp.pad(qkv, ((0, 0), (0, rem), (0, 0)))
    sp = qkv.shape[1]
    hp = h // 2
    grid = (b, hp, sp // block_q)
    if block_k is None and kv_len == s:
        # Full-K single pass: at ViT sequence lengths the whole K/V pair fits
        # in VMEM. Dropping the online-softmax streaming loop and replacing
        # the pad mask with the zero-pad normalizer correction (see
        # _fused_kernel_1pass) cuts the kernel's VPU passes roughly in half.
        # Requires K rows past kv_len to be exactly zero — true for the
        # jnp.pad above, NOT for caller-truncated kv_len < s, hence the guard.
        kernel = functools.partial(_fused_kernel_1pass,
                                   pad_count=sp - kv_len,
                                   sm_scale=d ** -0.5, d=d,
                                   score_mode=score_mode)
    elif block_k is None:
        kernel = functools.partial(_fused_kernel, kv_len=kv_len, block_k=sp,
                                   sm_scale=d ** -0.5, d=d)
    else:
        kernel = functools.partial(_fused_kernel, kv_len=kv_len,
                                   block_k=block_k, sm_scale=d ** -0.5, d=d)
    out = pl.pallas_call(
        kernel,
        interpret=_interpret(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 2 * d),
                         lambda bi, hi, qi: (bi, qi, hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, 2 * d),
                         lambda bi, hi, qi: (bi, 0, hp + hi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, 2 * d),
                         lambda bi, hi, qi: (bi, 0, 2 * hp + hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, 2 * d),
                               lambda bi, hi, qi: (bi, qi, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sp, h * d), qkv.dtype),
    )(qkv, qkv, qkv)
    return out[:, :s]


def _fused_reference(qkv, num_heads, head_dim, kv_len=None):
    """XLA reference with identical (B,S,3HD)→(B,S,HD) contract."""
    b, s, _ = qkv.shape
    h, d = num_heads, head_dim
    parts = qkv.reshape(b, s, 3, h, d)
    q, k, v = (parts[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    o = attention_xla(q, k, v, kv_len=kv_len)
    return o.transpose(0, 2, 1, 3).reshape(b, s, h * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def fused_attention(qkv, num_heads, head_dim, kv_len=None):
    return attention_flash_fused(qkv, num_heads, head_dim, kv_len=kv_len)


def _fused_fwd(qkv, num_heads, head_dim, kv_len):
    return attention_flash_fused(qkv, num_heads, head_dim, kv_len=kv_len), qkv


def _fused_bwd(num_heads, head_dim, kv_len, qkv, g):
    _, vjp = jax.vjp(lambda x: _fused_reference(x, num_heads, head_dim, kv_len),
                     qkv)
    return vjp(g)


fused_attention.defvjp(_fused_fwd, _fused_bwd)


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
