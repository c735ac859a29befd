"""Fused DPT output-head tail: bilinear resize + conv2 + ReLU + conv3.

The reference head (HF DepthAnything head; depth_processor.py:218-240 loads
the same DPTHead) ends with:

    y = conv1(y)                        # (B, Hin, Win, C)   [XLA, stays]
    y = resize_bilinear(y, H, W, align_corners=True)
    y = conv2_3x3(y); y = relu(y); y = conv3_1x1(y)   # -> (B, H, W, 1)

Run as separate XLA ops this materializes the resized activation in HBM —
(B, 518, 924, 128) bf16 ≈ 2 GB at B=16 — and the dense matmul-resize alone
measures 20 ms (tools/bench_resize_variants.py; 2-tap gathers are 2-3.5x
worse). This kernel fuses the whole tail so the big intermediate never
leaves VMEM.

Layout (chosen for Mosaic's indexing rules — dynamic indices on sublane
dims must be provably 8-aligned, so the data-dependent 2-tap H-lerp rides
the unconstrained OUTER dim, and the W-resize is a per-row 2-D matmul):

  grid (B, Hout/HBO), full W resident per step:
   1. H-lerp: HBO+2 output rows (incl. conv halo) as 2-tap lerps with
      dynamic OUTER-dim row indexing from a 2-block input window.
   2. W-resize: per-row (Wout, Win) @ (Win, C) MXU matmuls against a dense
      interpolation matrix (resize-as-matmul is the TPU-fast form), into a
      zero-edged scratch so conv2's W zero-padding is free.
   3. conv2: 3 packed matmuls (rows, C) @ (C, 3F) — one per H-tap, the 3
      W-taps packed along lanes — summed via static shifted slices.
   4. ReLU + conv3 (F -> 1) on the VPU; write (HBO, Wout) per step.

Input traffic ~3.5x the (B, Hin, Win, C) conv1 output (row-window halos);
output is the final (B, H, W) depth — >10x less HBM traffic than the
unfused tail.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

from txr.ops.resize import resize_bilinear

def _linear_matrix_np(out_size: int, in_size: int) -> np.ndarray:
    """Host-side (out, in) align_corners=True linear interpolation matrix —
    identical math to txr.ops.resize._linear_matrix, built with numpy so it
    stays concrete under jit tracing."""
    if out_size == 1:
        src = np.zeros((1,), np.float32)
    else:
        src = np.arange(out_size, dtype=np.float32) * (
            (in_size - 1) / (out_size - 1))
    base = np.floor(src)
    w = src - base
    lo = np.clip(base.astype(np.int64), 0, in_size - 1)
    hi = np.clip(lo + 1, 0, in_size - 1)
    M = np.zeros((out_size, in_size), np.float32)
    M[np.arange(out_size), lo] += 1.0 - w
    M[np.arange(out_size), hi] += w
    return M


HBO = 16   # output rows per grid step (sublane-aligned; grid overruns pad)
HBI = 16   # input-row block height; two consecutive blocks form the window


def _window_covers(hin: int, out_h: int) -> bool:
    """True iff every grid step's two-block input window covers all the
    rows its H-lerp taps need. The window starts at the HBI-aligned block
    containing the step's first tap, so large upsample ratios are safe but
    near-1 ratios and downsamples (roughly sh > (HBI-2)/(HBO+1)) can need
    rows past the window — the kernel's clips would then silently read
    WRONG rows [code-review r2, confirmed at 176->180]. Checked exactly,
    statically, per grid step; failures fall back to head_tail_reference.
    """
    if out_h < 2 or hin < 1:
        return False
    import math as _math

    sh = (hin - 1) / (out_h - 1)
    nhb = -(-out_h // HBO)
    nblk = -(-hin // HBI)
    for i in range(nhb):
        g0 = i * HBO - 1
        fl0 = _math.floor(g0 * sh)
        idx = min(max(fl0 // HBI, 0), nblk - 1)
        start = idx * HBI
        # tap rows are monotone in the output row, so the extremes suffice
        for ho in (0, HBO + 1):
            g = min(max(g0 + ho, 0), out_h - 1)
            lo = min(max(_math.floor(g * sh), 0), hin - 1)
            for r in (lo, min(lo + 1, hin - 1)):
                rl = r - start
                if rl < 0 or rl >= 2 * HBI:
                    return False
                if rl >= HBI and idx + 1 > nblk - 1:
                    return False  # second block clamps to the first
    return True
WSEG = 4   # W-resize matmul split into this many column segments: the
           # interpolation matrix is 2-tap banded, so each output segment
           # only reads a ~Win/WSEG + 2 input band — 2x fewer effective
           # MXU FLOPs than the dense (Wout, Win) form even after K padding


def _tail_kernel(x0_ref, x1_ref, mw_ref, w2_ref, b2_ref, w3_ref, o_ref,
                 xw_ref, *, hbo, hbi, hin, hout, wout, wr, feat, bands):
    """One (batch, H-block) step. Shapes (C = channels, F = conv2 features):
    x0/x1: (1, HBI, Win, C) input row-window halves
    mw:    (WSEG, WS, L) banded W-interpolation matrix segments; segment k
           holds Mw[k*WS:(k+1)*WS, bands[k]:bands[k]+L] (2-tap banded, so
           each output segment reads only a narrow input band)
    w2:    (3, C, 3F) conv2 kernel packed per W-tap, H-taps along lanes
    b2:    (1, F) bias; w3: (1, F) conv3 kernel (output dim 1)
    o:     (1, HBO, Wout) output block
    xw:    FLAT 2-D scratch (8 + (HBO+2)*WR + 8, C): resized row ho occupies
           the sublane stripe [8 + ho*WR, +WR) (8-aligned dynamic writes);
           the WR-wout zero tail of each stripe doubles as conv2's W zero
           padding, so every conv tap below is a STATIC 2-D slice — no
           reshapes, no dynamic misaligned indexing (both blow Mosaic's
           16 MB scoped-VMEM stack or its alignment rules).
    """
    i = pl.program_id(1)
    c = x0_ref.shape[3]
    sh = (hin - 1) / (hout - 1)

    # Window start must mirror the BlockSpec index computation exactly.
    g0 = i * hbo - 1
    fl0 = jnp.floor(g0 * sh).astype(jnp.int32)
    idx = jnp.clip(fl0 // hbi, 0, hin // hbi - 1)
    start = idx * hbi

    # Leading pad stripe (read by the dj=0 tap of output col 0) stays zero.
    xw_ref[0:8, :] = jnp.zeros((8, c), xw_ref.dtype)
    xw_ref[xw_ref.shape[0] - 8:, :] = jnp.zeros((8, c), xw_ref.dtype)

    # ---- 1+2. H-lerp (dynamic outer rows) then W-resize matmul ------------
    def lerp_resize(ho, _):
        g = g0 + ho                     # global output row (halo at ±1)
        src = g * sh
        fl = jnp.floor(src)
        frac = (src - fl).astype(jnp.float32)
        lo = jnp.clip(fl.astype(jnp.int32), 0, hin - 1)
        hi = jnp.clip(lo + 1, 0, hin - 1)
        lo_l = lo - start
        hi_l = hi - start
        valid = ((g >= 0) & (g < hout)).astype(jnp.float32)

        a0 = x0_ref[0, jnp.clip(lo_l, 0, hbi - 1)]          # (Win, C)
        a1 = x1_ref[0, jnp.clip(lo_l - hbi, 0, hbi - 1)]
        a = jnp.where(lo_l < hbi, a0, a1).astype(jnp.float32)
        b0 = x0_ref[0, jnp.clip(hi_l, 0, hbi - 1)]
        b1 = x1_ref[0, jnp.clip(hi_l - hbi, 0, hbi - 1)]
        bb = jnp.where(hi_l < hbi, b0, b1).astype(jnp.float32)
        row = (a * (1.0 - frac) + bb * frac) * valid        # (Win, C)

        # Segmented (WS, L) @ (L, C) matmuls: zero mw rows >= wout make the
        # stripe tail zero, which IS conv2's W zero padding.
        ws = mw_ref.shape[1]
        base = pl.multiple_of(8 + ho * wr, 8)
        for k, bk in enumerate(bands):
            yk = jnp.dot(mw_ref[k], row[bk:bk + mw_ref.shape[2]].astype(
                mw_ref.dtype), preferred_element_type=jnp.float32)
            xw_ref[pl.ds(base + k * ws, ws), :] = yk.astype(xw_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hbo + 2, lerp_resize, 0)

    # ---- 3. conv2: flat-stripe im2col — out(h, w) at flat r = h*WR + w
    # needs xw at r + di*WR + (dj - 1) relative to stripe h+0's base.
    # The three dj projections land at the SAME flat index (the shift is on
    # the input-slice side), so they sum full-width BEFORE the di slicing —
    # 3 lane-sliced adds instead of 9.
    nr = hbo * wr
    s = None
    for dj in range(3):
        rows = xw_ref[pl.ds(7 + dj, nr + 2 * wr), :]        # static slice
        proj = jax.lax.dot_general(
            rows, w2_ref[dj],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (nr+2WR, 3F)
        s = proj if s is None else s + proj
    acc = (s[0:nr, 0:feat]
           + s[wr:wr + nr, feat:2 * feat]
           + s[2 * wr:2 * wr + nr, 2 * feat:3 * feat])

    # ---- 4. bias, ReLU, conv3 ---------------------------------------------
    acc = jnp.maximum(acc + b2_ref[0][None, :], 0.0)
    out = jnp.sum(acc * w3_ref[0][None, :], axis=-1,
                  keepdims=True)                            # (nr, 1)
    o_ref[0] = out.reshape(hbo, wr)[:, :wout].astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("out_h", "out_w", "interpret"))
def fused_head_tail(x, w2, b2, w3, b3, out_h: int, out_w: int,
                    interpret: bool = False):
    """Fused resize(align_corners=True) + conv2(3x3, pad 1) + ReLU +
    conv3(1x1) for the DPT output head.

    x: (B, Hin, Win, C) conv1 output (bf16 or f32)
    w2: (3, 3, C, F), b2: (F,), w3: (1, 1, F, 1) or (F,), b3: (1,)
    Returns (B, out_h, out_w) pre-activation depth, dtype of x.
    """
    if jax.default_backend() == "cpu":
        interpret = True     # no Mosaic on CPU; tests run interpreted
    b, hin, win, c = x.shape
    # Shapes the fused kernel cannot serve route to the exact XLA
    # reference: H-windows that cannot cover the lerp taps (near-1 ratios /
    # downsamples), out_h == 1 (zero division in the ratio), and builds
    # without pltpu (the scratch/compiler params below need it).
    if not _HAS_PLTPU or not _window_covers(hin, out_h):
        return head_tail_reference(x, w2, b2, w3, b3, out_h, out_w)
    feat = w2.shape[-1]
    nhb = -(-out_h // HBO)     # grid may overrun; OOB writes are masked
    # Input row-blocks may overrun hin: the lerp taps clamp to hin-1, so
    # rows past the end are fetched but never indexed.
    nblk = -(-hin // HBI)
    sh = (hin - 1) / (out_h - 1)

    dt = x.dtype
    # Stripe width: >= out_w + 1 so each stripe ends in zeros (the dj=+1
    # conv halo), divisible into WSEG 8-aligned segments.
    wr = -(-(out_w + 1) // (8 * WSEG)) * (8 * WSEG)
    ws = wr // WSEG
    mw_full = _linear_matrix_np(out_w, win)
    mw_full = np.pad(mw_full, ((0, wr - out_w), (0, 0)))    # zero tail rows
    # Banded segments: per output segment, the 2-tap rows only touch a
    # narrow input band. Compute exact per-segment bands + a common width.
    sw = (win - 1) / max(out_w - 1, 1)
    starts, ends = [], []
    for k in range(WSEG):
        lo_c = max(min(k * ws, out_w - 1), 0)
        hi_c = min((k + 1) * ws - 1, out_w - 1)
        starts.append((int(np.floor(lo_c * sw)) // 8) * 8)
        ends.append(min(int(np.floor(hi_c * sw)) + 2, win))
    L = -(-max(e - s for s, e in zip(starts, ends)) // 8) * 8
    L = min(L, win)
    bands = tuple(min(s, win - L) for s in starts)
    mseg = np.stack([mw_full[k * ws:(k + 1) * ws, b:b + L]
                     for k, b in enumerate(bands)])
    mw = jnp.asarray(mseg, dt)                              # (WSEG, WS, L)
    # Pack per W-tap (dj): lanes hold the 3 H-tap (di) channel blocks.
    w2p = jnp.transpose(w2, (1, 2, 0, 3)).reshape(3, c, 3 * feat).astype(dt)
    w3v = w3.reshape(-1)[:feat].astype(jnp.float32).reshape(1, feat)
    b2v = b2.astype(jnp.float32).reshape(1, feat)

    def hidx(bi, i):
        g0 = i * HBO - 1
        fl0 = jnp.floor(g0 * sh).astype(jnp.int32)
        return jnp.clip(fl0 // HBI, 0, nblk - 1)

    out = pl.pallas_call(
        partial(_tail_kernel, hbo=HBO, hbi=HBI, hin=hin, hout=out_h,
                wout=out_w, wr=wr, feat=feat, bands=bands),
        grid=(b, nhb),
        in_specs=[
            pl.BlockSpec((1, HBI, win, c),
                         lambda bi, i: (bi, hidx(bi, i), 0, 0)),
            pl.BlockSpec((1, HBI, win, c),
                         lambda bi, i: (bi, jnp.minimum(hidx(bi, i) + 1,
                                                        nblk - 1), 0, 0)),
            pl.BlockSpec((WSEG, ws, L), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((3, c, 3 * feat), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((1, feat), lambda bi, i: (0, 0)),
            pl.BlockSpec((1, feat), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, HBO, out_w),
                               lambda bi, i: (bi, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, out_h, out_w), dt),
        scratch_shapes=[
            pltpu.VMEM((8 + (HBO + 2) * wr + 8, c), dt),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            # The conv's packed tap-projections keep ~38 MB of f32
            # temporaries live; v5e has 128 MB of physical VMEM and this
            # kernel's DMA (2 x 1 MB input blocks/step) needs little
            # double-buffer headroom, so raise the default 16 MB scoped cap.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, x, mw, w2p, b2v, w3v)
    return out + b3.reshape(-1)[0].astype(dt)


def head_tail_reference(x, w2, b2, w3, b3, out_h: int, out_w: int):
    """Pure-XLA reference with the exact unfused head semantics
    (txr/models/dpt.py: resize -> conv2 -> relu -> conv3)."""
    y = resize_bilinear(x, out_h, out_w, align_corners=True)
    y = jax.lax.conv_general_dilated(
        y, w2.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(y.dtype)
    y = jax.nn.relu(y + b2.astype(y.dtype))
    f = w3.reshape(-1, 1)
    out = jnp.einsum("bhwf,fo->bhwo", y, f.astype(y.dtype),
                     preferred_element_type=jnp.float32)
    return (out[..., 0] + b3.reshape(-1)[0]).astype(x.dtype)
