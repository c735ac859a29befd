"""Flat-stripe 3x3 convolution kernel (NHWC, pad 1, optional input ReLU).

XLA's conv lowering runs the DPT head's 3x3 convs at ~45% of bf16 MXU peak
on v5e (tools/profile_dpt.py: 8.1 ms vs 3.7 floor at 148x264x256; the
output-head conv1 ~17 ms vs 7.5). This kernel reaches near-peak by casting
the conv as THREE big (rows, C) @ (C, 3F) matmuls — K=C and N=3F are full
MXU tiles at the head shapes (256->3*256, 256->3*128):

  rows live in a flat 2-D VMEM scratch where each image row occupies an
  8-aligned stripe of WR >= W+1 sublanes; the zero stripe tail doubles as
  the conv's W zero padding, so the tap at (di, dj) of output (h, w) is the
  scratch row h*WR + w shifted by a STATIC offset di*WR + (dj-1). The three
  dj projections land at the same flat index (the shift rides the input
  slice), so they sum full-width before the three di lane-slices.

Input arrives zero-padded to (B, Hp, W, C) with the image at rows
[1, 1+H): the kernel's two row-block refs (grid index i and i+1) then cover
every output block's halo with plain integer indexing, at exactly 2x input
read traffic.

Used for the DPT ResidualConvUnit pair and the output-head conv1
(txr/models/dpt.py); reference equivalent: the HF DPT head convs the
reference loads via depth_processor.py:218-240.
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

HBO = 16   # output rows per grid step


def _conv3_kernel(x0_ref, x1_ref, w_ref, b_ref, o_ref, xs_ref, *,
                  hbo, h, w, wr, feat, relu_in):
    """x0/x1: (1, HBO, W, C) padded-row blocks i and i+1.
    w: (3, C, 3F) packed per W-tap (dj), H-taps (di) along lanes.
    b: (1, F). o: (1, HBO, W, F). xs: flat stripes (8 + (HBO+2)*WR + 8, C).
    """
    c = x0_ref.shape[3]
    zpad = jnp.zeros((wr - w, c), jnp.float32)

    xs_ref[0:8, :] = jnp.zeros((8, c), xs_ref.dtype)
    xs_ref[xs_ref.shape[0] - 8:, :] = jnp.zeros((8, c), xs_ref.dtype)

    def copy_row(ho, _):
        a0 = x0_ref[0, jnp.clip(ho, 0, hbo - 1)]
        a1 = x1_ref[0, jnp.clip(ho - hbo, 0, hbo - 1)]
        row = jnp.where(ho < hbo, a0, a1).astype(jnp.float32)
        if relu_in:
            row = jnp.maximum(row, 0.0)
        rowp = jnp.concatenate([row, zpad], axis=0)
        base = pl.multiple_of(8 + ho * wr, 8)
        xs_ref[pl.ds(base, wr), :] = rowp.astype(xs_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hbo + 2, copy_row, 0)

    nr = hbo * wr
    s = None
    for dj in range(3):
        rows = xs_ref[pl.ds(7 + dj, nr + 2 * wr), :]
        proj = jax.lax.dot_general(
            rows, w_ref[dj],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = proj if s is None else s + proj
    acc = (s[0:nr, 0:feat]
           + s[wr:wr + nr, feat:2 * feat]
           + s[2 * wr:2 * wr + nr, 2 * feat:3 * feat])
    acc = acc + b_ref[0][None, :]
    o_ref[0] = acc.reshape(hbo, wr, feat)[:, :w, :].astype(o_ref.dtype)


@partial(jax.jit, static_argnames=("relu_in", "interpret"))
def conv3x3_stripe(x, w, b, relu_in: bool = False, interpret: bool = False):
    """3x3 'same' conv (zero pad 1), NHWC; optionally ReLU the input first
    (the DPT ResidualConvUnit's pre-activation).

    x: (B, H, W, C); w: (3, 3, C, F) HWIO; b: (F,).
    Returns (B, H, W, F) in x's dtype (f32 accumulation inside).
    """
    if jax.default_backend() == "cpu":
        interpret = True     # no Mosaic on CPU; tests run interpreted
    bsz, h, w_, c = x.shape
    feat = w.shape[-1]
    dt = x.dtype
    nhb = -(-h // HBO)
    # Rows at padded positions [1, 1+h); block (i+1) must exist for the last
    # block, so pad the row count to (nhb + 1) * HBO.
    hp = (nhb + 1) * HBO
    xp = jnp.zeros((bsz, hp, w_, c), dt).at[:, 1:1 + h].set(x)
    wr = -(-(w_ + 1) // 8) * 8
    wp = jnp.transpose(w, (1, 2, 0, 3)).reshape(3, c, 3 * feat).astype(dt)
    bv = b.astype(jnp.float32).reshape(1, feat)

    out = pl.pallas_call(
        partial(_conv3_kernel, hbo=HBO, h=h, w=w_, wr=wr, feat=feat,
                relu_in=relu_in),
        grid=(bsz, nhb),
        in_specs=[
            pl.BlockSpec((1, HBO, w_, c), lambda bi, i: (bi, i, 0, 0)),
            pl.BlockSpec((1, HBO, w_, c), lambda bi, i: (bi, i + 1, 0, 0)),
            pl.BlockSpec((3, c, 3 * feat), lambda bi, i: (0, 0, 0)),
            pl.BlockSpec((1, feat), lambda bi, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, HBO, w_, feat),
                               lambda bi, i: (bi, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, nhb * HBO, w_, feat), dt),
        scratch_shapes=[
            pltpu.VMEM((8 + (HBO + 2) * wr + 8, c), dt),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, xp, wp, bv)
    return out[:, :h]


def conv3x3_reference(x, w, b, relu_in: bool = False):
    """XLA oracle with identical semantics."""
    y = jnp.maximum(x, 0) if relu_in else x
    out = jax.lax.conv_general_dilated(
        y, w.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)).astype(x.dtype)
