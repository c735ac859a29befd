"""Pallas segmented/plain cumulative sums for the fusion sort pipeline.

XLA's cumsum over the sorted-map payload costs 44-63 ms at 10.4M rows on v5e
(measured; it re-reads the full array per Hillis step). This kernel does one
HBM pass: a sequential 1-D grid over lane-blocks, per-block Hillis-Steele in
VMEM (17 steps on registers/VMEM, ~free next to HBM), and a (8, 1) carry in
VMEM scratch that survives across grid steps — TPU grids execute in order on
a core, which is exactly what a scan wants.

Layout contract: values arrive as a TUPLE of (N,) float32 columns (the
sorted-map convention), stacked here to (8, N) so the scan runs along lanes.
Flags mark segment STARTS; rows of a block before its first start receive the
carry, and the carry leaving a block is its last lane (which already folded
the incoming carry when the block contains no start).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too; guard for safety
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

_BLOCK = 1 << 16  # 65536 lanes per grid step ((8, B) f32 = 2 MB); 1<<17 blows
                  # VMEM once the Hillis-step temporaries are accounted for
_ROWS = 8         # sublane-aligned row count; callers use <= 8 columns


def _segscan_kernel(f_ref, v_ref, o_ref, carry_ref):
    # 2-D grid (axon rejects any single grid DIMENSION >= 128; bench scale is
    # ~160 blocks). TPU grids iterate sequentially, last dim fastest, so the
    # VMEM carry still flows in block order; init fires on the first step.
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    v = v_ref[...]                      # (8, B)
    g = f_ref[...]                      # (1, B) 1.0 at segment starts
    d = 1
    while d < v.shape[1]:
        vs = jnp.concatenate([jnp.zeros((v.shape[0], d), v.dtype),
                              v[:, :-d]], axis=1)
        gs = jnp.concatenate([jnp.zeros((1, d), g.dtype), g[:, :-d]], axis=1)
        v = v + (1.0 - g) * vs
        g = jnp.maximum(g, gs)
        d *= 2
    out = v + carry_ref[...] * (1.0 - g)  # g == "start seen at or before lane"
    o_ref[...] = out
    carry_ref[...] = out[:, -1:]


def _grid2d(blocks: int):
    """Factor a block count into a (g1, g2) grid with both dims < 128."""
    g1 = -(-blocks // 127)
    g2 = -(-blocks // g1)
    return g1, g2


@functools.partial(jax.jit, static_argnames=("block",))
def _segscan_tpu(vals8: jnp.ndarray, flags: jnp.ndarray, block: int):
    n = vals8.shape[1]
    g1, g2 = _grid2d(n // block)
    npad = g1 * g2 * block
    if npad != n:
        # Pad lanes: flag=1 starts a throwaway segment, values 0.
        vals8 = jnp.pad(vals8, ((0, 0), (0, npad - n)))
        flags = jnp.pad(flags, ((0, 0), (0, npad - n)), constant_values=1.0)
    idx = lambda i, j: (0, i * g2 + j)
    out = pl.pallas_call(
        _segscan_kernel,
        grid=(g1, g2),
        in_specs=[
            pl.BlockSpec((1, block), idx),
            pl.BlockSpec((_ROWS, block), idx),
        ],
        out_specs=pl.BlockSpec((_ROWS, block), idx),
        out_shape=jax.ShapeDtypeStruct((vals8.shape[0], npad), vals8.dtype),
        scratch_shapes=[pltpu.VMEM((_ROWS, 1), jnp.float32)],
    )(flags, vals8)
    return out[:, :n]


def segmented_cumsum_cols(cols: Tuple[jnp.ndarray, ...],
                          starts: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-segment inclusive prefix sums over up to 8 (N,) f32 columns.

    starts: (N,) bool, True at each segment's first row. Plain cumsum =
    all-False starts. Uses the Pallas single-pass kernel on TPU; elsewhere
    falls back to txr.ops.segment.segmented_cumsum (log-step XLA).
    """
    d = len(cols)
    assert 1 <= d <= _ROWS
    n = cols[0].shape[0]
    try:
        # Concrete arrays: dispatch on their actual placement.
        platform = cols[0].devices().pop().platform
    except Exception:
        # Tracers (inside jit) have no placement yet; use the process default.
        platform = jax.default_backend()
    if not _HAS_PLTPU or platform not in ("tpu", "axon"):
        from txr.ops.segment import segmented_cumsum
        out = segmented_cumsum(jnp.stack(cols, axis=1), starts)
        return tuple(out[:, i] for i in range(d))

    npad = -(-n // _BLOCK) * _BLOCK
    pad = npad - n
    stacked = jnp.stack(tuple(cols) + tuple(
        jnp.zeros_like(cols[0]) for _ in range(_ROWS - d)), axis=0)
    if pad:
        stacked = jnp.pad(stacked, ((0, 0), (0, pad)))
    f = starts.astype(jnp.float32)[None, :]
    if pad:
        f = jnp.pad(f, ((0, 0), (0, pad)), constant_values=1.0)
    out = _segscan_tpu(stacked, f, _BLOCK)
    return tuple(out[i, :n] for i in range(d))


def matmul_cumsum(x: jnp.ndarray, radix: int = 256) -> jnp.ndarray:
    """Inclusive column-wise cumsum of (N, D) f32 via MXU matmul-scan.

    A length-`radix` prefix sum is one (rows, radix) @ (radix, radix)
    upper-triangular-ones matmul — the scan dimension rides the LANE axis at
    full MXU utilization, versus XLA's log-step cumsum which re-reads the
    array per step (44-63 ms at 10.4M x 7 on v5e). Per-column matmuls keep
    the layout contiguous (no transposes); block totals recurse.

    Exactness: f32 matmul accumulation — same error class as sequential f32
    summation within each radix block. radix=256 measured best at 10.4M x 7
    on v5e (13.0 vs 14.6 hier / 16.6 r512).
    """
    n, d = x.shape
    if n <= radix:
        return jnp.cumsum(x, axis=0)
    nb = -(-n // radix)
    npad = nb * radix
    xp = jnp.pad(x, ((0, npad - n), (0, 0))) if npad != n else x
    tri = jnp.triu(jnp.ones((radix, radix), jnp.float32))
    within_cols = []
    totals = []
    for c in range(d):
        xc = xp[:, c].reshape(nb, radix)
        yc = jax.lax.dot(xc, tri, precision=jax.lax.Precision.HIGHEST)
        within_cols.append(yc)
        totals.append(yc[:, -1])
    prefix = matmul_cumsum(jnp.stack(totals, axis=1), radix)  # (nb, D) incl.
    prefix = prefix - jnp.stack(totals, axis=1)               # exclusive
    out = jnp.stack(
        [(within_cols[c] + prefix[:, c][:, None]).reshape(npad)
         for c in range(d)], axis=1)
    return out[:n] if npad != n else out
