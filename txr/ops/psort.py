"""Pallas multi-column sort for the fusion pipeline (TPU).

jax.lax.sort dominates the sorted-map insert: 147 ms for 3 keys + 7 payload
columns at 10.4M rows on v5e, 63 ms for the 2-column compaction sort
(measured; see txr/ops/segment.py). This module re-derives the sort as the
classic two-phase scheme GPUs use, adapted to TPU's strengths (big vector
compare/selects, sequential grids, async DMA) and allergies (no scatter, no
per-element addressing):

  Phase 1 — block sort: grid over VMEM-sized blocks of B rows; a full
  bitonic sorting network (log^2 B compare-exchange substages) runs on the
  (C, B) column stack entirely in VMEM. Every substage is a reshape to
  (C, chunks, 2, d) + one lexicographic key compare + per-column selects —
  data-independent, so Mosaic sees straight-line vector code.

  Phase 2 — merge passes: ceil(log2(N/B)) passes; each pass merges adjacent
  sorted runs via MERGE-PATH partitioning: for every output block, binary
  searches (done OUTSIDE the kernel in XLA on ~N/B diagonals — hundreds of
  queries, not millions, so TPU-cheap) yield the input offsets such that
  output block j is exactly the merge of A[a_j:a_{j+1}] and B[b_j:b_{j+1}].
  The kernel gets those offsets as scalar-prefetch arguments, DMAs one
  B-row window from each run, masks the tails to INT_MAX, and runs a single
  bitonic MERGE (log 2B substages) — emitting exactly B sorted rows.

Keys are int32, ascending, lexicographic over the first `num_keys` columns;
payload columns are any 4-byte dtype. Rows with all-INT_MAX keys must carry
zero/ignorable payload (the fusion convention) since masked window tails are
indistinguishable from them.

STATUS — measured dead end on v5e, kept as documented experiment: phase 1
alone costs 72 ms at 4.2M rows x 10 columns while XLA's COMPLETE lax.sort of
the same operands costs 63.5 ms. The lane-rotate compare-exchange (Mosaic
rejects the reshape formulation) runs the VPU far below its throughput, and
phase 2 could only add cost on top. Revisit only if Mosaic grows cheap
sub-lane shuffles or a native sort primitive. See CLAUDE.md "Measured DEAD
ENDS".
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INT_MAX = jnp.iinfo(jnp.int32).max


def _roll(x, shift, axis):
    """Lane roll that lowers to tpu.rotate inside Pallas kernels.

    jnp.roll on small/1-D operands lowers to slice+concatenate, which Mosaic
    rejects ("input offsets outside of the first tile"); pltpu.roll is the
    native rotate. Outside a kernel (pure-function tests, CPU fallbacks)
    jnp.roll is used.
    """
    try:
        return pltpu.roll(x, shift % x.shape[axis], axis)
    except Exception:  # not inside a TPU pallas trace
        return jnp.roll(x, shift, axis)


def _key_less(xk, yk):
    """Lexicographic x < y over tuples of equal-shape int32 arrays."""
    less = None
    eq = None
    for a, b in zip(xk, yk):
        this_less = a < b
        if less is None:
            less, eq = this_less, (a == b)
        else:
            less = less | (eq & this_less)
            eq = eq & (a == b)
    return less


def _substage(cols, num_keys, d, desc):
    """One compare-exchange at XOR-distance d over (..., B) columns.

    Mosaic rejects the textbook (chunks, 2, d) reshapes ("unsupported shape
    cast" for sub-lane minor dims), so the pair exchange is expressed as two
    lane ROTATIONS + parity masks instead: element i's partner i^d is
    roll(x, -d) when bit_d(i)=0 and roll(x, +d) when set. Wrap-around lanes
    are never selected because B is a multiple of 2d. desc: bool array
    broadcastable to the column shape (True = pair sorts descending); ties
    keep the original element on BOTH sides, which keeps the exchange
    consistent without a tiebreak column.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, cols[0].shape, cols[0].ndim - 1)
    upper = (idx & d) != 0
    axis = cols[0].ndim - 1
    theirs = [jnp.where(upper, _roll(c, d, axis), _roll(c, -d, axis))
              for c in cols]
    mine_keys = tuple(cols[:num_keys])
    their_keys = tuple(theirs[:num_keys])
    t_lt_m = _key_less(their_keys, mine_keys)
    m_lt_t = _key_less(mine_keys, their_keys)
    # Boolean algebra instead of where() on i1 vectors — Mosaic lacks the
    # i8->i1 truncation that select_n on bools lowers to.
    want_theirs_asc = (upper & m_lt_t) | (~upper & t_lt_m)
    want_theirs_desc = (upper & t_lt_m) | (~upper & m_lt_t)
    want_theirs = (desc & want_theirs_desc) | (~desc & want_theirs_asc)
    return [jnp.where(want_theirs, t, m) for m, t in zip(cols, theirs)]


def _bitonic_sort_block(cols, num_keys, B, unroll: bool = True):
    """Full bitonic sort of (..., B) columns along the last axis, ascending.

    Classic network: a pair at distance 2^j inside a length-2^k run sorts
    descending iff bit k of the lane index is 1. unroll=False runs the
    log^2 B substages as nested fori_loops with traced distances (dynamic
    lane rotates) — a ~30-op kernel graph instead of ~20k, which the Mosaic
    compiler needs at large grids.
    """
    logB = B.bit_length() - 1
    idx = jax.lax.broadcasted_iota(jnp.int32, cols[0].shape, cols[0].ndim - 1)
    if unroll:
        for k in range(1, logB + 1):
            desc = (idx & (1 << k)) != 0
            for j in range(k - 1, -1, -1):
                cols = _substage(cols, num_keys, 1 << j, desc)
        return cols

    def outer(k, carry):
        desc = ((idx >> k) & 1) != 0

        def inner(t, carry2):
            d = 1 << (k - 1 - t)
            return tuple(_substage(list(carry2), num_keys, d, desc))

        return jax.lax.fori_loop(0, k, inner, carry)

    return list(jax.lax.fori_loop(1, logB + 1, outer, tuple(cols)))


def _bitonic_merge_block(cols, num_keys, M):
    """Ascending bitonic merge of a length-M BITONIC sequence along lanes."""
    logM = M.bit_length() - 1
    desc = jnp.zeros(cols[0].shape, jnp.bool_)
    for j in range(logM - 1, -1, -1):
        cols = _substage(cols, num_keys, 1 << j, desc)
    return cols


# --------------------------------------------------------------------------
# Phase 1: block sort kernel
# --------------------------------------------------------------------------

_SUBLANES = 8  # sort 8 independent blocks per grid step: a (1, B) operand
               # wastes 7/8 of every vreg's sublanes (measured 300 ms vs 72
               # at 10.5M x 10 cols). (32, B) blocks and grids >= 128 both
               # crash the axon compile helper — stay at 8 x <=64.


def _block_sort_kernel(num_keys, n_cols, B, *refs):
    in_refs = refs[:n_cols]
    out_refs = refs[n_cols:]
    cols = [r[...] for r in in_refs]  # (8, B): 8 independent blocks
    cols = _bitonic_sort_block(cols, num_keys, B, unroll=False)
    for o, c in zip(out_refs, cols):
        o[...] = c


@functools.partial(jax.jit, static_argnames=("num_keys", "block"))
def _phase1(operands: Tuple[jnp.ndarray, ...], num_keys: int, block: int):
    n = operands[0].shape[0]
    n_cols = len(operands)
    rows = n // block
    grid = rows // _SUBLANES
    kern = functools.partial(_block_sort_kernel, num_keys, n_cols, block)
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[pl.BlockSpec((_SUBLANES, block), lambda i: (i, 0))] * n_cols,
        out_specs=[pl.BlockSpec((_SUBLANES, block), lambda i: (i, 0))] * n_cols,
        out_shape=[jax.ShapeDtypeStruct((rows, block), o.dtype)
                   for o in operands],
    )(*[o.reshape(rows, block) for o in operands])
    return out


def sort_blocks(operands: Sequence[jnp.ndarray], num_keys: int = 1,
                block: int = 8192) -> Tuple[jnp.ndarray, ...]:
    """Sort each consecutive `block`-row chunk independently (phase 1 only).

    Input length must be a multiple of 8*block (pad with INT_MAX keys)."""
    out = _phase1(tuple(operands), num_keys, block)
    return tuple(o.reshape(-1) for o in out)
