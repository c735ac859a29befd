"""Tests for segmented scans and the at-ends segment reduction.

NumPy oracles per project convention; the Pallas kernel path
(txr.ops.scan) is exercised on TPU only — on the CPU test mesh it falls
back to the XLA log-step scan, which is itself oracle-tested here.
"""

import numpy as np

import jax
import jax.numpy as jnp

from txr.core.types import PointSet
from txr.ops.segment import (INT_MAX, segmented_cumsum,
                             sorted_segment_reduce_at_ends,
                             sorted_voxel_reduce)
from txr.ops.scan import segmented_cumsum_cols


def _oracle_segscan(x, s):
    ref = np.zeros_like(x)
    acc = np.zeros(x.shape[1])
    for i in range(len(x)):
        acc = x[i] + (0 if s[i] else acc)
        ref[i] = acc
    return ref


class TestSegmentedCumsum:
    def test_matches_oracle(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3000, 4)).astype(np.float32)
        s = rng.random(3000) < 0.07
        s[0] = True
        out = np.asarray(segmented_cumsum(jnp.asarray(x), jnp.asarray(s)))
        assert np.allclose(out, _oracle_segscan(x, s), atol=1e-4)

    def test_no_starts_is_plain_cumsum(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(513, 2)).astype(np.float32)
        s = np.zeros(513, bool)
        out = np.asarray(segmented_cumsum(jnp.asarray(x), jnp.asarray(s)))
        assert np.allclose(out, np.cumsum(x, 0), atol=1e-4)

    def test_cols_wrapper_matches_oracle(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2048, 7)).astype(np.float32)
        s = rng.random(2048) < 0.05
        s[0] = True
        cols = tuple(jnp.asarray(x[:, i]) for i in range(7))
        out = segmented_cumsum_cols(cols, jnp.asarray(s))
        got = np.stack([np.asarray(o) for o in out], 1)
        assert np.allclose(got, _oracle_segscan(x, s), atol=1e-4)


class TestAtEndsReduce:
    def _data(self, n=20000, seed=0):
        rng = np.random.default_rng(seed)
        kx = rng.integers(-40, 40, n).astype(np.int32)
        ky = rng.integers(-40, 40, n).astype(np.int32)
        kz = rng.integers(-4, 4, n).astype(np.int32)
        valid = rng.random(n) > 0.15
        kx[~valid] = INT_MAX
        ky[~valid] = INT_MAX
        kz[~valid] = INT_MAX
        cols = tuple(
            jnp.asarray(np.where(valid, rng.normal(size=n), 0.0).astype(np.float32))
            for _ in range(3)) + (jnp.asarray(valid.astype(np.float32)),)
        return kx, ky, kz, cols

    @staticmethod
    def _as_sets(o, drop_sentinel):
        okx, oky, okz, ocols, v = o
        v = np.asarray(v)
        if drop_sentinel:
            v = v & (np.asarray(okx) != INT_MAX)
        keys = np.stack([np.asarray(okx)[v], np.asarray(oky)[v],
                         np.asarray(okz)[v]], 1)
        vals = np.stack([np.asarray(c)[v] for c in ocols], 1)
        order = np.lexsort(keys.T[::-1])
        return keys[order], vals[order]

    def test_matches_compacting_reduce_when_capacity_suffices(self):
        kx, ky, kz, cols = self._data()
        cap = 60000  # > n: nothing truncated, results must agree as sets
        o1 = sorted_voxel_reduce(jnp.asarray(kx), jnp.asarray(ky),
                                 jnp.asarray(kz), cols, cap)
        o2 = sorted_segment_reduce_at_ends(jnp.asarray(kx), jnp.asarray(ky),
                                           jnp.asarray(kz), cols, cap)
        k1, v1 = self._as_sets(o1, True)   # old path emits the sentinel row
        k2, v2 = self._as_sets(o2, False)
        assert np.array_equal(k1, k2)
        assert np.abs(v1 - v2).max() < 1e-3

    def test_emits_in_sorted_position(self):
        """Non-compacted contract: valid rows carry strictly increasing keys
        and holes carry INT_MAX."""
        kx, ky, kz, cols = self._data(5000, 3)
        cap = 5000
        okx, oky, okz, _, v = sorted_segment_reduce_at_ends(
            jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(kz), cols, cap)
        v = np.asarray(v)
        key = (np.asarray(okx).astype(np.int64) * 10**6
               + np.asarray(oky).astype(np.int64) * 10**3
               + np.asarray(okz).astype(np.int64))
        kk = key[v]
        assert np.all(np.diff(kk) > 0)
        assert np.all(np.asarray(okx)[~v] == INT_MAX)
