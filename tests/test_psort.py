"""Bitonic network tests for the experimental Pallas sort (txr.ops.psort).

The networks are pure jnp functions, testable off-TPU; the pallas_call path
is TPU-only and its measured verdict is in the module docstring.
"""

import numpy as np

import jax.numpy as jnp

from txr.ops.psort import _bitonic_merge_block, _bitonic_sort_block


class TestBitonicNetworks:
    def test_sort_lexicographic_with_payload(self):
        rng = np.random.default_rng(0)
        B = 1024
        k1 = rng.integers(0, 50, B).astype(np.int32)
        k2 = rng.integers(0, 50, B).astype(np.int32)
        pay = rng.normal(size=B).astype(np.float32)
        cols = _bitonic_sort_block(
            [jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(pay)], 2, B)
        s1, s2, sp = [np.asarray(c) for c in cols]
        order = np.lexsort((k2, k1))
        assert np.array_equal(np.stack([s1, s2], 1),
                              np.stack([k1[order], k2[order]], 1))
        ref = sorted(zip(k1, k2, pay))
        got = sorted(zip(s1, s2, sp))
        assert all(a[0] == b[0] and a[1] == b[1] and abs(a[2] - b[2]) < 1e-6
                   for a, b in zip(ref, got))

    def test_sort_loop_variant_matches(self):
        rng = np.random.default_rng(1)
        B = 512
        k = rng.integers(-100, 100, B).astype(np.int32)
        unrolled = _bitonic_sort_block([jnp.asarray(k)], 1, B, unroll=True)
        looped = _bitonic_sort_block([jnp.asarray(k)], 1, B, unroll=False)
        assert np.array_equal(np.asarray(unrolled[0]), np.sort(k))
        assert np.array_equal(np.asarray(looped[0]), np.sort(k))

    def test_merge_of_two_sorted_runs(self):
        rng = np.random.default_rng(2)
        a = np.sort(rng.integers(0, 100, 512)).astype(np.int32)
        b = np.sort(rng.integers(0, 100, 512)).astype(np.int32)
        seq = np.concatenate([a, b[::-1]])  # bitonic
        out = _bitonic_merge_block([jnp.asarray(seq)], 1, 1024)
        assert np.array_equal(np.asarray(out[0]),
                              np.sort(np.concatenate([a, b])))

    def test_batched_2d_rows_independent(self):
        rng = np.random.default_rng(3)
        k = rng.integers(0, 1000, (8, 256)).astype(np.int32)
        out = _bitonic_sort_block([jnp.asarray(k)], 1, 256)
        assert np.array_equal(np.asarray(out[0]), np.sort(k, axis=1))
