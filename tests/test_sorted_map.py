"""Sorted-array voxel map tests (the scatter-free streaming map)."""

import numpy as np
import jax.numpy as jnp
import pytest

from txr.core.types import PointSet
from txr.fusion.sorted_map import (
    create_sorted_map,
    sorted_map_insert,
    sorted_map_points,
    sorted_map_size,
)


class TestSortedMap:
    def test_insert_and_read(self, rng):
        vm = create_sorted_map(1024, 0.1)
        xyz = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        vm = sorted_map_insert(vm, PointSet.from_numpy(xyz))
        n = int(sorted_map_size(vm))
        keys = np.unique(np.floor(xyz / 0.1).astype(int), axis=0)
        assert n == len(keys)  # exact: no hash collisions possible
        ox, _ = sorted_map_points(vm).to_numpy()
        assert len(ox) == n

    def test_averaging_across_inserts(self):
        vm = create_sorted_map(64, 1.0)
        vm = sorted_map_insert(vm, PointSet.from_numpy(
            np.array([[0.2, 0.2, 0.2]], np.float32)))
        vm = sorted_map_insert(vm, PointSet.from_numpy(
            np.array([[0.4, 0.4, 0.4]], np.float32)))
        ox, _ = sorted_map_points(vm).to_numpy()
        assert len(ox) == 1
        np.testing.assert_allclose(ox[0], [0.3, 0.3, 0.3], atol=1e-6)

    def test_matches_batch_oracle(self, rng):
        """Two incremental inserts == one big oracle pass."""
        a = rng.uniform(-2, 2, (300, 3)).astype(np.float32)
        b = rng.uniform(-2, 2, (400, 3)).astype(np.float32)
        vm = create_sorted_map(2048, 0.25)
        vm = sorted_map_insert(vm, PointSet.from_numpy(a))
        vm = sorted_map_insert(vm, PointSet.from_numpy(b))
        ox, _ = sorted_map_points(vm).to_numpy()

        both = np.concatenate([a, b])
        keys = np.floor(both / 0.25).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        means = np.zeros((len(uniq), 3))
        cnt = np.zeros(len(uniq))
        for i, g in enumerate(inv):
            means[g] += both[i]
            cnt[g] += 1
        means /= cnt[:, None]

        assert len(ox) == len(uniq)
        gi = np.lexsort(ox.T)
        ei = np.lexsort(means.T)
        # Prefix-sum reduction precision (see txr/ops/segment.py docstring).
        np.testing.assert_allclose(ox[gi], means[ei], rtol=2e-3, atol=1e-4)

    def test_negative_coords(self):
        """Absolute signed voxel coords — points straddling the origin."""
        vm = create_sorted_map(64, 1.0)
        xyz = np.array([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5]], np.float32)
        vm = sorted_map_insert(vm, PointSet.from_numpy(xyz))
        assert int(sorted_map_size(vm)) == 2  # (-1,-1,-1) and (0,0,0) voxels

    def test_capacity_overflow_drops_high_keys(self, rng):
        vm = create_sorted_map(16, 0.01)
        xyz = rng.uniform(0, 10, (500, 3)).astype(np.float32)
        vm = sorted_map_insert(vm, PointSet.from_numpy(xyz))
        assert int(sorted_map_size(vm)) == 16  # full, no crash
        # Map keys remain sorted ascending (deterministic low-key survivors).
        kx = np.asarray(vm.kx)
        assert (np.diff(kx) >= 0).all()

    def test_empty_insert(self):
        vm = create_sorted_map(32, 0.1)
        vm = sorted_map_insert(vm, PointSet.empty(50))
        assert int(sorted_map_size(vm)) == 0
