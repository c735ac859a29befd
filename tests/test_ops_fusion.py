"""Unit tests for the fusion-slice ops against NumPy oracles.

The oracles re-derive the reference formulas (SURVEY §2.1/§2.3): normalized
pixel grids, camera→world via R^T (P - t), per-voxel averaging, and
Open3D-style statistical outlier removal.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from txr.core.types import PointSet, concatenate
from txr.ops.backproject import backproject, backproject_world, transform_to_world
from txr.ops.voxel import voxel_downsample
from txr.ops.outlier import knn_mean_distance, remove_statistical_outliers


def _oracle_backproject(depth, rgb, fx, fy, cx, cy, min_d, max_d, scale, stride):
    d = depth[::stride, ::stride] * scale
    c = rgb[::stride, ::stride].astype(np.float64) / 255.0
    h, w = d.shape
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float64) * stride
    x = (uu - cx) / fx * d
    y = (vv - cy) / fy * d
    valid = (d > min_d) & (d < max_d) & np.isfinite(d)
    xyz = np.stack([x, y, d], -1).reshape(-1, 3)[valid.reshape(-1)]
    col = c.reshape(-1, 3)[valid.reshape(-1)]
    return xyz, col


class TestBackproject:
    def test_matches_oracle(self, rng):
        h, w = 48, 64
        depth = rng.uniform(0.05, 5.0, (h, w)).astype(np.float32)
        depth[0, 0] = np.nan
        depth[1, 1] = 100.0  # beyond max
        rgb = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        fx, fy, cx, cy = 50.0, 52.0, 32.0, 24.0

        ps = backproject(jnp.asarray(depth), jnp.asarray(rgb), fx, fy, cx, cy,
                         0.1, 50.0, 1.0, 1)
        got_xyz, got_rgb = ps.to_numpy()
        exp_xyz, exp_rgb = _oracle_backproject(depth, rgb, fx, fy, cx, cy, 0.1, 50.0, 1.0, 1)
        np.testing.assert_allclose(got_xyz, exp_xyz, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got_rgb, exp_rgb, rtol=1e-5, atol=1e-5)

    def test_stride(self, rng):
        depth = rng.uniform(0.5, 5.0, (32, 32)).astype(np.float32)
        rgb = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        ps = backproject(jnp.asarray(depth), jnp.asarray(rgb), 30.0, 30.0, 16.0, 16.0,
                         0.1, 50.0, 1.0, 4)
        assert ps.capacity == 8 * 8
        exp_xyz, _ = _oracle_backproject(depth, rgb, 30.0, 30.0, 16.0, 16.0, 0.1, 50.0, 1.0, 4)
        got_xyz, _ = ps.to_numpy()
        np.testing.assert_allclose(got_xyz, exp_xyz, rtol=1e-5, atol=1e-5)

    def test_world_transform(self, rng):
        # Rotation about z by 90deg plus translation.
        theta = np.pi / 2
        R = np.array([[np.cos(theta), -np.sin(theta), 0],
                      [np.sin(theta), np.cos(theta), 0],
                      [0, 0, 1.0]], dtype=np.float32)
        t = np.array([1.0, -2.0, 0.5], np.float32)
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        ps = PointSet.from_numpy(pts)
        out = transform_to_world(ps, jnp.asarray(R), jnp.asarray(t))
        got, _ = out.to_numpy()
        exp = (R.T @ (pts - t).T).T
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-5)

    def test_depth_scale(self, rng):
        depth = rng.uniform(0.5, 5.0, (16, 16)).astype(np.float32)
        rgb = np.zeros((16, 16, 3), np.uint8)
        a = backproject(jnp.asarray(depth), jnp.asarray(rgb), 20.0, 20.0, 8.0, 8.0,
                        0.01, 500.0, 2.5, 1)
        b = backproject(jnp.asarray(depth * 2.5), jnp.asarray(rgb), 20.0, 20.0, 8.0, 8.0,
                        0.01, 500.0, 1.0, 1)
        np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz), rtol=1e-5)


class TestVoxelDownsample:
    def _oracle(self, xyz, rgb, voxel):
        mn = xyz.min(axis=0)
        keys = np.floor((xyz - mn) / voxel).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        n = len(uniq)
        sx = np.zeros((n, 3)); sc = np.zeros((n, 3)); cnt = np.zeros(n)
        for i, g in enumerate(inv):
            sx[g] += xyz[i]; sc[g] += rgb[i]; cnt[g] += 1
        return sx / cnt[:, None], sc / cnt[:, None]

    def test_matches_oracle(self, rng):
        xyz = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        ps = PointSet.from_numpy(xyz, rgb)
        out = voxel_downsample(ps, 0.25)
        got_xyz, got_rgb = out.to_numpy()
        exp_xyz, exp_rgb = self._oracle(xyz, rgb, 0.25)
        assert got_xyz.shape == exp_xyz.shape
        # Compare as sorted sets (orders differ).
        gi = np.lexsort(got_xyz.T); ei = np.lexsort(exp_xyz.T)
        # The scatter-free reduction computes segment sums as differences of
        # f32 prefix sums; tolerance reflects that (~1e-4 relative, far below
        # the 1e-3 chamfer target at any realistic voxel size).
        np.testing.assert_allclose(got_xyz[gi], exp_xyz[ei], rtol=2e-3, atol=1e-4)
        np.testing.assert_allclose(got_rgb[gi], exp_rgb[ei], rtol=2e-3, atol=1e-4)

    def test_respects_mask(self, rng):
        xyz = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
        ps = PointSet.from_numpy(xyz, capacity=200)  # half the slots invalid
        out = voxel_downsample(ps, 0.5)
        got_xyz, _ = out.to_numpy()
        exp_xyz, _ = self._oracle(xyz, np.zeros_like(xyz), 0.5)
        assert got_xyz.shape[0] == exp_xyz.shape[0]

    def test_deterministic(self, rng):
        xyz = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
        ps = PointSet.from_numpy(xyz)
        a = voxel_downsample(ps, 0.1)
        b = voxel_downsample(ps, 0.1)
        np.testing.assert_array_equal(np.asarray(a.xyz), np.asarray(b.xyz))

    def test_all_invalid(self):
        ps = PointSet.empty(64)
        out = voxel_downsample(ps, 0.1)
        assert int(out.count()) == 0


class TestOutlierRemoval:
    def _oracle_mean_knn(self, xyz, k):
        d = np.linalg.norm(xyz[:, None, :] - xyz[None, :, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        return np.sort(d, axis=1)[:, :k].mean(axis=1)

    def test_knn_mean_distance(self, rng):
        xyz = rng.normal(size=(200, 3)).astype(np.float32)
        ps = PointSet.from_numpy(xyz)
        got = np.asarray(knn_mean_distance(ps.xyz, ps.mask, k=5, chunk=64))
        exp = self._oracle_mean_knn(xyz, 5)
        np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)

    def test_removes_planted_outliers(self, rng):
        dense = rng.normal(size=(400, 3)).astype(np.float32) * 0.1
        outliers = np.array([[50, 50, 50], [-60, 0, 0]], np.float32)
        xyz = np.concatenate([dense, outliers])
        ps = PointSet.from_numpy(xyz)
        out = remove_statistical_outliers(ps, nb_neighbors=10, std_ratio=2.0, chunk=128)
        mask = np.asarray(out.mask)
        assert not mask[-1] and not mask[-2]  # planted outliers removed
        assert mask[:400].sum() > 380  # bulk survives

    def test_grid_sentinel_excluded_from_statistics(self, rng):
        """Regression: a single isolated point (no candidates in its grid
        window -> ~1e6 sentinel distance) inflated sigma by ~1e5 and the
        mu+2*sigma threshold then kept every genuine outlier. Sentinels
        must be dropped unconditionally and excluded from the stats."""
        from txr.ops.outlier import remove_statistical_outliers_grid

        dense = (rng.normal(size=(2000, 3)) * 0.1).astype(np.float32)
        # moderate outliers WITHIN grid-window reach (finite mean_d ~0.35
        # vs dense ~0.06): these exercise the statistics, not the sentinel
        genuine = np.array([[0.55, 0, 0], [-0.6, 0.1, 0]], np.float32)
        isolated = np.array([[5e4, 5e4, 5e4]], np.float32)
        xyz = np.concatenate([dense, genuine, isolated])
        # capacity > 2^16 forces the actual GRID path (small static
        # capacities route to the exact kNN since round 4).
        ps = PointSet.from_numpy(xyz, capacity=(1 << 16) + 8192)
        out = remove_statistical_outliers_grid(ps, 0.3, nb_neighbors=10,
                                               std_ratio=2.0, per_cell=32)
        mask = np.asarray(out.mask)
        assert not mask[-1], "isolated sentinel point kept"
        assert not mask[-2] and not mask[-3], "genuine outliers kept"
        assert mask[:2000].sum() > 1800

    def test_respects_capacity_padding(self, rng):
        xyz = rng.normal(size=(100, 3)).astype(np.float32)
        a = remove_statistical_outliers(PointSet.from_numpy(xyz), 10, 2.0, chunk=64)
        b = remove_statistical_outliers(PointSet.from_numpy(xyz, capacity=256), 10, 2.0, chunk=64)
        ga, _ = a.to_numpy()
        gb, _ = b.to_numpy()
        np.testing.assert_allclose(ga, gb, rtol=1e-5)


class TestConcatenate:
    def test_concat(self, rng):
        a = PointSet.from_numpy(rng.normal(size=(10, 3)).astype(np.float32))
        b = PointSet.from_numpy(rng.normal(size=(20, 3)).astype(np.float32), capacity=32)
        c = concatenate([a, b])
        assert c.capacity == 42
        assert int(c.count()) == 30
