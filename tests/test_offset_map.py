"""Mean-offset packed voxel map (txr.fusion.offset_map) tests.

Must match sorted_map voxel-for-voxel with 16-bit fixed-point tolerances:
position within voxel_size/65536 quantization + f32 weighted accumulation,
color within ~1 gray level of the exact mean.
"""

import numpy as np

import jax.numpy as jnp

from txr.core.types import PointSet
from txr.fusion.offset_map import (create_offset_map, offset_map_insert,
                                   offset_map_points, offset_map_size)
from txr.fusion.sorted_map import (create_sorted_map, sorted_map_insert,
                                   sorted_map_points)


def _keyset(vm):
    from txr.fusion.packed_map import unpack_keys
    kx, ky, kz = unpack_keys(vm.khi, vm.klo)
    occ = np.asarray(vm.ozw).astype(np.uint32) & 0xFFFF > 0
    return np.stack([np.asarray(kx), np.asarray(ky), np.asarray(kz)], 1)[occ]


class TestOffsetMap:
    def test_matches_sorted_map(self):
        rng = np.random.default_rng(2)
        xyz = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (4000, 3)).astype(np.float32)
        a = create_sorted_map(16384, 0.05)
        p = create_offset_map(16384, 0.05)
        for cx, cr in zip(np.split(xyz, 4), np.split(rgb, 4)):
            ps = PointSet(jnp.asarray(cx), jnp.asarray(cr),
                          jnp.ones(len(cx), bool))
            a = sorted_map_insert(a, ps)
            p = offset_map_insert(p, ps)
        na = int(np.asarray(a.count > 0).sum())
        assert int(offset_map_size(p)) == na
        pa, ca = sorted_map_points(a).to_numpy()
        pp, cp = offset_map_points(p).to_numpy()
        da = {tuple(k): (q, c) for k, q, c in
              zip(np.stack([np.asarray(a.kx), np.asarray(a.ky),
                            np.asarray(a.kz)], 1)[np.asarray(a.count) > 0],
                  pa, ca)}
        dp = {tuple(k): (q, c) for k, q, c in zip(_keyset(p), pp, cp)}
        assert da.keys() == dp.keys()
        pos_err = max(np.abs(da[k][0] - dp[k][0]).max() for k in da)
        col_err = max(np.abs(da[k][1] - dp[k][1]).max() for k in da)
        # sorted_map's f32 absolute-position cumsum carries ~1e-4 error
        # itself (same 1e-3 bound as test_packed_map); the offset map's own
        # quantization is voxel/65536 = 7.6e-7.
        assert pos_err < 1e-3
        assert col_err < 1.0 / 255.0

    def test_stable_mean_no_drift(self):
        """Re-inserting disjoint points must not move untouched voxels."""
        p = create_offset_map(256, 1.0)
        a = PointSet(jnp.asarray([[0.3, 0.6, 0.9]], jnp.float32),
                     jnp.asarray([[0.2, 0.4, 0.8]], jnp.float32),
                     jnp.ones(1, bool))
        p = offset_map_insert(p, a)
        ref = offset_map_points(p).to_numpy()
        for i in range(20):
            other = PointSet(
                jnp.asarray([[10.0 + i, 0.0, 0.0]], jnp.float32),
                jnp.asarray([[1.0, 1.0, 1.0]], jnp.float32),
                jnp.ones(1, bool))
            p = offset_map_insert(p, other)
        pts, cols = offset_map_points(p).to_numpy()
        sel = np.argmin(np.abs(pts[:, 0] - 0.3))
        assert np.allclose(pts[sel], ref[0][0], atol=1e-6)
        assert np.allclose(cols[sel], ref[1][0], atol=1e-6)

    def test_weight_saturation(self):
        p = create_offset_map(64, 1.0)
        n = 50000
        one = PointSet(
            jnp.tile(jnp.asarray([[0.25, 0.25, 0.25]], jnp.float32), (n, 1)),
            jnp.tile(jnp.asarray([[0.5, 0.25, 0.75]], jnp.float32), (n, 1)),
            jnp.ones(n, bool))
        p = offset_map_insert(p, one)
        p = offset_map_insert(p, one)  # 100k raw observations
        w = float(np.asarray(p.count).max())
        assert 0 < w <= 65535
        pts, cols = offset_map_points(p).to_numpy()
        assert len(pts) == 1
        assert np.allclose(pts[0], [0.25, 0.25, 0.25], atol=1e-4)
        assert np.allclose(cols[0], [0.5, 0.25, 0.75], atol=0.01)

    def test_empty_and_masked(self):
        p = create_offset_map(32, 0.1)
        p = offset_map_insert(p, PointSet.empty(50))
        assert int(offset_map_size(p)) == 0
        xyz = np.zeros((10, 3), np.float32)
        xyz[0] = np.nan                      # masked garbage must not poison
        mask = np.zeros(10, bool)
        mask[3] = True
        p = offset_map_insert(p, PointSet(jnp.asarray(xyz),
                                          jnp.zeros((10, 3), jnp.float32),
                                          jnp.asarray(mask)))
        assert int(offset_map_size(p)) == 1
        pts, _ = offset_map_points(p).to_numpy()
        assert np.isfinite(pts).all()

    def test_overflow_drops_highest_keys(self):
        rng = np.random.default_rng(3)
        xyz = rng.uniform(0, 10, (2000, 3)).astype(np.float32)
        p = create_offset_map(16, 0.01)
        p = offset_map_insert(p, PointSet.from_numpy(xyz))
        assert int(offset_map_size(p)) == 16
        hi = np.asarray(p.khi)
        assert np.all(np.diff(hi.astype(np.int64)) >= 0)
