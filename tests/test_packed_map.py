"""Packed-column voxel map (txr.fusion.packed_map) tests.

Key packing must be a lexicographic-order-preserving bijection; the map must
match sorted_map voxel-for-voxel (bf16 color tolerance); weight decay must
preserve means exactly while bounding the u16 weight.
"""

import numpy as np

import jax.numpy as jnp

from txr.core.types import PointSet
from txr.fusion.packed_map import (create_packed_map, pack_keys,
                                   packed_map_insert, packed_map_points,
                                   packed_map_size, unpack_keys)
from txr.fusion.sorted_map import (create_sorted_map, sorted_map_insert,
                                   sorted_map_points)


class TestKeyPacking:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        k = rng.integers(-131000, 131000, (8000, 3)).astype(np.int32)
        hi, lo = pack_keys(jnp.asarray(k[:, 0]), jnp.asarray(k[:, 1]),
                           jnp.asarray(k[:, 2]), jnp.ones(8000, bool))
        ux, uy, uz = unpack_keys(hi, lo)
        assert np.array_equal(np.asarray(ux), k[:, 0])
        assert np.array_equal(np.asarray(uy), k[:, 1])
        assert np.array_equal(np.asarray(uz), k[:, 2])

    def test_order_preserving(self):
        rng = np.random.default_rng(1)
        k = rng.integers(-131000, 131000, (8000, 3)).astype(np.int32)
        hi, lo = pack_keys(jnp.asarray(k[:, 0]), jnp.asarray(k[:, 1]),
                           jnp.asarray(k[:, 2]), jnp.ones(8000, bool))
        o1 = np.lexsort((np.asarray(lo), np.asarray(hi)))
        o2 = np.lexsort((k[:, 2], k[:, 1], k[:, 0]))
        assert np.array_equal(k[o1], k[o2])

    def test_extremes_and_invalid(self):
        k = np.array([[-131071, -131071, -131071],
                      [131071, 131071, 131071],
                      [0, 0, 0]], np.int32)
        valid = np.array([True, True, False])
        hi, lo = pack_keys(jnp.asarray(k[:, 0]), jnp.asarray(k[:, 1]),
                           jnp.asarray(k[:, 2]), jnp.asarray(valid))
        assert int(hi[2]) == np.iinfo(np.int32).max
        assert int(hi[0]) < int(hi[1])


class TestPackedMap:
    def test_matches_sorted_map(self):
        rng = np.random.default_rng(2)
        xyz = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (4000, 3)).astype(np.float32)
        a = create_sorted_map(16384, 0.05)
        p = create_packed_map(16384, 0.05)
        for cx, cr in zip(np.split(xyz, 4), np.split(rgb, 4)):
            ps = PointSet(jnp.asarray(cx), jnp.asarray(cr),
                          jnp.ones(len(cx), bool))
            a = sorted_map_insert(a, ps)
            p = packed_map_insert(p, ps)
        na = int(np.asarray(a.count > 0).sum())
        assert int(packed_map_size(p)) == na
        pa, ca = sorted_map_points(a).to_numpy()
        pp, cp = packed_map_points(p).to_numpy()
        da = {tuple(k): (q, c) for k, q, c in
              zip(np.stack([np.asarray(a.kx), np.asarray(a.ky),
                            np.asarray(a.kz)], 1)[np.asarray(a.count) > 0],
                  pa, ca)}
        dp = {tuple(k): (q, c) for k, q, c in
              zip(np.stack([np.asarray(p.kx), np.asarray(p.ky),
                            np.asarray(p.kz)], 1)[np.asarray(p.count) > 0],
                  pp, cp)}
        assert da.keys() == dp.keys()
        pos_err = max(np.abs(da[k][0] - dp[k][0]).max() for k in da)
        col_err = max(np.abs(da[k][1] - dp[k][1]).max() for k in da)
        assert pos_err < 1e-3          # f32 accumulation tolerance
        assert col_err < 1.5 / 255.0   # bf16 color sums: < 1.5 gray levels

    def test_weight_decay_preserves_means(self):
        p = create_packed_map(64, 1.0)
        n = 50000
        one = PointSet(
            jnp.tile(jnp.asarray([[0.25, 0.25, 0.25]], jnp.float32), (n, 1)),
            jnp.tile(jnp.asarray([[0.5, 0.25, 0.75]], jnp.float32), (n, 1)),
            jnp.ones(n, bool))
        p = packed_map_insert(p, one)
        p = packed_map_insert(p, one)  # 100k raw observations
        w = float(np.asarray(p.count).max())
        assert 0 < w <= 65535          # bounded forever
        pts, cols = packed_map_points(p).to_numpy()
        assert len(pts) == 1
        assert np.allclose(pts[0], [0.25, 0.25, 0.25], atol=1e-4)
        assert np.allclose(cols[0], [0.5, 0.25, 0.75], atol=0.01)

    def test_empty_and_masked(self):
        p = create_packed_map(32, 0.1)
        p = packed_map_insert(p, PointSet.empty(50))
        assert int(packed_map_size(p)) == 0
        xyz = np.zeros((10, 3), np.float32)
        mask = np.zeros(10, bool)
        mask[3] = True
        p = packed_map_insert(p, PointSet(jnp.asarray(xyz),
                                          jnp.zeros((10, 3), jnp.float32),
                                          jnp.asarray(mask)))
        assert int(packed_map_size(p)) == 1

    def test_overflow_drops_highest_keys(self):
        rng = np.random.default_rng(3)
        xyz = rng.uniform(0, 10, (2000, 3)).astype(np.float32)
        p = create_packed_map(16, 0.01)
        p = packed_map_insert(p, PointSet.from_numpy(xyz))
        assert int(packed_map_size(p)) == 16
        hi = np.asarray(p.khi)
        assert np.all(np.diff(hi.astype(np.int64)) >= 0)  # sorted, compact


class TestNoDriftAtLargeAccumulatedWeight:
    def test_weights_exact_with_heavy_resident_map(self):
        """Same ADVICE-r1 regression class as offset_map: per-voxel weights
        recovered from the reduction must be exact even when the map's
        TOTAL accumulated weight (~5e8) is far beyond f32 prefix-sum
        exactness (2^24). Global-cumsum + differencing fails this with
        weight errors in the hundreds on tail voxels."""
        import jax.numpy as jnp

        from txr.core.types import PointSet
        from txr.fusion.packed_map import (PackedVoxelMap, create_packed_map,
                                           pack_keys, pack_rgbw,
                                           packed_map_insert, unpack_rgbw)

        cap = 1 << 18
        nres = 250_000
        wres = 2000.0
        p = create_packed_map(cap, 1.0)
        i = np.arange(nres)
        kx = jnp.asarray(i % 128, jnp.int32)
        ky = jnp.asarray((i // 128) % 128, jnp.int32)
        kz = jnp.asarray(i // 16384, jnp.int32)
        khi, klo = pack_keys(kx, ky, kz, jnp.ones(nres, bool))
        sums = jnp.stack([kx + 0.25, ky + 0.5, kz + 0.75], 1) * wres
        p1, p2 = pack_rgbw(jnp.full(nres, 0.25 * wres),
                           jnp.full(nres, 0.5 * wres),
                           jnp.full(nres, 0.75 * wres),
                           jnp.full(nres, wres))
        p = p._replace(
            khi=p.khi.at[:nres].set(khi),
            klo=p.klo.at[:nres].set(klo),
            sum_xyz=p.sum_xyz.at[:nres].set(sums),
            rgbw=p.rgbw.at[:nres].set(jnp.stack([p1, p2], 1)))

        # insert ONE weight-1 point into a fresh voxel near the key tail
        pt = np.array([[200.25, 100.5, 14.75]], np.float32)
        ps = PointSet(jnp.asarray(pt), jnp.full((1, 3), 0.5, jnp.float32),
                      jnp.ones(1, bool))
        p = packed_map_insert(p, ps)

        _, _, _, w = unpack_rgbw(p.rgbw[:, 0], p.rgbw[:, 1])
        occ = np.asarray(w) > 0
        assert occ.sum() == nres + 1
        ws = np.asarray(w)[occ]
        # every resident voxel keeps weight EXACTLY 2000; the new one is 1
        assert (np.sort(np.unique(ws)) == [1.0, 2000.0]).all(), (
            np.unique(ws)[:10])
