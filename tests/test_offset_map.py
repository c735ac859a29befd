"""Mean-offset packed voxel map (txr.fusion.offset_map) tests.

Must match the exact NumPy voxel-mean oracle with the 4-column fixed-point
tolerances: position within the voxel_size/1024 offset quantization (one
half-step per insert requantization), color within ~1 gray level (8-bit
storage) of the exact mean. offset_map is the single canonical fusion map
(VERDICT r2 #8) — the earlier sorted/packed/hash generations are deleted.
"""

import numpy as np

import jax.numpy as jnp

from txr.core.types import PointSet
from txr.fusion.offset_map import (W_MAX, _pack_klo_x, _pack_rgb, _pack_yzw,
                                   _q, create_offset_map, offset_map_insert,
                                   offset_map_points, offset_map_size)



def _weights(vm):
    return np.asarray(vm.yzw).astype(np.uint32) & 0x7FF


def _keyset(vm):
    from txr.fusion.offset_map import _unpack_klo_x
    from txr.fusion.keys import unpack_keys
    klo, _ = _unpack_klo_x(vm.klo_x)
    kx, ky, kz = unpack_keys(vm.khi, klo)
    occ = _weights(vm) > 0
    return np.stack([np.asarray(kx), np.asarray(ky), np.asarray(kz)], 1)[occ]


class TestOffsetMap:
    def test_matches_numpy_oracle(self):
        """Incremental inserts must agree with the exact NumPy per-voxel
        mean: same voxel key set, positions within the accumulated offset
        quantization (voxel/1024 half-step per insert requantization),
        colors within ~1 gray level."""
        rng = np.random.default_rng(2)
        voxel = 0.05
        xyz = rng.uniform(-1, 1, (4000, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (4000, 3)).astype(np.float32)
        p = create_offset_map(16384, voxel)
        for cx, cr in zip(np.split(xyz, 4), np.split(rgb, 4)):
            ps = PointSet(jnp.asarray(cx), jnp.asarray(cr),
                          jnp.ones(len(cx), bool))
            p = offset_map_insert(p, ps)
        keys = np.floor(xyz.astype(np.float64) / voxel).astype(np.int64)
        oracle = {}
        for k, q, c in zip(map(tuple, keys), xyz, rgb):
            s_, n_ = oracle.get(k, (np.zeros(6), 0))
            oracle[k] = (s_ + np.concatenate([q, c]), n_ + 1)
        oracle = {k: s_ / n_ for k, (s_, n_) in oracle.items()}
        assert int(offset_map_size(p)) == len(oracle)
        pp, cp = offset_map_points(p).to_numpy()
        dp = {tuple(k): (q, c) for k, q, c in zip(_keyset(p), pp, cp)}
        assert dp.keys() == oracle.keys()
        pos_err = max(np.abs(oracle[k][:3] - dp[k][0]).max() for k in dp)
        col_err = max(np.abs(oracle[k][3:] - dp[k][1]).max() for k in dp)
        # 4 inserts x voxel/2048 requant half-step, plus f32 accumulation.
        assert pos_err < 5e-4
        # 8-bit color storage: half-step 2e-3 per requantization.
        assert col_err < 2.0 / 255.0

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
        assert 0 < w <= W_MAX
        pts, cols = offset_map_points(p).to_numpy()
        assert len(pts) == 1
        # 10-bit offset midpoint dequant: up to voxel/2048 = 4.9e-4 here.
        assert np.allclose(pts[0], [0.25, 0.25, 0.25], atol=1e-3)
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

    def test_no_drift_at_large_accumulated_weight(self):
        """ADVICE r1 regression: with a heavily-loaded resident map (total
        accumulated weight ~5e8, far beyond f32 prefix-sum exactness at
        2^24), an insert must still recover exact per-voxel weights and
        accurate means — the segmented scan's error scales with each
        segment's own sum, not the map total. A global-cumsum + differencing
        implementation fails this with weight errors in the hundreds."""
        from txr.fusion.keys import pack_keys

        cap = 1 << 18
        nres = 250_000
        wres = 2000                          # near the u11 cap
        p = create_offset_map(cap, 1.0)
        # Spread over a 128x128 grid in x,y: per-axis coords must stay well
        # inside the packed-key field widths.
        i = np.arange(nres)
        coord = lambda j: np.stack(
            [j % 128, (j // 128) % 128, j // 16384], -1).astype(np.float32)
        kx = jnp.asarray(i % 128, jnp.int32)
        ky = jnp.asarray((i // 128) % 128, jnp.int32)
        kz = jnp.asarray(i // 16384, jnp.int32)
        khi, klo = pack_keys(kx, ky, kz, jnp.ones(nres, bool))
        ones = jnp.ones(nres, bool)
        klo_x = _pack_klo_x(klo, _q(jnp.full(nres, 0.25), 10), ones)
        yzw = _pack_yzw(_q(jnp.full(nres, 0.5), 10),
                        _q(jnp.full(nres, 0.75), 10),
                        jnp.full(nres, wres, jnp.uint32))
        rgb = _pack_rgb(jnp.full(nres, 0.25), jnp.full(nres, 0.5),
                        jnp.full(nres, 0.75))
        p = p._replace(
            khi=p.khi.at[:nres].set(khi),
            klo_x=p.klo_x.at[:nres].set(klo_x),
            yzw=p.yzw.at[:nres].set(yzw),
            rgb=p.rgb.at[:nres].set(rgb))

        # New points: one in a LATE voxel in key order (prefix magnitude
        # maximal there) and one in a fresh voxel beyond all residents.
        touched = coord(np.array([nres - 1]))[0]
        fresh = coord(np.array([nres + 7]))[0]
        pts = PointSet(
            jnp.asarray([touched + 0.5, fresh + 0.5], jnp.float32),
            jnp.asarray([[0.5, 0.5, 0.5], [0.25, 0.5, 0.75]], jnp.float32),
            jnp.ones(2, bool))
        p2 = offset_map_insert(p, pts)

        assert int(offset_map_size(p2)) == nres + 1
        wocc = _weights(p2)
        wocc = wocc[wocc > 0]
        # Exact weights: untouched voxels wres, touched wres+1, new voxel 1.
        assert (wocc == wres).sum() == nres - 1
        assert (wocc == wres + 1).sum() == 1
        assert (wocc == 1).sum() == 1
        qpts, qcols = offset_map_points(p2).to_numpy()
        # The new singleton voxel: mean == the point itself (10-bit quant).
        new_sel = np.argmin(np.abs(qpts - (fresh + 0.5)).sum(1))
        assert np.allclose(qpts[new_sel], fresh + 0.5, atol=1e-3)
        assert np.allclose(qcols[new_sel], [0.25, 0.5, 0.75], atol=0.01)
        # The touched resident voxel: mean moves by ~(new-old)/(wres+1).
        sel = np.argmin(np.abs(qpts - (touched + 0.3)).sum(1))
        off_res = (np.array([256, 512, 768]) + 0.5) / 1024  # dequant resident
        exp = (off_res * wres + np.array([0.5, 0.5, 0.5])) / (wres + 1)
        assert np.allclose(qpts[sel] - touched, exp, atol=1e-3)

    def test_overflow_drops_highest_keys(self):
        rng = np.random.default_rng(3)
        xyz = rng.uniform(0, 10, (2000, 3)).astype(np.float32)
        p = create_offset_map(16, 0.01)
        p = offset_map_insert(p, PointSet.from_numpy(xyz))
        assert int(offset_map_size(p)) == 16
        hi = np.asarray(p.khi)
        assert np.all(np.diff(hi.astype(np.int64)) >= 0)


class TestFarCornerSentinel:
    def test_far_corner_voxel_not_dropped(self):
        """Regression: a point clamped to the +range corner in all axes
        used to pack khi (and klo|x) to exactly INT_MAX — the empty
        sentinel — and the occupancy test silently dropped the voxel."""
        voxel = 0.01
        # far beyond +_HALF_RANGE voxels in every axis -> clipped corner
        far = np.float32(1 << 18) * voxel
        xyz = np.array([[far, far, far], [0.0, 0.0, 0.0]], np.float32)
        rgb = np.full((2, 3), 0.5, np.float32)
        vm = create_offset_map(64, voxel)
        vm = offset_map_insert(vm, PointSet(jnp.asarray(xyz),
                                            jnp.asarray(rgb),
                                            jnp.ones(2, bool)))
        assert int(offset_map_size(vm)) == 2
        # the packed columns must stay strictly below the sentinel
        occ = _weights(vm) > 0
        assert (np.asarray(vm.khi)[occ] < np.iinfo(np.int32).max).all()
        assert (np.asarray(vm.klo_x)[occ] < np.iinfo(np.int32).max).all()
