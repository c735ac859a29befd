"""Tests for ICP registration, the streaming voxel map, and the streaming
reconstructor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.core.types import PointSet
from txr.geometry.icp import estimate_normals, icp_point_to_plane, _so3_exp
from txr.fusion.offset_map import (
    create_offset_map,
    offset_map_insert,
    offset_map_points,
    offset_map_size,
)


def rotz(a):
    return np.array([[np.cos(a), -np.sin(a), 0],
                     [np.sin(a), np.cos(a), 0],
                     [0, 0, 1]], np.float32)


class TestSO3:
    def test_exp_matches_rotation(self):
        w = np.array([0.0, 0.0, 0.3], np.float32)
        R = np.asarray(_so3_exp(jnp.asarray(w)))
        np.testing.assert_allclose(R, rotz(0.3), atol=1e-5)

    def test_exp_zero(self):
        R = np.asarray(_so3_exp(jnp.zeros(3)))
        np.testing.assert_allclose(R, np.eye(3), atol=1e-5)


def make_surface(rng, n=2000):
    """Wavy surface — full-rank geometry for point-to-plane."""
    xy = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    z = 0.3 * np.sin(3 * xy[:, 0]) + 0.2 * np.cos(4 * xy[:, 1])
    return np.column_stack([xy, z]).astype(np.float32)


class TestNormals:
    def test_plane_normals(self, rng):
        pts = np.column_stack([rng.uniform(-1, 1, (500, 2)),
                               np.zeros(500)]).astype(np.float32)
        nrm = np.asarray(estimate_normals(jnp.asarray(pts), jnp.ones(500, bool)))
        assert np.abs(nrm[:, 2]).min() > 0.99  # all ±z

    def test_masked_points_zero(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        mask = np.ones(100, bool)
        mask[50:] = False
        nrm = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(mask)))
        assert (nrm[50:] == 0).all()


class TestICP:
    def test_recovers_small_transform(self, rng):
        tgt = make_surface(rng)
        R_true = rotz(0.05)
        t_true = np.array([0.03, -0.02, 0.01], np.float32)
        src = (tgt - t_true) @ R_true  # src = R_true^T (tgt - t) ⇒ tgt = R src + t
        mask = np.ones(len(tgt), bool)
        normals = estimate_normals(jnp.asarray(tgt), jnp.asarray(mask))
        R, t, rmse, frac = icp_point_to_plane(
            jnp.asarray(src), jnp.asarray(mask),
            jnp.asarray(tgt), normals, jnp.asarray(mask),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            iterations=15, max_correspondence=0.2,
        )
        R, t = np.asarray(R), np.asarray(t)
        np.testing.assert_allclose(R, R_true, atol=5e-3)
        np.testing.assert_allclose(t, t_true, atol=5e-3)
        assert float(rmse) < 0.01
        assert float(frac) > 0.9

    def test_identity_stays_identity(self, rng):
        tgt = make_surface(rng, 800)
        mask = np.ones(len(tgt), bool)
        normals = estimate_normals(jnp.asarray(tgt), jnp.asarray(mask))
        R, t, rmse, frac = icp_point_to_plane(
            jnp.asarray(tgt), jnp.asarray(mask),
            jnp.asarray(tgt), normals, jnp.asarray(mask),
            jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
            iterations=5, max_correspondence=0.1,
        )
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.zeros(3), atol=1e-4)


class TestVoxelMap:
    def test_insert_and_read(self, rng):
        vm = create_offset_map(1024, 0.1)
        xyz = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        ps = PointSet.from_numpy(xyz)
        vm = offset_map_insert(vm, ps)
        n = int(offset_map_size(vm))
        # Unique voxels at 0.1 over [-1,1]^3 with 200 points; the packed
        # key is exact (no hashing), so the count matches exactly.
        keys = np.unique(np.floor(xyz / 0.1).astype(int), axis=0)
        assert n == len(keys)
        out = offset_map_points(vm)
        ox, _ = out.to_numpy()
        assert len(ox) == n

    def test_averaging(self):
        vm = create_offset_map(64, 1.0)
        xyz = np.array([[0.2, 0.2, 0.2], [0.4, 0.4, 0.4]], np.float32)  # same voxel
        vm = offset_map_insert(vm, PointSet.from_numpy(xyz))
        out = offset_map_points(vm)
        ox, _ = out.to_numpy()
        assert len(ox) == 1
        # Offsets store at voxel/1024 fixed point (midpoint dequant).
        np.testing.assert_allclose(ox[0], [0.3, 0.3, 0.3], atol=1.0 / 1024)

    def test_incremental_idempotent_voxels(self, rng):
        vm = create_offset_map(2048, 0.05)
        xyz = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        vm = offset_map_insert(vm, PointSet.from_numpy(xyz))
        n1 = int(offset_map_size(vm))
        vm = offset_map_insert(vm, PointSet.from_numpy(xyz))  # same points again
        n2 = int(offset_map_size(vm))
        assert n1 == n2  # no new voxels

    def test_mask_respected(self, rng):
        vm = create_offset_map(256, 0.1)
        ps = PointSet.empty(100)
        vm = offset_map_insert(vm, ps)
        assert int(offset_map_size(vm)) == 0


class TestStreamingReconstructor:
    def test_stream_fuses_frames(self, rng):
        cv2 = pytest.importorskip("cv2")
        from txr.core.config import StreamingConfig
        from txr.core.intrinsics import CameraIntrinsics
        from txr.pipelines.streaming import StreamingReconstructor

        W, H = 160, 120
        intr = CameraIntrinsics(130.0, 130.0, W / 2, H / 2, W, H)

        # Textured scene at constant metric depth 2 m, camera shifting in x.
        base = np.full((H, W, 3), 90, np.uint8)
        for _ in range(40):
            c = rng.integers(0, 255, 3).tolist()
            p = (int(rng.integers(5, W - 5)), int(rng.integers(5, H - 5)))
            cv2.rectangle(base, p, (p[0] + 6, p[1] + 5), c, -1)

        class FakeModel:
            def infer(self, img, intr=None):
                return np.full(img.shape[:2], 2.0, np.float32)

        frames = []
        for dx in (0, 5, 10):
            M = np.float32([[1, 0, dx], [0, 1, 0]])
            frames.append(cv2.warpAffine(base, M, (W, H)))

        cfg = StreamingConfig(voxel_size=0.05, max_map_points=1 << 15,
                              subsample_factor=2, max_depth=10.0)
        rec = StreamingReconstructor(intr, depth_model=FakeModel(), config=cfg,
                                     use_icp=False, metric_depth=True, verbose=False)
        for i, f in enumerate(frames):
            rec.process_frame(f, float(i), f"f{i}")
        assert rec.frames_processed == 3
        assert len(rec.poses) == 3
        from txr.fusion.offset_map import offset_map_size
        assert int(offset_map_size(rec.map)) > 100

    def test_save(self, tmp_path, rng):
        from txr.core.config import StreamingConfig
        from txr.core.intrinsics import CameraIntrinsics
        from txr.pipelines.streaming import StreamingReconstructor
        from txr.fusion.offset_map import offset_map_insert
        from txr.io.ply import read_ply

        rec = StreamingReconstructor(
            CameraIntrinsics.default(), depth_model=object(),
            config=StreamingConfig(max_map_points=1 << 12), verbose=False)
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        rec.map = offset_map_insert(rec.map, PointSet.from_numpy(xyz))
        out = str(tmp_path / "scene.ply")
        n = rec.save(out)
        rx, _ = read_ply(out)
        assert len(rx) == n > 0
