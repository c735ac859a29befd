"""Reference-named API facades: a reference user's classes must exist and
behave (SparseReconstructor, DenseReconstructor, DepthScaleEstimator,
DepthImageLoader, DepthEstimator)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from txr.core.config import ReconstructionConfig
from txr.pipelines.fusion_pipeline import SparseReconstructor, DenseReconstructor
from txr.geometry.scale import DepthScaleEstimator
from txr.io.depth_io import DepthImageLoader


def textured(rng, shift=0):
    img = np.full((240, 320, 3), 100, np.uint8)
    for _ in range(40):
        c = rng.integers(0, 255, 3).tolist()
        p = (int(rng.integers(10, 300)), int(rng.integers(10, 220)))
        cv2.rectangle(img, p, (p[0] + 10, p[1] + 8), c, -1)
    if shift:
        M = np.float32([[1, 0, shift], [0, 1, 0]])
        img = cv2.warpAffine(img, M, (320, 240))
    return img


class TestSparseReconstructor:
    def test_detect_match_pose_triangulate_filter(self, rng):
        cfg = ReconstructionConfig(fx=260, fy=260, cx=160, cy=120)
        sr = SparseReconstructor(cfg, feature_capacity=4096)
        img1 = textured(rng)
        img2 = textured(np.random.default_rng(0), shift=10)
        pts1, pts2, n = sr.detect_and_match(img1, img2)
        assert n >= 8
        R, t, mask = sr.compute_pose(pts1, pts2)
        assert R is not None and R.shape == (3, 3)
        X = sr.triangulate(pts1[mask], pts2[mask], R, t)
        assert X.shape == (mask.sum(), 3)
        valid = sr.filter_points(X, pts1[mask], pts2[mask], R, t)
        assert valid.dtype == bool

    def test_pose_fails_gracefully(self, rng):
        sr = SparseReconstructor(ReconstructionConfig())
        R, t, mask = sr.compute_pose(np.zeros((3, 2), np.float32),
                                     np.zeros((3, 2), np.float32))
        assert R is None


class TestDenseReconstructor:
    def test_depth_to_pointcloud_and_merge(self, rng):
        cfg = ReconstructionConfig(fx=100, fy=100, cx=32, cy=24,
                                   voxel_size=0.05)
        dr = DenseReconstructor(cfg)
        depth = np.full((48, 64), 2.0, np.float32)
        color = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        pts, cols = dr.depth_to_pointcloud(depth, color, subsample=2)
        assert len(pts) == 24 * 32
        assert cols.max() > 1.5  # 0..255 scale like the reference
        merged, mcols = dr.merge_pointclouds([(pts, cols)], voxel_size=0.05)
        assert 0 < len(merged) <= len(pts)

    def test_estimate_scale_clamped(self):
        dr = DenseReconstructor()
        depth = np.full((10, 10), 1.0, np.float32)
        # ratio would be 1e5 → outside the sanity clamp → 1.0
        pts = np.array([[0, 0, 1e5]] * 6, np.float32)
        uv = np.array([[5, 5]] * 6, np.float32)
        assert dr.estimate_scale(pts, uv, depth) == 1.0


class TestSmallFacades:
    def test_depth_image_loader(self, tmp_path):
        d = np.random.default_rng(0).uniform(0.1, 2, (8, 8)).astype(np.float32)
        np.save(tmp_path / "f_depth.npy", d)
        found = DepthImageLoader.find_matching_depth("f.jpg", tmp_path)
        assert found and found.endswith("f_depth.npy")
        np.testing.assert_array_equal(DepthImageLoader.load_depth(found), d)

    def test_scale_estimator(self):
        e = DepthScaleEstimator()
        depth = np.full((20, 20), 0.5, np.float32)
        pts = np.array([[0, 0, 2.0]] * 6, np.float32)
        uv = np.array([[5, 5]] * 6, np.float32)
        assert e.estimate_scale(pts, uv, depth) == pytest.approx(4.0)
