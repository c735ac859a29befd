"""Enhanced pipeline tests: hybrid features, depth filter, end-to-end."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from txr.geometry.hybrid import (
    HybridFeatureDetector,
    DepthGuidedMatcher,
    match_line_endpoints,
)


@pytest.fixture(scope="module")
def textured_pair():
    rng = np.random.default_rng(5)
    img = np.full((240, 320, 3), 100, np.uint8)
    for _ in range(30):
        c = rng.integers(0, 255, 3).tolist()
        p1 = (int(rng.integers(20, 300)), int(rng.integers(20, 220)))
        p2 = (int(rng.integers(20, 300)), int(rng.integers(20, 220)))
        cv2.line(img, p1, p2, c, 2)
        cv2.rectangle(img, p1, (p1[0] + 15, p1[1] + 10), c, -1)
    M = np.float32([[1, 0, 12], [0, 1, 5]])
    shifted = cv2.warpAffine(img, M, (320, 240))
    return img, shifted


class TestHybridDetector:
    def test_detect_all_modalities(self, textured_pair):
        det = HybridFeatureDetector(verbose=False)
        f = det.detect(textured_pair[0])
        assert f.sift is not None and f.sift.count > 20
        assert f.orb is not None and f.orb.count > 20
        assert f.lines is not None and len(f.lines) > 5
        assert f.edges is not None and (f.edges > 0).any()

    def test_match_recovers_shift(self, textured_pair):
        det = HybridFeatureDetector(verbose=False)
        f1 = det.detect(textured_pair[0])
        f2 = det.detect(textured_pair[1])
        pts1, pts2 = det.match_features(f1, f2)
        assert len(pts1) > 30
        med = np.median(pts2 - pts1, axis=0)
        np.testing.assert_allclose(med, [12, 5], atol=1.5)

    def test_disabled_modalities(self, textured_pair):
        det = HybridFeatureDetector(use_orb=False, use_lines=False,
                                    use_edges=False, verbose=False)
        f = det.detect(textured_pair[0])
        assert f.orb is None and f.lines is None and f.edges is None
        pts1, pts2 = det.match_features(f, f)
        assert len(pts1) > 10  # SIFT-only still matches

    def test_detect_batch_matches_scalar_device(self, textured_pair):
        """Batched hybrid detection (one program for all four stages over
        BATCH frames, padded tail) must reproduce the per-frame device
        path — same kernels, different dispatch structure."""
        det = HybridFeatureDetector(verbose=False, backend="device")
        imgs = [textured_pair[0], textured_pair[1], textured_pair[0]]
        batched = det.detect_batch(imgs)
        assert len(batched) == len(imgs)
        def _set_overlap(uv_a, uv_b, tol=0.5):
            """Fraction of a's keypoints with a b keypoint within tol px
            (lax.map float ties reorder/replace marginal keypoints)."""
            if len(uv_a) == 0:
                return 1.0
            d2 = ((uv_a[:, None, :] - uv_b[None, :, :]) ** 2).sum(-1)
            return float((d2.min(1) < tol * tol).mean())

        for im, fb in zip(imgs, batched):
            fs = det.detect(im)
            assert abs(fb.sift.count - fs.sift.count) <= 2
            assert _set_overlap(fb.sift.uv[fb.sift.mask],
                                fs.sift.uv[fs.sift.mask]) > 0.99
            assert abs(fb.orb.count - fs.orb.count) <= 2
            assert _set_overlap(fb.orb.uv[fb.orb.mask],
                                fs.orb.uv[fs.orb.mask]) > 0.98
            assert abs(len(fb.lines) - len(fs.lines)) <= 2
            assert np.mean(fb.edges != fs.edges) < 1e-3


class TestLineEndpoints:
    def test_identical_images_match_in_place(self, textured_pair):
        img, _ = textured_pair
        lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_STD)
        g1 = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        l1 = lsd.detect(g1)[0].reshape(-1, 4)
        p1, p2 = match_line_endpoints(l1, l1, g1, g1)
        assert len(p1) > 10
        # Identical images: nearest endpoint is itself, NCC = 1.
        np.testing.assert_allclose(p1, p2, atol=1e-5)

    def test_ncc_rejects_noise(self, textured_pair, rng):
        img, _ = textured_pair
        lsd = cv2.createLineSegmentDetector(cv2.LSD_REFINE_STD)
        g1 = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        l1 = lsd.detect(g1)[0].reshape(-1, 4)
        noise = rng.integers(0, 255, g1.shape, dtype=np.uint8)
        ln = lsd.detect(noise)[0]
        ln = ln.reshape(-1, 4) if ln is not None else np.zeros((0, 4), np.float32)
        p1, p2 = match_line_endpoints(l1, l1, g1, noise)
        # Same endpoint geometry but uncorrelated patches → NCC gate rejects
        # (nearly) everything.
        assert len(p1) <= max(3, len(l1) // 10)

    def test_empty_lines(self):
        g = np.zeros((50, 50), np.uint8)
        p1, p2 = match_line_endpoints(np.zeros((0, 4)), np.zeros((0, 4)), g, g)
        assert len(p1) == 0


class TestDepthGuidedMatcher:
    def test_filters_inconsistent_depth(self, rng):
        m = DepthGuidedMatcher(depth_consistency_thresh=0.15)
        n = 40
        pts1 = rng.uniform(5, 45, (n, 2)).astype(np.float32)
        pts2 = pts1 + 1.0
        depth1 = rng.uniform(1, 5, (50, 50)).astype(np.float32)
        depth2 = depth1.copy()
        # Consistent matches sample the same depth; corrupt the last 10 in
        # image 2 with inverted depth (breaks value & rank consistency).
        x2 = pts2[:, 0].astype(int); y2 = pts2[:, 1].astype(int)
        x1 = pts1[:, 0].astype(int); y1 = pts1[:, 1].astype(int)
        depth2[y2, x2] = depth1[y1, x1]
        depth2[y2[-10:], x2[-10:]] = 6.0 - depth1[y1[-10:], x1[-10:]]
        f1, f2 = m.filter_matches_by_depth(pts1, pts2, depth1, depth2)
        assert len(f1) < n
        assert len(f1) >= n - 15

    def test_passthrough_no_depth(self, rng):
        m = DepthGuidedMatcher()
        pts = rng.uniform(0, 10, (5, 2)).astype(np.float32)
        f1, f2 = m.filter_matches_by_depth(pts, pts, None, None)
        assert len(f1) == 5


class TestEnhancedEndToEnd:
    def test_reconstruct_no_depth_mode(self, tmp_path):
        """--no-depth path: SfM-only, no clouds → returns None gracefully."""
        from txr.pipelines.enhanced_pipeline import DepthEnhancedReconstruction
        rng = np.random.default_rng(2)
        folder = tmp_path / "imgs"
        folder.mkdir()
        img = np.full((120, 160, 3), 80, np.uint8)
        for _ in range(25):
            c = rng.integers(0, 255, 3).tolist()
            p = (int(rng.integers(10, 150)), int(rng.integers(10, 110)))
            cv2.circle(img, p, int(rng.integers(2, 8)), c, -1)
        for i, dx in enumerate([0, 6, 12]):
            M = np.float32([[1, 0, dx], [0, 1, 0]])
            cv2.imwrite(str(folder / f"im_{i}.png"), cv2.warpAffine(img, M, (160, 120)))
        K = np.array([[130.0, 0, 80], [0, 130.0, 60], [0, 0, 1]])
        rec = DepthEnhancedReconstruction(K, use_depth=False,
                                          use_hybrid_features=True, verbose=False)
        assert rec.load_images(str(folder)) == 3
        result = rec.reconstruct(output_dir=str(tmp_path / "out"))
        # Reference behavior: with depth disabled the SPARSE pair-0 points
        # still come out (depth_enhanced_reconstruction.py:1155-1165 falls
        # back to self.points_3d). The earlier revision returned None here.
        assert result is not None
        points, colors, poses = result
        assert len(points) > 10
        assert colors.shape == points.shape
        assert len(poses) == 3
        assert len(rec.camera_poses) >= 2

    @pytest.mark.parametrize("backend", ["cv2", "device"])
    def test_reconstruct_with_synthetic_depth_model(self, tmp_path,
                                                    monkeypatch, backend):
        """Full path with a fake depth model (constant plane depth), on both
        feature backends; the device run must make zero cv2 feature calls
        (VERDICT r1 item 3)."""
        from txr.pipelines.enhanced_pipeline import DepthEnhancedReconstruction
        if backend == "device":
            for name in ("SIFT_create", "ORB_create", "createCLAHE",
                         "createLineSegmentDetector", "Canny"):
                monkeypatch.setattr(
                    cv2, name,
                    lambda *a, _n=name, **k: (_ for _ in ()).throw(
                        AssertionError(f"cv2.{_n} called on device backend")),
                    raising=False)

        class FakeDepthModel:
            def infer(self, img, intr=None):
                return np.full(img.shape[:2], 2.0, np.float32)

            def infer_batch(self, imgs, intr=None):
                return np.full(imgs.shape[:3], 2.0, np.float32)

        rng = np.random.default_rng(3)
        folder = tmp_path / "imgs"
        folder.mkdir()
        base = np.full((120, 160, 3), 90, np.uint8)
        for _ in range(35):
            c = rng.integers(0, 255, 3).tolist()
            p = (int(rng.integers(10, 150)), int(rng.integers(10, 110)))
            cv2.rectangle(base, p, (p[0] + 8, p[1] + 6), c, -1)
        for i, dx in enumerate([0, 7, 14]):
            M = np.float32([[1, 0, dx], [0, 1, 0]])
            cv2.imwrite(str(folder / f"im_{i}.png"), cv2.warpAffine(base, M, (160, 120)))
        K = np.array([[130.0, 0, 80], [0, 130.0, 60], [0, 0, 1]])
        rec = DepthEnhancedReconstruction(K, use_depth=True, use_hybrid_features=True,
                                          depth_model=FakeDepthModel(), verbose=False,
                                          subsample=4, voxel_size=0.05,
                                          feature_backend=backend)
        rec.load_images(str(folder))
        result = rec.reconstruct(output_dir=str(tmp_path / "out"))
        assert result is not None
        points, colors, poses = result
        assert len(points) > 100
        assert (tmp_path / "out" / "reconstruction.ply").exists()


class TestMissingEarlyDepths:
    def test_later_views_only_depth(self, tmp_path, rng):
        """Regression: when only views >= 2 carry depth, the scale-EMA loop
        reads the batched per-view scales — the batch must run even though
        view 0 has no depth (previously NameError: okn_h)."""
        from txr.pipelines.enhanced_pipeline import DepthEnhancedReconstruction

        class FakeDepthModel:
            def infer(self, img, intr=None):
                return np.full(img.shape[:2], 2.0, np.float32)

            def infer_batch(self, imgs, intr=None):
                return np.full(imgs.shape[:3], 2.0, np.float32)

        folder = tmp_path / "imgs"
        folder.mkdir()
        base = np.full((120, 160, 3), 90, np.uint8)
        for _ in range(35):
            c = rng.integers(0, 255, 3).tolist()
            p = (int(rng.integers(10, 150)), int(rng.integers(10, 110)))
            cv2.rectangle(base, p, (p[0] + 8, p[1] + 6), c, -1)
        for i, dx in enumerate([0, 7, 14, 21]):
            M = np.float32([[1, 0, dx], [0, 1, 0]])
            cv2.imwrite(str(folder / f"im_{i}.png"),
                        cv2.warpAffine(base, M, (160, 120)))
        K = np.array([[130.0, 0, 80], [0, 130.0, 60], [0, 0, 1]])
        rec = DepthEnhancedReconstruction(
            K, use_depth=True, use_hybrid_features=True,
            depth_model=FakeDepthModel(), verbose=False,
            subsample=4, voxel_size=0.05)
        rec.load_images(str(folder))
        rec.estimate_all_depths()
        rec.depths[0] = None
        rec.depths[1] = None
        # reconstruct() re-estimates depths; freeze the primed layout so the
        # missing-first-depth folder shape actually reaches the scale chain
        rec.estimate_all_depths = lambda: None
        result = rec.reconstruct(output_dir=str(tmp_path / "out"))
        assert result is not None
        points, colors, poses = result
        assert len(points) > 0


class TestDenseCorrespondences:
    def test_translation_disparity(self):
        from txr.geometry.hybrid import generate_dense_correspondences
        depth = np.full((64, 64), 2.0, np.float32)
        K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
        p1, p2 = generate_dense_correspondences(
            depth, depth, np.eye(3), np.array([0.1, 0, 0]), K, grid_step=8)
        assert len(p1) > 30
        # Pure x-translation at constant depth → disparity fx*tx/z = 2.5 px.
        np.testing.assert_allclose(np.median(p2 - p1, axis=0), [2.5, 0], atol=1e-5)

    def test_invalid_depth_skipped(self):
        from txr.geometry.hybrid import generate_dense_correspondences
        depth = np.zeros((32, 32), np.float32)  # all invalid
        K = np.eye(3)
        p1, p2 = generate_dense_correspondences(
            depth, depth, np.eye(3), np.zeros(3), K)
        assert len(p1) == 0


class TestEnhancedWithBA:
    def test_ba_path_runs_and_outputs(self, tmp_path):
        from txr.pipelines.enhanced_pipeline import DepthEnhancedReconstruction

        class FakeDepthModel:
            def infer(self, img, intr=None):
                return np.full(img.shape[:2], 2.0, np.float32)

            def infer_batch(self, imgs, intr=None):
                return np.full(imgs.shape[:3], 2.0, np.float32)

        rng = np.random.default_rng(4)
        folder = tmp_path / "imgs"
        folder.mkdir()
        base = np.full((120, 160, 3), 90, np.uint8)
        for _ in range(35):
            c = rng.integers(0, 255, 3).tolist()
            p = (int(rng.integers(10, 150)), int(rng.integers(10, 110)))
            cv2.rectangle(base, p, (p[0] + 8, p[1] + 6), c, -1)
        for i, dx in enumerate([0, 7, 14]):
            M = np.float32([[1, 0, dx], [0, 1, 0]])
            cv2.imwrite(str(folder / f"im_{i}.png"), cv2.warpAffine(base, M, (160, 120)))
        K = np.array([[130.0, 0, 80], [0, 130.0, 60], [0, 0, 1]])
        rec = DepthEnhancedReconstruction(K, use_depth=True, use_hybrid_features=True,
                                          depth_model=FakeDepthModel(), verbose=False,
                                          subsample=4, voxel_size=0.05,
                                          use_ba=True, ba_iterations=5)
        rec.load_images(str(folder))
        result = rec.reconstruct(output_dir=str(tmp_path / "out"))
        assert result is not None
        points, colors, poses = result
        assert len(points) > 100
        assert len(poses) == 3
        # Poses remain orthonormal after BA.
        for R, t in poses:
            np.testing.assert_allclose(np.asarray(R) @ np.asarray(R).T,
                                       np.eye(3), atol=1e-4)


class TestMatchCapacityOverflow:
    def test_match_pair_over_capacity(self, monkeypatch, rng):
        """More raw matches than MATCH_CAPACITY must truncate to the RANSAC
        capacity, not crash on a boolean-index shape mismatch (review r2)."""
        from txr.pipelines.enhanced_pipeline import (DepthEnhancedReconstruction,
                                                     MATCH_CAPACITY)

        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1.0]])
        rec = DepthEnhancedReconstruction(K, use_depth=False,
                                          use_hybrid_features=False,
                                          verbose=False)
        n = MATCH_CAPACITY + 1000
        pts1 = rng.uniform(0, 128, (n, 2)).astype(np.float32)
        pts2 = pts1 + np.float32([2.0, 0.0])  # pure-translation pairs
        monkeypatch.setattr(rec, "_match_pair_host",
                            lambda i, j: (pts1, pts2))
        a, b = rec.match_image_pair(0, 1)
        assert len(a) == len(b) <= MATCH_CAPACITY
        assert len(a) > 0
