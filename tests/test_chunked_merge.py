"""Chunked dense voxel merge vs the single-program oracle.

txr/fusion/chunked_merge.py bounds device memory for long sequences; its
contract is EXACTNESS: same voxel partition (global masked-min origin) and
per-voxel means equal to one voxel_downsample over all views, up to float
summation order.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.core.types import PointSet
from txr.fusion.chunked_merge import chunked_dense_voxel_merge
from txr.ops.backproject import backproject_world
from txr.ops.voxel import voxel_downsample


def _scene(rng, n=5, h=24, w=32):
    fx = fy = 30.0
    cx, cy = w / 2.0, h / 2.0
    depths = (1.0 + 2.0 * rng.uniform(size=(n, h, w))).astype(np.float32)
    depths[0, :4, :4] = 0.0          # some invalid pixels
    bgrs = rng.integers(0, 255, (n, h, w, 3)).astype(np.uint8)
    Rs = np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))
    ts = np.zeros((n, 3), np.float32)
    for i in range(n):
        th = 0.05 * i
        Rs[i] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                          [-np.sin(th), 0, np.cos(th)]], np.float32)
        ts[i] = [0.1 * i, 0.0, 0.02 * i]
    scales = (1.0 + 0.1 * rng.uniform(size=n)).astype(np.float32)
    keep = np.ones(n, bool)
    if n > 3:
        keep[3] = False               # a skipped view
    return depths, bgrs, Rs, ts, scales, keep, (fx, fy, cx, cy)


def _oracle_flat(depths, bgrs, Rs, ts, scales, keep, intr, subsample=1,
                 min_depth=0.1, max_depth=50.0):
    fx, fy, cx, cy = intr
    sets = []
    for i in range(len(depths)):
        ps = backproject_world(jnp.asarray(depths[i]),
                               jnp.asarray(bgrs[i][..., ::-1]),
                               jnp.asarray(Rs[i]), jnp.asarray(ts[i]),
                               fx, fy, cx, cy, min_depth, max_depth,
                               float(scales[i]), subsample)
        m = np.asarray(ps.mask) & bool(keep[i])
        sets.append((np.asarray(ps.xyz), np.asarray(ps.rgb), m))
    xyz = np.concatenate([s[0] for s in sets])
    rgb = np.concatenate([s[1] for s in sets])
    mask = np.concatenate([s[2] for s in sets])
    return PointSet(jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(mask))


class TestChunkedMerge:
    @pytest.mark.parametrize("chunk_views", [1, 2, 8])
    def test_matches_single_pass(self, rng, chunk_views):
        depths, bgrs, Rs, ts, scales, keep, intr = _scene(rng)
        fx, fy, cx, cy = intr
        voxel = 0.12
        got, counts = chunked_dense_voxel_merge(
            depths, bgrs, Rs, ts, scales, keep,
            fx=fx, fy=fy, cx=cx, cy=cy, min_depth=0.1, max_depth=50.0,
            subsample=1, voxel_size=voxel, chunk_views=chunk_views)
        flat = _oracle_flat(depths, bgrs, Rs, ts, scales, keep, intr)
        exp = voxel_downsample(flat, voxel)
        gx, gc = got.to_numpy()
        ex, ec = exp.to_numpy()
        # both outputs are in ascending voxel-key order w.r.t. the SAME
        # global origin, so rows align 1:1
        assert gx.shape == ex.shape, (gx.shape, ex.shape)
        # both paths recover segment sums by global-prefix differencing, so
        # each carries ~ulp(prefix) absolute noise (measured max 1e-3 here);
        # the comparison tolerance reflects that shared error class, not a
        # chunking approximation
        np.testing.assert_allclose(gx, ex, atol=2e-3)
        np.testing.assert_allclose(gc, ec, atol=2e-3)
        # per-view counts: valid backprojected points per kept view
        assert counts[3] == 0
        assert (counts[:3] > 0).all()

    def test_extra_points_join_merge(self, rng):
        depths, bgrs, Rs, ts, scales, keep, intr = _scene(rng, n=3)
        fx, fy, cx, cy = intr
        voxel = 0.15
        cap = 64
        exyz = np.zeros((cap, 3), np.float32)
        ergb = np.zeros((cap, 3), np.float32)
        em = np.zeros(cap, bool)
        exyz[:10] = rng.normal(size=(10, 3)).astype(np.float32) * 0.5
        exyz[:10, 2] += 2.0
        ergb[:10] = rng.uniform(size=(10, 3)).astype(np.float32)
        em[:10] = True
        extra = PointSet(exyz, ergb, em)
        got, _ = chunked_dense_voxel_merge(
            depths, bgrs, Rs, ts, scales, keep,
            fx=fx, fy=fy, cx=cx, cy=cy, min_depth=0.1, max_depth=50.0,
            subsample=1, voxel_size=voxel, chunk_views=2, extra=extra)
        flat = _oracle_flat(depths, bgrs, Rs, ts, scales, keep, intr)
        flat_all = PointSet(
            jnp.concatenate([flat.xyz, jnp.asarray(exyz)]),
            jnp.concatenate([flat.rgb, jnp.asarray(ergb)]),
            jnp.concatenate([flat.mask, jnp.asarray(em)]))
        exp = voxel_downsample(flat_all, voxel)
        gx, gc = got.to_numpy()
        ex, ec = exp.to_numpy()
        assert gx.shape == ex.shape
        np.testing.assert_allclose(gx, ex, atol=2e-3)
        np.testing.assert_allclose(gc, ec, atol=2e-3)

    def test_all_invalid_views(self, rng):
        depths, bgrs, Rs, ts, scales, keep, intr = _scene(rng, n=2)
        fx, fy, cx, cy = intr
        keep[:] = False
        got, counts = chunked_dense_voxel_merge(
            depths, bgrs, Rs, ts, scales, keep,
            fx=fx, fy=fy, cx=cx, cy=cy, min_depth=0.1, max_depth=50.0,
            subsample=1, voxel_size=0.1, chunk_views=1)
        assert not np.asarray(got.mask).any()
        assert (counts == 0).all()


class TestPipelineChunkedPath:
    def test_fusion_pipeline_chunked_equals_default(self, tmp_path, rng,
                                                    monkeypatch):
        """Force the chunked path in the fusion CLI pipeline and pin its
        cloud against the default single-program path."""
        import cv2

        from txr.core.config import ReconstructionConfig
        from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline

        h, w = 96, 128
        fx = fy = 110.0
        rgb_dir = tmp_path / "rgb"
        dep_dir = tmp_path / "depth"
        rgb_dir.mkdir()
        dep_dir.mkdir()
        base = np.full((h, w, 3), 70, np.uint8)
        for _ in range(40):
            c = rng.integers(0, 255, 3).tolist()
            p = (int(rng.integers(5, w - 12)), int(rng.integers(5, h - 10)))
            cv2.rectangle(base, p, (p[0] + 6, p[1] + 5), c, -1)
        for i, dx in enumerate([0, 5, 10]):
            M = np.float32([[1, 0, dx], [0, 1, 0]])
            cv2.imwrite(str(rgb_dir / f"f_{i:02d}.png"),
                        cv2.warpAffine(base, M, (w, h)))
            # jittered depth: a CONSTANT plane puts every merged point on a
            # regular grid where kNN mean distances are all tied, the
            # mu+2*sigma outlier threshold sits exactly on the tie, and the
            # removal count flips chaotically with ~ulp noise
            np.save(str(dep_dir / f"f_{i:02d}_depth.npy"),
                    (2.0 + 0.1 * rng.uniform(size=(h, w))
                     ).astype(np.float32))
        cfg = ReconstructionConfig(fx=fx, fy=fy, cx=w / 2.0, cy=h / 2.0,
                                   voxel_size=0.05, subsample_factor=2)

        def run():
            pipe = DepthToReconstructionPipeline(cfg, verbose=False)
            pipe.load_data(str(rgb_dir), str(dep_dir))
            return pipe.reconstruct()

        pts_a, col_a, _ = run()
        monkeypatch.setenv("TXR_DENSE_SINGLE_ROWS", "1")  # force chunked
        pts_b, col_b, _ = run()
        assert pts_a is not None and pts_b is not None
        # The pre-outlier merges are identical up to ~1e-3 float-order noise
        # (pinned exactly in TestChunkedMerge), but the outlier pass
        # auto-tunes its grid cell from the data, so that noise can shift
        # the tuned cell and flip a few percent of borderline points.
        # Contract here: same surface, near-same density.
        assert abs(len(pts_a) - len(pts_b)) <= 0.03 * len(pts_a), (
            len(pts_a), len(pts_b))
        sub = pts_b[:: max(1, len(pts_b) // 500)]
        d = np.sqrt(((sub[:, None, :] - pts_a[None, :, :]) ** 2).sum(-1))
        dmin = d.min(axis=1)
        # Bulk of the surface within a voxel of the other run; the auto-tuned
        # outlier threshold may keep/drop a few isolated borderline points
        # differently between the two float orders (surfaces, not counts).
        assert float(np.quantile(dmin, 0.99)) < 0.05  # voxel_size
        assert int((dmin >= 0.05).sum()) <= 3, dmin[dmin >= 0.05]

    def test_enhanced_pipeline_chunked_runs(self, tmp_path, rng, monkeypatch):
        """Enhanced CLI on the chunked path (sparse extra rows included)."""
        import cv2

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
        for i, dx in enumerate([0, 7, 14]):
            M = np.float32([[1, 0, dx], [0, 1, 0]])
            cv2.imwrite(str(folder / f"im_{i}.png"),
                        cv2.warpAffine(base, M, (160, 120)))
        K = np.array([[130.0, 0, 80], [0, 130.0, 60], [0, 0, 1]])
        monkeypatch.setenv("TXR_DENSE_SINGLE_ROWS", "1")
        rec = DepthEnhancedReconstruction(
            K, use_depth=True, use_hybrid_features=True,
            depth_model=FakeDepthModel(), verbose=False,
            subsample=4, voxel_size=0.05)
        rec.load_images(str(folder))
        result = rec.reconstruct(output_dir=str(tmp_path / "out"))
        assert result is not None
        points, colors, poses = result
        assert len(points) > 100


class TestSequenceChunking:
    """TXR_SEQ_CHUNK slices the pairs/scales programs for long sequences;
    per-pair math is independent, so results must be IDENTICAL."""

    def _scene_dirs(self, tmp_path, rng, n_frames=5):
        import cv2

        h, w = 96, 128
        rgb_dir = tmp_path / "rgb"
        dep_dir = tmp_path / "depth"
        rgb_dir.mkdir()
        dep_dir.mkdir()
        base = np.full((h, w, 3), 70, np.uint8)
        for _ in range(40):
            c = rng.integers(0, 255, 3).tolist()
            p = (int(rng.integers(5, w - 12)), int(rng.integers(5, h - 10)))
            cv2.rectangle(base, p, (p[0] + 6, p[1] + 5), c, -1)
        for i in range(n_frames):
            M = np.float32([[1, 0, 4 * i], [0, 1, 0]])
            cv2.imwrite(str(rgb_dir / f"f_{i:02d}.png"),
                        cv2.warpAffine(base, M, (w, h)))
            np.save(str(dep_dir / f"f_{i:02d}_depth.npy"),
                    (2.0 + 0.1 * rng.uniform(size=(h, w))
                     ).astype(np.float32))
        return str(rgb_dir), str(dep_dir), (h, w)

    def test_fusion_pipeline_seq_chunked_identical(self, tmp_path, rng,
                                                   monkeypatch):
        from txr.core.config import ReconstructionConfig
        from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline

        rgb_dir, dep_dir, (h, w) = self._scene_dirs(tmp_path, rng)
        cfg = ReconstructionConfig(fx=110.0, fy=110.0, cx=w / 2.0,
                                   cy=h / 2.0, voxel_size=0.05,
                                   subsample_factor=2)

        def run():
            pipe = DepthToReconstructionPipeline(cfg, verbose=False)
            pipe.load_data(rgb_dir, dep_dir)
            return pipe.reconstruct()

        monkeypatch.delenv("TXR_SEQ_CHUNK", raising=False)
        pts_a, col_a, poses_a = run()
        monkeypatch.setenv("TXR_SEQ_CHUNK", "1")
        pts_b, col_b, poses_b = run()
        assert pts_a is not None and pts_b is not None
        assert len(poses_a) == len(poses_b)
        for (Ra, ta), (Rb, tb) in zip(poses_a, poses_b):
            np.testing.assert_allclose(Ra, Rb, atol=1e-6)
            np.testing.assert_allclose(ta, tb, atol=1e-6)
        assert len(pts_a) == len(pts_b)
        np.testing.assert_allclose(pts_a, pts_b, atol=1e-6)
        np.testing.assert_allclose(col_a, col_b, atol=1e-6)

    def test_enhanced_pipeline_seq_chunked_identical(self, tmp_path, rng,
                                                     monkeypatch):
        from txr.pipelines.enhanced_pipeline import DepthEnhancedReconstruction

        class FakeDepthModel:
            def infer(self, img, intr=None):
                h, w = img.shape[:2]
                yy = np.linspace(0, 0.4, h, dtype=np.float32)[:, None]
                return 2.0 + yy + np.zeros((h, w), np.float32)

            def infer_batch(self, imgs, intr=None):
                return np.stack([self.infer(im) for im in imgs])

        rgb_dir, _, _ = self._scene_dirs(tmp_path, rng)
        K = np.array([[110.0, 0, 64], [0, 110.0, 48], [0, 0, 1]])

        def run():
            rec = DepthEnhancedReconstruction(
                K, use_depth=True, use_hybrid_features=True,
                depth_model=FakeDepthModel(), verbose=False,
                subsample=4, voxel_size=0.05)
            rec.load_images(rgb_dir)
            return rec.reconstruct(output_dir=str(tmp_path / "out"))

        monkeypatch.delenv("TXR_SEQ_CHUNK", raising=False)
        ra = run()
        monkeypatch.setenv("TXR_SEQ_CHUNK", "1")
        rb = run()
        assert ra is not None and rb is not None
        assert len(ra[0]) == len(rb[0])
        np.testing.assert_allclose(ra[0], rb[0], atol=1e-6)


class TestListInputs:
    def test_list_input_with_none_views(self, rng):
        """Per-view lists (None for skipped views) must merge identically to
        the stacked-array input (review r2: O(chunk) host slabs)."""
        depths, bgrs, Rs, ts, scales, keep, intr = _scene(rng)
        fx, fy, cx, cy = intr
        voxel = 0.12
        dlist = [depths[i] if keep[i] else None for i in range(len(depths))]
        ilist = [bgrs[i] if keep[i] else None for i in range(len(bgrs))]
        got, counts = chunked_dense_voxel_merge(
            dlist, ilist, Rs, ts, scales, keep,
            fx=fx, fy=fy, cx=cx, cy=cy, min_depth=0.1, max_depth=50.0,
            subsample=1, voxel_size=voxel, chunk_views=2)
        flat = _oracle_flat(depths, bgrs, Rs, ts, scales, keep, intr)
        exp = voxel_downsample(flat, voxel)
        gx, gc = got.to_numpy()
        ex, ec = exp.to_numpy()
        assert gx.shape == ex.shape
        np.testing.assert_allclose(gx, ex, atol=2e-3)
        np.testing.assert_allclose(gc, ec, atol=2e-3)
        assert counts[3] == 0 and (counts[:3] > 0).all()
