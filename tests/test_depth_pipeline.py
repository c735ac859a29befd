"""DepthProcessor pipeline tests with a tiny model on CPU."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from txr.core.intrinsics import CameraIntrinsics
from txr.io.sources import FolderSource, PrefetchSource
from txr.io.depth_io import load_depth
from txr.io.ply import read_ply
from txr.models.vit import ViTConfig
from txr.models.dpt import DPTConfig
from txr.models.depth_anything import DepthAnythingFlax, DepthAnythingModel
from txr.pipelines.depth_pipeline import DepthProcessor, PointCloudGenerator


def tiny_model(metric=False, max_depth=20.0):
    m = DepthAnythingModel.__new__(DepthAnythingModel)
    m.version, m.encoder, m.metric, m.dataset = "v2", "vits", metric, "hypersim"
    m.input_size, m.focal_length_ref, m.max_depth = 70, 300.0, max_depth
    vit = ViTConfig(hidden_size=32, num_layers=2, num_heads=2,
                    pos_embed_size=5, out_layers=(0, 0, 1, 1), use_flash=False)
    dpt = DPTConfig(features=16, out_channels=(8, 8, 16, 16), head_hidden=8,
                    metric=metric, max_depth=max_depth)
    m.model = DepthAnythingFlax(vit=vit, dpt=dpt)
    m.params = m.model.init(jax.random.PRNGKey(0), jnp.zeros((1, 70, 70, 3)))["params"]
    m._jitted = {}
    return m


@pytest.fixture(scope="module")
def frame_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    for i in range(12):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"frame_{i:04d}.jpg"), img)
    return str(d)


class TestDepthProcessor:
    def test_images_mode_outputs(self, frame_folder, tmp_path):
        src = FolderSource(frame_folder)
        proc = DepthProcessor(tiny_model(), src, str(tmp_path / "out"), mode="images")
        n = proc.process()
        assert n == 12
        # Reference output contract: npy + 16-bit mm PNG in depth_images/,
        # colormap PNG in visualizations/ (depth_processor.py:905-921).
        depth_dir = tmp_path / "out" / "depth_images"
        vis_dir = tmp_path / "out" / "visualizations"
        npys = sorted(depth_dir.glob("*_depth.npy"))
        pngs = sorted(depth_dir.glob("*_depth.png"))
        viss = sorted(vis_dir.glob("*_depth_vis.png"))
        assert len(npys) == len(pngs) == len(viss) == 12
        d_npy = np.load(npys[0])
        assert d_npy.shape == (48, 64) and d_npy.dtype == np.float32
        d_png = load_depth(str(pngs[0]))
        np.testing.assert_allclose(d_png, d_npy, atol=0.0011)  # mm quantization
        assert not (tmp_path / "out" / "pointclouds").exists()

    def test_pointcloud_mode_outputs(self, frame_folder, tmp_path):
        src = FolderSource(frame_folder)
        proc = DepthProcessor(tiny_model(metric=True, max_depth=5.0), src,
                              str(tmp_path / "out"), mode="pointcloud",
                              pointcloud_downsample=2, max_depth=5.0)
        n = proc.process()
        assert n == 12
        plys = sorted((tmp_path / "out" / "pointclouds").glob("*.ply"))
        assert len(plys) > 0
        xyz, rgb = read_ply(str(plys[0]))
        assert xyz.shape[1] == 3 and rgb is not None
        assert not (tmp_path / "out" / "depth_images").exists()

    def test_no_raw_depth_flag(self, frame_folder, tmp_path):
        src = FolderSource(frame_folder)
        proc = DepthProcessor(tiny_model(), src, str(tmp_path / "out"),
                              mode="images", save_raw_depth=False)
        proc.process()
        assert not list((tmp_path / "out" / "depth_images").glob("*.npy"))
        assert list((tmp_path / "out" / "depth_images").glob("*.png"))

    def test_prefetch_source(self, frame_folder, tmp_path):
        src = PrefetchSource(FolderSource(frame_folder), depth=2)
        proc = DepthProcessor(tiny_model(), src, str(tmp_path / "out"), mode="images")
        assert proc.process() == 12

    def test_batched_matches_sequential(self, frame_folder, tmp_path):
        # The fused micro-batch program (model + vmapped backprojection, one
        # dispatch per 8 frames) must emit the same per-frame artifacts as
        # the reference-exact frame-sequential loop (batch_size=1), including
        # the padded short tail (12 = 8 + 4).
        model = tiny_model(metric=True, max_depth=5.0)
        proc1 = DepthProcessor(model, FolderSource(frame_folder),
                               str(tmp_path / "seq"), mode="both",
                               max_depth=5.0, batch_size=1)
        procB = DepthProcessor(model, FolderSource(frame_folder),
                               str(tmp_path / "bat"), mode="both",
                               max_depth=5.0, batch_size=8)
        assert proc1.process() == 12
        assert procB.process() == 12
        seq_npys = sorted((tmp_path / "seq" / "depth_images").glob("*.npy"))
        bat_npys = sorted((tmp_path / "bat" / "depth_images").glob("*.npy"))
        assert [p.name for p in seq_npys] == [p.name for p in bat_npys]
        for a, b in zip(seq_npys, bat_npys):
            np.testing.assert_allclose(np.load(a), np.load(b),
                                       rtol=2e-3, atol=2e-3)
        seq_plys = sorted((tmp_path / "seq" / "pointclouds").glob("*.ply"))
        bat_plys = sorted((tmp_path / "bat" / "pointclouds").glob("*.ply"))
        assert [p.name for p in seq_plys] == [p.name for p in bat_plys]
        xa, ca = read_ply(str(seq_plys[-1]))
        xb, cb = read_ply(str(bat_plys[-1]))
        assert xa.shape == xb.shape
        np.testing.assert_allclose(xa, xb, rtol=2e-3, atol=2e-3)


class TestPointCloudGenerator:
    def test_camera_frame_points(self):
        intr = CameraIntrinsics(50.0, 50.0, 32.0, 24.0, 64, 48)
        gen = PointCloudGenerator(intr, downsample_factor=1)
        depth = np.full((48, 64), 2.0, np.float32)
        bgr = np.zeros((48, 64, 3), np.uint8)
        bgr[..., 0] = 255  # blue in BGR → (0,0,1) in RGB output colors
        pts, cols = gen.generate(depth, bgr, max_depth=10.0, min_depth=0.1)
        assert len(pts) == 48 * 64
        np.testing.assert_allclose(pts[:, 2], 2.0)
        np.testing.assert_allclose(cols[0], [0, 0, 1], atol=1e-6)
        # Center pixel maps near the optical axis.
        center = pts[24 * 64 + 32]
        np.testing.assert_allclose(center[:2], [0, 0], atol=0.05)


class _FlakyCap:
    """cv2.VideoCapture stand-in that fails reads at given frame indices."""

    def __init__(self, cap, bad):
        self._cap, self._bad, self._pos = cap, set(bad), 0

    def set(self, prop, val):
        self._pos = int(val)
        return self._cap.set(prop, val)

    def read(self):
        if self._pos in self._bad:
            return False, None
        return self._cap.read()

    def release(self):
        self._cap.release()


class TestVideoSourceBadFrames:
    def test_bad_frame_skipped_not_truncated(self, tmp_path):
        """An undecodable frame mid-video is skipped and the remainder still
        plays (reference depth_processor.py:641-651 semantics; review r2)."""
        from txr.io.sources import VideoSource

        vid = str(tmp_path / "in.avi")
        vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10,
                             (64, 48))
        rng = np.random.default_rng(1)
        for _ in range(5):
            vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        vw.release()
        src = VideoSource(vid, fps_mode="all")
        src.cap = _FlakyCap(src.cap, bad=[2])
        names = [name for _, _, name in src]
        assert names == [f"frame_{i:06d}" for i in (0, 1, 3, 4)]


class TestFolderSourceNoCv2:
    def test_folder_source_without_cv2(self, frame_folder, monkeypatch):
        """FolderSource must construct and serve JPEG frames via the native
        decoder when cv2 is absent (review r2)."""
        import txr.io.sources as S
        from txr._native import get_lib

        if get_lib() is None:
            pytest.skip("no native toolchain")
        monkeypatch.setattr(S, "cv2", None)
        monkeypatch.setattr(S, "CV2_AVAILABLE", False)
        src = S.FolderSource(frame_folder)
        img, _, _ = next(src)
        assert img is not None and img.shape == (48, 64, 3)
