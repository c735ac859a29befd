"""Tests for core types, intrinsics, PLY codec, and depth I/O."""

import json
import os

import numpy as np
import pytest

from txr.core.intrinsics import CameraIntrinsics
from txr.core.config import ReconstructionConfig
from txr.io.ply import write_ply, read_ply
from txr.io.depth_io import (
    load_depth,
    save_depth_png16,
    save_depth_npy,
    find_matching_depth,
    depth_to_colormap,
)


class TestIntrinsics:
    def test_default_focal(self):
        intr = CameraIntrinsics.default(1000, 500)
        assert intr.fx == pytest.approx(800.0)
        assert intr.cx == pytest.approx(500.0)
        assert intr.cy == pytest.approx(250.0)

    def test_json_aliases(self, tmp_path):
        p = tmp_path / "intr.json"
        p.write_text(json.dumps({
            "focal_length_x": 700, "focal_length_y": 710,
            "principal_point_x": 320, "principal_point_y": 240,
            "image_width": 640, "image_height": 480,
        }))
        intr = CameraIntrinsics.from_json(str(p))
        assert intr.fx == 700 and intr.fy == 710
        assert intr.width == 640

    def test_matrix_roundtrip(self):
        intr = CameraIntrinsics(600, 610, 320, 240, 640, 480)
        K = intr.to_matrix()
        back = CameraIntrinsics.from_matrix(K, 640, 480)
        assert back.fx == intr.fx and back.cy == intr.cy

    def test_scaled(self):
        intr = CameraIntrinsics(600, 600, 320, 240, 640, 480)
        s = intr.scaled(1280, 960)
        assert s.fx == 1200 and s.cx == 640 and s.height == 960

    def test_realsense_preset(self):
        d = CameraIntrinsics.realsense_d455()
        assert d.depth_scale == 0.001 and d.width == 1280

    def test_config_K(self):
        cfg = ReconstructionConfig()
        K = cfg.K
        assert K[0, 0] == 1719.0 and K[1, 2] == 960.0


class TestPLY:
    @pytest.mark.parametrize("binary", [True, False])
    @pytest.mark.parametrize("double", [True, False])
    def test_roundtrip(self, tmp_path, rng, binary, double):
        xyz = rng.normal(size=(50, 3)).astype(np.float32)
        rgb = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        p = str(tmp_path / "cloud.ply")
        write_ply(p, xyz, rgb, binary=binary, double_precision=double)
        rx, rc = read_ply(p)
        tol = 1e-6 if double else 1e-5
        np.testing.assert_allclose(rx, xyz, rtol=tol, atol=1e-4)
        np.testing.assert_allclose(rc, np.round(rgb * 255) / 255.0, atol=1 / 255.0)

    def test_no_color(self, tmp_path, rng):
        xyz = rng.normal(size=(10, 3))
        p = str(tmp_path / "c.ply")
        write_ply(p, xyz)
        rx, rc = read_ply(p)
        assert rc is None and rx.shape == (10, 3)


class TestDepthIO:
    def test_png16_roundtrip(self, tmp_path, rng):
        depth = rng.uniform(0.1, 5.0, (32, 32)).astype(np.float32)
        p = str(tmp_path / "d.png")
        save_depth_png16(p, depth)
        back = load_depth(p)
        np.testing.assert_allclose(back, depth, atol=0.0011)  # mm quantization

    def test_npy_roundtrip(self, tmp_path, rng):
        depth = rng.uniform(0.1, 5.0, (16, 16)).astype(np.float32)
        p = str(tmp_path / "d.npy")
        save_depth_npy(p, depth)
        np.testing.assert_array_equal(load_depth(p), depth)

    def test_find_matching_depth(self, tmp_path):
        (tmp_path / "depth").mkdir()
        np.save(tmp_path / "depth" / "frame_001_depth.npy", np.zeros((4, 4), np.float32))
        got = find_matching_depth(str(tmp_path / "rgb" / "frame_001.jpg"), str(tmp_path / "depth"))
        assert got is not None and got.endswith("frame_001_depth.npy")
        assert find_matching_depth("nope.jpg", str(tmp_path / "depth")) is None

    def test_colormap(self, rng):
        depth = rng.uniform(0, 2, (8, 8)).astype(np.float32)
        vis = depth_to_colormap(depth, "jet")
        assert vis.shape == (8, 8, 3) and vis.dtype == np.uint8
