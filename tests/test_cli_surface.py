"""CLI argparse-surface parity: the exact invocations BASELINE.json and the
reference README use must parse (no execution — surface only)."""

import argparse
import runpy
import sys

import pytest

_ORIG_PARSE = argparse.ArgumentParser.parse_args


def patch_parser(monkeypatch, argv, captured):
    """Route any ArgumentParser.parse_args to fixed argv, capture, exit
    before the CLI does real work."""

    def fake_parse(self, args=None, namespace=None):
        ns = _ORIG_PARSE(self, argv)
        captured.update(vars(ns))
        raise SystemExit(0)

    monkeypatch.setattr(argparse.ArgumentParser, "parse_args", fake_parse)


def parse_with(script: str, argv: list):
    """Import the CLI module and run only its parser on argv."""
    import importlib.util
    spec = importlib.util.spec_from_file_location("cli_mod", script)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestDepthProcessorSurface:
    def _parse(self, argv):
        mod = parse_with("depth_processor.py", argv)
        old = sys.argv
        sys.argv = ["depth_processor.py"] + argv
        try:
            return mod.parse_args()
        finally:
            sys.argv = old

    def test_baseline_config_images_mode(self):
        # BASELINE.json config 2.
        a = self._parse(["--source", "folder", "--input",
                         "input_folder/exp_tunnel_set1_images_1_fps",
                         "--mode", "images", "--version", "v2",
                         "--encoder", "vits"])
        assert a.mode == "images" and a.encoder == "vits"

    def test_baseline_config_v3_metric_video(self):
        # BASELINE.json config 4.
        a = self._parse(["--version", "v3", "--encoder", "large", "--metric",
                         "--dataset", "vkitti", "--max-depth", "80",
                         "--source", "video", "--video-path", "v.mp4",
                         "--fps-mode", "custom", "--fps-percent", "50",
                         "--mode", "both"])
        assert a.version == "v3" and a.metric and a.max_depth == 80.0
        assert a.fps_percent == 50.0 and a.dataset == "vkitti"

    def test_readme_ros2_invocation(self):
        # README: video + custom fps + ros2 at 10 Hz.
        a = self._parse(["--source", "video", "--video-path", "video.mp4",
                         "--fps-mode", "custom", "--fps-percent", "50",
                         "--ros2", "--ros2-freq", "10", "--mode", "both"])
        assert a.ros2 and a.ros2_freq == 10.0

    def test_all_reference_flags_accepted(self):
        a = self._parse([
            "--version", "v2", "--encoder", "vitl", "--checkpoint", "x.pth",
            "--metric", "--max-depth", "20", "--dataset", "hypersim",
            "--input-size", "518", "--device", "auto",
            "--source", "camera", "--input", "./images", "--device-id", "1",
            "--width", "1280", "--height", "720", "--fps-mode", "1fps",
            "--fps-percent", "100", "--intrinsics", "intr.json",
            "--output", "./out", "--mode", "pointcloud",
            "--pointcloud-downsample", "2", "--min-depth", "0.1",
            "--colormap", "turbo", "--no-raw-depth",
            "--ros2", "--ros2-freq", "10",
            "--depth-topic", "/d", "--pc-topic", "/p", "--frame-id", "cam",
            "--preview", "--verbose",
        ])
        assert a.colormap == "turbo" and a.no_raw_depth and a.preview

    def test_rejects_unknown_colormap(self):
        with pytest.raises(SystemExit):
            self._parse(["--colormap", "rainbow"])


class TestReconstructionSurface:
    def test_readme_folder_invocation(self, monkeypatch):
        """README.md:1-19: reconstruction.py --mode folder --input --output."""
        captured = {}
        patch_parser(monkeypatch, ["--mode", "folder", "--input",
                                   "./my_images/", "--output", "scene.ply"],
                     captured)
        with pytest.raises(SystemExit):
            runpy.run_path("reconstruction.py", run_name="__main__")
        assert captured["mode"] == "folder"
        assert captured["output"] == "scene.ply"

    def test_readme_camera_invocation(self, monkeypatch):
        captured = {}
        patch_parser(monkeypatch, ["--mode", "camera", "--camera", "1",
                                   "--output", "scene.ply"], captured)
        with pytest.raises(SystemExit):
            runpy.run_path("reconstruction.py", run_name="__main__")
        assert captured["camera"] == 1


class TestFusionSurface:
    def test_reference_flags(self, monkeypatch):
        captured = {}
        patch_parser(monkeypatch, [
            "--rgb-folder", "rgb/", "--depth-folder", "depth/",
            "--output", "out.ply", "--fx", "1719", "--fy", "1719",
            "--cx", "540", "--cy", "960", "--voxel-size", "0.005",
            "--subsample", "2", "--no-vis"], captured)
        with pytest.raises(SystemExit):
            runpy.run_path("depth_to_reconstruction.py", run_name="__main__")
        assert captured["voxel_size"] == 0.005 and captured["no_vis"]


class TestEnhancedSurface:
    def test_reference_flags(self, monkeypatch):
        captured = {}
        patch_parser(monkeypatch, [
            "--input", "./input_folder/buddha_images", "--output", "./out",
            "--fx", "1719", "--fy", "1719", "--cx", "540", "--cy", "960",
            "--no-depth", "--no-hybrid"], captured)
        with pytest.raises(SystemExit):
            runpy.run_path("depth_enhanced_reconstruction.py",
                           run_name="__main__")
        assert captured["no_depth"] and captured["no_hybrid"]
        assert captured["input"].endswith("buddha_images")
