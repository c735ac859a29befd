"""Real-data golden regression on the committed tunnel sequence (VERDICT r4
missing #3 / ask #6).

Every other committed golden is synthetic; this one runs the fusion
pipeline on REAL frames from the reference's own validation dataset
(`/root/reference/input_folder/exp_tunnel_set1_images_2_fps` — SURVEY §4:
the reference's de-facto test strategy is exactly these tunnel captures),
so feature detection, matching, RANSAC pose recovery, and scale estimation
all see real textureless-tunnel image statistics. Round 3's defining
regression (the grid-outlier sentinel collapse) was invisible to analytic
scenes; a pin on real-image output catches that class.

Depth maps are synthesized analytically (a corridor depth prior: walls /
floor / ceiling by perspective geometry, identical every frame — a
forward-moving camera in a uniform corridor sees a stationary depth
field), keeping the test deterministic with zero egress while the IMAGE
path stays fully real.

Regenerate after an intentional algorithm change with:
    python -m tests.test_tunnel_golden
"""

import glob
import os
import shutil

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

TUNNEL = "/root/reference/input_folder/exp_tunnel_set1_images_2_fps"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tunnel_scene.ply")
N_FRAMES = 6
W, H = 640, 480
# Reference-style webcam intrinsics for the 640x480 tunnel captures
# (CameraIntrinsics.default uses fx = 0.8*w).
FX = FY = 512.0
CX, CY = W / 2.0, H / 2.0


def corridor_depth(h=H, w=W, fx=FX, fy=FY, cx=CX, cy=CY,
                   half_w=2.0, half_h=1.5, far=12.0):
    """Analytic corridor z-depth: first hit among side walls (x = ±half_w),
    floor/ceiling (y = ±half_h), capped by an end wall at z = far."""
    vv, uu = np.mgrid[0:h, 0:w].astype(np.float64)
    rx = (uu - cx) / fx
    ry = (vv - cy) / fy
    with np.errstate(divide="ignore"):
        t_wall = half_w / np.abs(rx)
        t_fc = half_h / np.abs(ry)
    z = np.minimum(np.minimum(t_wall, t_fc), far)
    return z.astype(np.float32)


def build_dataset(tmpdir):
    rgb_dir = os.path.join(tmpdir, "rgb")
    depth_dir = os.path.join(tmpdir, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)
    frames = sorted(glob.glob(os.path.join(TUNNEL, "*.jpg")))[:N_FRAMES]
    assert len(frames) == N_FRAMES, "reference tunnel dataset missing"
    depth_rel = corridor_depth() / 12.0  # relative units; SfM recovers scale
    for f in frames:
        stem = os.path.splitext(os.path.basename(f))[0]
        shutil.copy(f, os.path.join(rgb_dir, stem + ".jpg"))
        np.save(os.path.join(depth_dir, stem + "_depth.npy"), depth_rel)
    return rgb_dir, depth_dir


def run_pipeline(tmpdir, feature_backend="cv2"):
    from txr.core.config import ReconstructionConfig
    from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline

    rgb_dir, depth_dir = build_dataset(tmpdir)
    cfg = ReconstructionConfig(fx=FX, fy=FY, cx=CX, cy=CY,
                               voxel_size=0.05, subsample_factor=4,
                               max_depth=1000.0)
    # capacity 2048 (~matching the real tunnel keypoint counts) keeps this
    # default-tier test's pair programs small; 6 frames of the 170-frame
    # sequence carry the same real-image statistics as 8 did while cutting
    # the gate's single biggest test (~350 s -> ~2 min wall).
    pipe = DepthToReconstructionPipeline(cfg, feature_capacity=2048,
                                         verbose=False,
                                         feature_backend=feature_backend)
    pipe.load_data(rgb_dir, depth_dir)
    points, colors, poses = pipe.reconstruct()
    return points, colors


class TestTunnelGolden:
    def _check(self, points, backend):
        from txr.io.ply import read_ply
        from txr.utils.chamfer import chamfer_distance

        gold, _ = read_ply(GOLDEN)
        # Real-data pins: the cloud must exist at roughly the golden's
        # size (count band) and extent, and lie on the golden surface.
        assert len(points) > 0.5 * len(gold), \
            f"{backend}: cloud collapsed ({len(points)} vs {len(gold)})"
        assert len(points) < 2.0 * len(gold), \
            f"{backend}: cloud exploded ({len(points)} vs {len(gold)})"
        for ax in range(3):
            span_p = points[:, ax].max() - points[:, ax].min()
            span_g = gold[:, ax].max() - gold[:, ax].min()
            assert span_p > 0.5 * span_g, \
                f"{backend}: axis {ax} extent shrank {span_p} vs {span_g}"
        scene = float(np.percentile(gold[:, 2], 85))
        d = chamfer_distance(points, gold)
        if backend == "cv2":
            assert d < 0.01 * scene, f"chamfer vs tunnel golden = {d}"
        else:
            # Device backend: same surface, looser numeric bar (different
            # feature detector → different inlier sets).
            assert d < 0.05 * scene, f"device chamfer vs tunnel golden = {d}"

    def test_fusion_cv2_matches_golden(self, tmp_path):
        if not os.path.exists(GOLDEN):
            pytest.skip("golden not generated (python -m tests.test_tunnel_golden)")
        points, _ = run_pipeline(str(tmp_path), feature_backend="cv2")
        self._check(points, "cv2")

    @pytest.mark.slow
    def test_fusion_device_matches_golden(self, tmp_path):
        if not os.path.exists(GOLDEN):
            pytest.skip("golden not generated (python -m tests.test_tunnel_golden)")
        points, _ = run_pipeline(str(tmp_path), feature_backend="device")
        self._check(points, "device")


class TestTunnelStreaming:
    def test_streaming_on_real_frames(self, tmp_path):
        """Streaming CLI path on real tunnel frames with the analytic
        corridor depth model: map must be non-empty, bounded, and the
        occupancy-grid product must contain wall structure."""
        from txr.core.config import StreamingConfig
        from txr.core.intrinsics import CameraIntrinsics
        from txr.fusion.offset_map import offset_map_size
        from txr.io.sources import make_source
        from txr.pipelines.streaming import StreamingReconstructor

        class CorridorModel:
            def infer(self, img, intr=None):
                return corridor_depth(img.shape[0], img.shape[1])

        intr = CameraIntrinsics(fx=FX, fy=FY, cx=CX, cy=CY,
                                width=W, height=H)
        cfg = StreamingConfig(voxel_size=0.05, subsample_factor=4,
                              max_depth=15.0)
        rec = StreamingReconstructor(intrinsics=intr,
                                     depth_model=CorridorModel(),
                                     config=cfg, metric_depth=True,
                                     verbose=False, fused=False)
        src = make_source("folder", input_path=TUNNEL, fps_mode="all")
        n = rec.run(src, max_frames=6)
        assert n >= 4, f"streaming fused only {n}/6 real frames"
        voxels = int(offset_map_size(rec.map))
        assert voxels > 10_000, f"map nearly empty: {voxels} voxels"
        grid = rec.save_grid(str(tmp_path / "tunnel_grid"), cell_size=0.25,
                             range_max=15.0)
        assert (grid == 100).any(), "no occupied cells from tunnel walls"


def main():
    """Regenerate the committed tunnel golden (cv2 backend, CPU platform —
    the same backend the default-tier test runs under via conftest)."""
    import tempfile

    import jax
    jax.config.update("jax_platforms", "cpu")

    from txr.io.ply import write_ply

    with tempfile.TemporaryDirectory() as td:
        points, colors = run_pipeline(td, feature_backend="cv2")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    write_ply(GOLDEN, points, colors)
    print(f"wrote {GOLDEN}: {len(points)} points, "
          f"z span {points[:, 2].min():.2f}..{points[:, 2].max():.2f}")


if __name__ == "__main__":
    main()
