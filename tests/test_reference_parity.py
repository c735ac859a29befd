"""Black-box parity against the ACTUAL reference CLI (CPU-runnable).

Runs /root/reference/depth_to_reconstruction.py on the synthetic two-plane
golden scene and compares its PLY to ours. Findings this test encodes
(measured 2026-08-17):

- The reference recovers depth scale 62.0 vs the analytic 60 (cv2 5-point
  + its scale median; ~3% high) and then HARD-DROPS the far plane — scale
  error pushes it past its fixed max_depth=50 — so its cloud contains only
  the near plane (2187 points).
- Ours recovers scale 60.03 (homography path + Gauss-Newton refinement,
  tests/test_homography.py) and keeps both planes.

Therefore the parity bar is ONE-SIDED: every reference point must be close
to our cloud (we reconstruct a superset, more accurately); the residual
one-sided chamfer is the reference's own 3% scale error on z≈25 geometry.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REF_CLI = "/root/reference/depth_to_reconstruction.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF_CLI),
                                reason="reference checkout not mounted")


def one_sided_chamfer(a, b):
    """mean over a of min distance to b (small a/b sizes — exact)."""
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return float(d.min(axis=1).mean())


class TestReferenceParity:
    def test_fusion_cli_output_covers_reference(self, tmp_path):
        sys.path.insert(0, os.path.dirname(__file__))
        from test_golden import build_scene, FX, FY, CX, CY

        rgb, dep = build_scene(str(tmp_path))
        ref_ply = str(tmp_path / "ref.ply")
        args = ["--rgb-folder", rgb, "--depth-folder", dep,
                "--fx", str(FX), "--fy", str(FY),
                "--cx", str(CX), "--cy", str(CY),
                "--voxel-size", "0.05", "--subsample", "4", "--no-vis"]
        r = subprocess.run([sys.executable, REF_CLI, "--output", ref_ply]
                           + args, capture_output=True, text=True,
                           timeout=600, cwd=str(tmp_path))
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.exists(ref_ply)

        from txr.core.config import ReconstructionConfig
        from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline
        from txr.io.ply import read_ply

        cfg = ReconstructionConfig(fx=FX, fy=FY, cx=CX, cy=CY,
                                   voxel_size=0.05, subsample_factor=4)
        pipe = DepthToReconstructionPipeline(cfg, feature_capacity=4096,
                                             verbose=False)
        pipe.load_data(rgb, dep)
        points, colors, poses = pipe.reconstruct()

        ref_pts, _ = read_ply(ref_ply)
        assert len(ref_pts) > 500
        d = one_sided_chamfer(ref_pts, points)
        # residual = the reference's own ~3% scale error at z~25
        assert d < 1.5, f"one-sided chamfer ref->ours = {d}"
        # and we must NOT have lost the far plane the reference drops
        zspan = points[:, 2].max() - points[:, 2].min()
        assert zspan > 15.0, f"z span {zspan} — far plane missing"
