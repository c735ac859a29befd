"""End-to-end test of the fusion pipeline on a synthetic scene.

Scene: a textured foreground square at Z=3 over a textured background plane at
Z=6, viewed by cameras translating along x. RGB and (relative) depth are
rendered consistently, so the pipeline must recover the metric scale from SfM
and fuse a cloud whose points lie at the two known depths.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from txr.core.config import ReconstructionConfig
from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline
from txr.io.ply import read_ply

W, H = 320, 240
FX = FY = 260.0
CX, CY = W / 2.0, H / 2.0
Z_FG, Z_BG = 3.0, 6.0
REL_SCALE = 7.0  # depth maps are stored divided by this; SfM must recover it


def _texture(rng, size=512):
    """Blocky high-contrast texture with plenty of corners for SIFT."""
    small = rng.integers(0, 255, (size // 8, size // 8, 3), dtype=np.uint8)
    return cv2.resize(small, (size, size), interpolation=cv2.INTER_NEAREST)


def _render(tx, fg_tex, bg_tex):
    """Render RGB + depth for a camera at (tx, 0, 0), optical axis +z."""
    vv, uu = np.mgrid[0:H, 0:W].astype(np.float64)
    rx = (uu - CX) / FX
    ry = (vv - CY) / FY

    def world_at(z):
        return rx * z + tx, ry * z

    # Background plane at Z_BG, world extent mapped onto the texture.
    bx, by = world_at(Z_BG)
    img = np.zeros((H, W, 3), np.uint8)
    depth = np.full((H, W), Z_BG, np.float32)

    def sample(tex, wx, wy, span):
        ti = np.clip(((wx + span) / (2 * span) * (tex.shape[1] - 1)), 0, tex.shape[1] - 1).astype(int)
        tj = np.clip(((wy + span) / (2 * span) * (tex.shape[0] - 1)), 0, tex.shape[0] - 1).astype(int)
        return tex[tj, ti]

    img[:] = sample(bg_tex, bx, by, 4.5)

    # Foreground square [-0.8, 0.8]^2 at Z_FG.
    fx_w, fy_w = world_at(Z_FG)
    fg_mask = (np.abs(fx_w) < 0.8) & (np.abs(fy_w) < 0.8)
    fg_pix = sample(fg_tex, fx_w, fy_w, 0.9)
    img[fg_mask] = fg_pix[fg_mask]
    depth[fg_mask] = Z_FG
    return img, depth


@pytest.fixture(scope="module")
def scene_dirs(tmp_path_factory):
    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("scene")
    rgb_dir = root / "rgb"
    depth_dir = root / "depth"
    rgb_dir.mkdir()
    depth_dir.mkdir()
    fg_tex = _texture(rng)
    bg_tex = _texture(rng)
    for i, tx in enumerate([0.0, 0.12, 0.24]):
        img, depth = _render(tx, fg_tex, bg_tex)
        cv2.imwrite(str(rgb_dir / f"frame_{i:03d}.png"), img)
        np.save(depth_dir / f"frame_{i:03d}_depth.npy", depth / REL_SCALE)
    return str(rgb_dir), str(depth_dir)


_backend_clouds = {}  # backend -> fused points, for cross-backend comparison


class TestFusionPipeline:
    @pytest.mark.parametrize("backend", ["cv2", "device"])
    def test_end_to_end(self, scene_dirs, tmp_path, monkeypatch, backend):
        rgb_dir, depth_dir = scene_dirs
        if backend == "device":
            # Tripwire: the device backend must make ZERO cv2 feature calls
            # (VERDICT r1 item 3) — the full RGB→features→pose→fused-PLY
            # path runs on the TPU-native kernels.
            for name in ("SIFT_create", "ORB_create", "createCLAHE",
                         "createLineSegmentDetector", "Canny"):
                monkeypatch.setattr(
                    cv2, name,
                    lambda *a, _n=name, **k: (_ for _ in ()).throw(
                        AssertionError(f"cv2.{_n} called on device backend")),
                    raising=False)
        cfg = ReconstructionConfig(
            fx=FX, fy=FY, cx=CX, cy=CY,
            voxel_size=0.05, subsample_factor=4,
        )
        pipe = DepthToReconstructionPipeline(cfg, feature_capacity=4096,
                                             verbose=False,
                                             feature_backend=backend)
        assert pipe.load_data(rgb_dir, depth_dir) == 3

        points, colors, poses = pipe.reconstruct()
        assert points is not None and len(points) > 500
        assert len(poses) == 3

        # Cameras must have moved predominantly along +x with |t| growing.
        centers = [-R.T @ t.reshape(3) for R, t in poses]
        assert abs(centers[1][0]) > 3 * abs(centers[1][1])

        # The fused cloud must show both depth layers: the two dominant modes
        # of z should be in roughly the ratio Z_BG/Z_FG = 2.
        z = points[:, 2]
        lo, hi = np.percentile(z, [20, 85])
        assert hi / max(lo, 1e-6) > 1.5, "expected two depth layers in fused cloud"

        # Save and re-read PLY.
        out = str(tmp_path / "recon.ply")
        pipe.save_reconstruction(points, colors, out)
        rx, rc = read_ply(out)
        assert rx.shape[0] == len(points)

        # Cross-backend agreement: both backends must reconstruct the same
        # scene (one-sided chamfer in units of the recovered scene scale).
        _backend_clouds[backend] = points
        if len(_backend_clouds) == 2:
            a, b = _backend_clouds["device"], _backend_clouds["cv2"]
            sub = a[np.random.default_rng(0).choice(len(a), 800, replace=False)]
            d = np.sqrt(((sub[:, None] - b[None]) ** 2).sum(-1)).min(1)
            scene = np.percentile(b[:, 2], 85)
            assert np.median(d) / scene < 0.01, (
                f"device vs cv2 cloud diverges: median nn dist {np.median(d):.3f}")

    def test_mixed_resolution_frames(self, scene_dirs, tmp_path):
        """Folders may mix frame resolutions; the reference's per-frame loop
        tolerated that (depth_to_reconstruction.py:439-477 resizes depth to
        each frame). Regression: the sequence-batched path crashed in
        np.stack on non-uniform shapes — it must pad to the max frame shape
        and still reconstruct."""
        rgb_dir, depth_dir = scene_dirs
        mix_rgb = tmp_path / "rgb"
        mix_depth = tmp_path / "depth"
        mix_rgb.mkdir()
        mix_depth.mkdir()
        for name in sorted(os.listdir(rgb_dir)):
            base = os.path.splitext(name)[0]
            img = cv2.imread(os.path.join(rgb_dir, name))
            depth = np.load(os.path.join(depth_dir, base + "_depth.npy"))
            if base.endswith("002"):  # last frame arrives at a larger size
                img = cv2.resize(img, (W + 64, H + 48),
                                 interpolation=cv2.INTER_LINEAR)
            cv2.imwrite(str(mix_rgb / name), img)
            np.save(mix_depth / f"{base}_depth.npy", depth)
        cfg = ReconstructionConfig(fx=FX, fy=FY, cx=CX, cy=CY,
                                   voxel_size=0.05, subsample_factor=4)
        pipe = DepthToReconstructionPipeline(cfg, feature_capacity=4096,
                                             verbose=False)
        assert pipe.load_data(str(mix_rgb), str(mix_depth)) == 3
        points, colors, poses = pipe.reconstruct()
        assert points is not None and len(points) > 500
        assert np.isfinite(points).all()

    def test_insufficient_images(self, tmp_path):
        cfg = ReconstructionConfig()
        pipe = DepthToReconstructionPipeline(cfg, verbose=False)
        pts, cols, poses = pipe.reconstruct()
        assert pts is None
