"""Homography pose path + pose refinement: planar-degeneracy regression.

The synthetic two-plane golden scene exposed two real defects (measured
against analytic ground truth, scale = 60):
  1. the 8-point essential solve is degenerate on planar correspondence
     sets — its answer flipped with the RANSAC key (scale 25-50);
  2. minimal-solver poses carry ~0.4 deg rotation error that becomes
     25-40% triangulated-depth bias at few-pixel parallax.
pair_step now selects a homography-decomposed pose when H explains the
matches and Gauss-Newton-polishes the winner; end-to-end the recovered
scale must land within a few percent of 60.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.geometry.homography import (decompose_homography, homography_dlt,
                                     homography_ransac,
                                     recover_pose_homography, transfer_error)
from txr.geometry.refine import refine_pose


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def rotmat(ax, ang):
    ax = np.asarray(ax, np.float64)
    ax = ax / np.linalg.norm(ax)
    c, s = np.cos(ang), np.sin(ang)
    Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    return np.eye(3) + s * Kx + (1 - c) * Kx @ Kx


def planar_pair(rng, n=300, noise=0.0):
    K = np.array([[200, 0, 128], [0, 200, 96], [0, 0, 1]], np.float64)
    R = rotmat([0.2, 1.0, 0.1], 0.08)
    t = np.array([1.0, 0.15, -0.1])
    t /= np.linalg.norm(t)
    nrm = np.array([0.1, -0.05, -1.0])
    nrm /= np.linalg.norm(nrm)
    uv1 = rng.uniform([20, 20], [236, 172], (n, 2))
    rays = (np.linalg.inv(K) @ np.c_[uv1, np.ones(n)].T).T
    s = -5.0 / (rays @ nrm)
    X = rays * s[:, None]
    X2 = X @ R.T + t * 0.3
    uv2h = X2 @ K.T
    uv2 = uv2h[:, :2] / uv2h[:, 2:3]
    if noise:
        uv1 = uv1 + rng.normal(0, noise, uv1.shape)
        uv2 = uv2 + rng.normal(0, noise, uv2.shape)
    return (jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(K, jnp.float32), R, t)


class TestHomography:
    def test_dlt_exact(self, rng):
        uv1, uv2, K, R, t = planar_pair(rng, n=50)
        H = homography_dlt(uv1, uv2)
        err = transfer_error(H, uv1, uv2)
        assert float(jnp.max(err)) < 1e-3

    def test_decompose_recovers_pose(self, rng):
        uv1, uv2, K, R_true, t_true = planar_pair(rng)
        mask = jnp.ones(uv1.shape[0], bool)
        H, inl = homography_ransac(uv1, uv2, mask, jax.random.PRNGKey(0))
        assert int(inl.sum()) == uv1.shape[0]
        R, t, good = recover_pose_homography(H, uv1, uv2, K, mask)
        R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)
        ang = np.degrees(np.arccos(np.clip((np.trace(R_true.T @ R) - 1) / 2,
                                           -1, 1)))
        assert ang < 0.1, f"rotation error {ang} deg"
        assert abs(t @ t_true) > 0.999
        assert int(np.asarray(good).sum()) > 0.9 * uv1.shape[0]

    def test_refine_fixes_perturbed_pose(self, rng):
        uv1, uv2, K, R_true, t_true = planar_pair(rng, noise=0.2)
        mask = jnp.ones(uv1.shape[0], bool)
        R0 = jnp.asarray(rotmat([0, 1, 0], np.radians(0.6)) @ R_true,
                         jnp.float32)
        t0 = jnp.asarray(t_true + np.array([0.0, 0.03, -0.03]), jnp.float32)
        t0 = t0 / jnp.linalg.norm(t0)
        R, t = refine_pose(R0, t0, uv1, uv2, K, mask)
        R, t = np.asarray(R, np.float64), np.asarray(t, np.float64)
        ang0 = np.degrees(np.arccos(np.clip(
            (np.trace(R_true.T @ np.asarray(R0, np.float64)) - 1) / 2, -1, 1)))
        ang = np.degrees(np.arccos(np.clip((np.trace(R_true.T @ R) - 1) / 2,
                                           -1, 1)))
        assert ang < ang0 / 3, f"refinement {ang0} -> {ang} deg"
        assert abs(t @ t_true) > 0.9995


class TestPlanarSceneScale:
    def test_two_plane_scene_scale(self, tmp_path):
        """End-to-end regression on the golden scene: recovered depth scale
        within 5% of the analytic 60 (was 25-50 before the H path+refine)."""
        import sys
        sys.path.insert(0, __file__.rsplit("/", 1)[0])
        from test_golden import build_scene, FX, FY, CX, CY
        from txr.core.config import ReconstructionConfig
        from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline

        rgb, dep = build_scene(str(tmp_path))
        cfg = ReconstructionConfig(fx=FX, fy=FY, cx=CX, cy=CY,
                                   voxel_size=0.05, subsample_factor=4)
        pipe = DepthToReconstructionPipeline(cfg, feature_capacity=4096,
                                             verbose=False)
        pipe.load_data(rgb, dep)
        feats = [pipe.detector.detect(im) for im in pipe.images]
        K = jnp.asarray(np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]],
                                 np.float32))
        from txr.pipelines.fusion_pipeline import pair_step
        from txr.geometry.scale import estimate_scale
        uv1, uv2, mm = pipe._match_pair(feats[0], feats[1])
        R, t, X, valid, _ = pair_step(uv1, uv2, mm, K, pipe._next_key(),
                                      cfg.ransac_threshold, cfg.min_depth,
                                      cfg.max_depth)
        s = float(estimate_scale(X, uv1, valid, jnp.asarray(pipe.depths[0])))
        # frames translate 0.1 world units, |t| normalized to 1, depth
        # stored as metric/6 -> true scale = 6.0 / 0.1 = 60.
        assert abs(s - 60.0) < 3.0, f"scale {s}, truth 60"
