"""Geometry tests against synthetic ground-truth two-view scenes.

A random 3D scene is projected into two cameras with a known relative pose;
the epipolar stack must recover F/E/pose/structure. Oracles re-derive the
reference formulas (SURVEY §2.2) in float64 NumPy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from txr.geometry import (
    eight_point,
    sampson_error,
    fundamental_ransac,
    essential_ransac,
    triangulate,
    reprojection_error,
    recover_pose,
    chain_pose,
    masked_median,
    estimate_scale,
    clamp_scale,
    ema_scale,
)


def make_two_view(rng, n=200, noise=0.0, outlier_frac=0.0):
    """Synthetic scene: K, ground-truth (R, t), projections in both views."""
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    # Points in front of camera 1.
    X = np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 8, n)
    ], axis=1)
    angle = 0.15
    R = np.array([
        [np.cos(angle), 0, np.sin(angle)],
        [0, 1, 0],
        [-np.sin(angle), 0, np.cos(angle)],
    ])
    t = np.array([0.5, 0.05, 0.02])
    t = t / np.linalg.norm(t)

    def project(P, X):
        Xh = np.concatenate([X, np.ones((len(X), 1))], axis=1)
        p = Xh @ P.T
        return p[:, :2] / p[:, 2:3]

    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R, t[:, None]])
    uv1 = project(P1, X)
    uv2 = project(P2, X)
    if noise > 0:
        uv1 += rng.normal(0, noise, uv1.shape)
        uv2 += rng.normal(0, noise, uv2.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return K, R, t, X, uv1.astype(np.float32), uv2.astype(np.float32)


def fundamental_from_pose(K, R, t):
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    F = np.linalg.inv(K).T @ E @ np.linalg.inv(K)
    return F / F[2, 2]


class TestEightPoint:
    def test_recovers_f_on_clean_data(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=64)
        F = np.asarray(eight_point(jnp.asarray(uv1), jnp.asarray(uv2)))
        F_gt = fundamental_from_pose(K, R, t)
        # Compare up to sign/scale via normalized Frobenius distance.
        Fn = F / np.linalg.norm(F)
        Gn = F_gt / np.linalg.norm(F_gt)
        err = min(np.linalg.norm(Fn - Gn), np.linalg.norm(Fn + Gn))
        assert err < 5e-3

    def test_epipolar_constraint(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=64)
        F = np.asarray(eight_point(jnp.asarray(uv1), jnp.asarray(uv2)))
        errs = np.asarray(sampson_error(jnp.asarray(F), jnp.asarray(uv1), jnp.asarray(uv2)))
        assert np.median(errs) < 0.01  # sub-hundredth-pixel^2 on clean data

    def test_weighted_rows_excluded(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=64)
        # Corrupt half the rows but zero their weights: result must match clean.
        uv2_bad = uv2.copy()
        uv2_bad[32:] += 500.0
        w = np.zeros(64, np.float32)
        w[:32] = 1.0
        Fa = np.asarray(eight_point(jnp.asarray(uv1), jnp.asarray(uv2_bad), jnp.asarray(w)))
        errs = np.asarray(sampson_error(jnp.asarray(Fa), jnp.asarray(uv1[:32]), jnp.asarray(uv2[:32])))
        assert np.median(errs) < 0.05


class TestRansac:
    def test_rejects_outliers(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=256, noise=0.3, outlier_frac=0.3)
        mask = np.ones(256, bool)
        F, inl = fundamental_ransac(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask),
            jax.random.PRNGKey(0), threshold=3.0, num_hypotheses=512,
        )
        inl = np.asarray(inl)
        assert inl.sum() >= 256 * 0.55  # most inliers kept
        errs = np.asarray(sampson_error(F, jnp.asarray(uv1), jnp.asarray(uv2)))
        assert np.median(errs[inl]) < 3.0

    def test_respects_input_mask(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=128)
        mask = np.zeros(128, bool)
        mask[:64] = True
        F, inl = fundamental_ransac(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask),
            jax.random.PRNGKey(1), num_hypotheses=256,
        )
        assert not np.asarray(inl)[64:].any()

    def test_essential_pose(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=256, noise=0.2, outlier_frac=0.2)
        mask = np.ones(256, bool)
        E, inl = essential_ransac(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask),
            jnp.asarray(K.astype(np.float32)), jax.random.PRNGKey(2),
            threshold=2.0, num_hypotheses=512,
        )
        R_est, t_est, good = recover_pose(E, jnp.asarray(uv1), jnp.asarray(uv2),
                                          jnp.asarray(K.astype(np.float32)), inl)
        R_est, t_est = np.asarray(R_est), np.asarray(t_est)
        rot_err = np.arccos(np.clip((np.trace(R_est @ R.T) - 1) / 2, -1, 1))
        t_err = min(np.linalg.norm(t_est - t), np.linalg.norm(t_est + t))
        assert rot_err < 0.02, f"rotation error {rot_err}"
        assert t_err < 0.05, f"translation error {t_err}"


class TestTriangulate:
    def test_recovers_structure(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=100)
        P1 = (K @ np.hstack([np.eye(3), np.zeros((3, 1))])).astype(np.float32)
        P2 = (K @ np.hstack([R, t[:, None]])).astype(np.float32)
        Xe = np.asarray(triangulate(jnp.asarray(P1), jnp.asarray(P2),
                                    jnp.asarray(uv1), jnp.asarray(uv2)))
        np.testing.assert_allclose(Xe, X, rtol=2e-3, atol=2e-3)

    def test_reprojection_error(self, rng):
        K, R, t, X, uv1, uv2 = make_two_view(rng, n=50)
        P1 = (K @ np.hstack([np.eye(3), np.zeros((3, 1))])).astype(np.float32)
        errs = np.asarray(reprojection_error(jnp.asarray(P1), jnp.asarray(X.astype(np.float32)),
                                             jnp.asarray(uv1)))
        assert errs.max() < 0.1

    def test_chain_pose(self):
        R1 = np.eye(3, dtype=np.float32)
        t1 = np.zeros(3, np.float32)
        Rr = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        tr = np.array([1, 0, 0], np.float32)
        R2, t2 = chain_pose(jnp.asarray(Rr), jnp.asarray(tr), jnp.asarray(R1), jnp.asarray(t1))
        np.testing.assert_allclose(np.asarray(R2), Rr, atol=1e-6)
        np.testing.assert_allclose(np.asarray(t2), tr, atol=1e-6)


class TestScale:
    def test_masked_median(self):
        v = jnp.asarray(np.array([5.0, 1.0, 3.0, 100.0, 2.0], np.float32))
        m = jnp.asarray(np.array([True, True, True, False, True]))
        assert float(masked_median(v, m)) == pytest.approx(2.5)  # median of 1,2,3,5

    def test_masked_median_empty(self):
        v = jnp.zeros(4)
        m = jnp.zeros(4, bool)
        assert float(masked_median(v, m)) == 0.0

    def test_estimate_scale(self, rng):
        h, w = 60, 80
        depth_rel = rng.uniform(0.2, 1.0, (h, w)).astype(np.float32)
        true_scale = 7.3
        m = 40
        u = rng.integers(0, w, m)
        v = rng.integers(0, h, m)
        z = depth_rel[v, u] * true_scale
        xyz = np.stack([np.zeros(m), np.zeros(m), z], axis=1).astype(np.float32)
        uv = np.stack([u, v], axis=1).astype(np.float32)
        s = float(estimate_scale(jnp.asarray(xyz), jnp.asarray(uv),
                                 jnp.ones(m, bool), jnp.asarray(depth_rel)))
        assert s == pytest.approx(true_scale, rel=1e-4)

    def test_estimate_scale_insufficient(self, rng):
        depth = np.ones((10, 10), np.float32)
        xyz = np.ones((4, 3), np.float32)
        uv = np.ones((4, 2), np.float32)
        s = float(estimate_scale(jnp.asarray(xyz), jnp.asarray(uv),
                                 jnp.ones(4, bool), jnp.asarray(depth)))
        assert s == 1.0  # fewer than min_points

    def test_empty_input_returns_default(self):
        """Regression: zero-length sparse input (no triangulated points)
        crashed masked_median with an IndexError; the reference returns
        1.0 here."""
        from txr.geometry.scale import DepthScaleEstimator

        depth = np.ones((10, 10), np.float32)
        s = float(estimate_scale(jnp.zeros((0, 3)), jnp.zeros((0, 2)),
                                 jnp.zeros((0,), bool), jnp.asarray(depth)))
        assert s == 1.0
        assert masked_median(jnp.zeros((0,)), jnp.zeros((0,), bool)) == 0.0
        est = DepthScaleEstimator()
        assert est.estimate_scale(np.zeros((0, 3)), np.zeros((0, 2)),
                                  depth) == 1.0
        # the reference signature also takes (and ignores) K
        assert est.estimate_scale(np.zeros((0, 3)), np.zeros((0, 2)),
                                  depth, np.eye(3)) == 1.0

    def test_pixel_lookup_truncates_like_reference(self):
        """Regression: the reference reads depth at int(u), int(v)
        (truncation); rounding read the neighboring pixel for half of all
        sub-pixel keypoints — 100x scale divergence at discontinuities."""
        depth = np.ones((4, 4), np.float32)
        depth[:, 3] = 100.0
        # keypoint at u=2.6: int() reads column 2 (depth 1), round() would
        # read column 3 (depth 100)
        xyz = np.array([[0, 0, 5.0]] * 3, np.float32)
        uv = np.array([[2.6, 1.2]] * 3, np.float32)
        s = float(estimate_scale(jnp.asarray(xyz), jnp.asarray(uv),
                                 jnp.ones(3, bool), jnp.asarray(depth),
                                 min_points=0))
        assert s == pytest.approx(5.0)

    def test_per_sample_clamp_matches_reference(self):
        """depth_to_reconstruction.py:305-316 keeps each ratio only if
        0.001 < s < 1000 BEFORE the median; near-zero-depth outliers must
        not drag the median (they did when only the result was clamped)."""
        depth = np.ones((8, 8), np.float32)
        z = np.array([0.0005] * 4 + [2.0, 2.1, 2.2], np.float32)
        xyz = np.stack([np.zeros(7), np.zeros(7), z], 1).astype(np.float32)
        uv = np.tile(np.array([[3.0, 3.0]], np.float32), (7, 1))
        s = float(estimate_scale(jnp.asarray(xyz), jnp.asarray(uv),
                                 jnp.ones(7, bool), jnp.asarray(depth),
                                 min_points=0, per_sample_clamp=True))
        assert s == pytest.approx(2.1)
        # without the per-sample gate the median lands on the outliers
        s_raw = float(estimate_scale(jnp.asarray(xyz), jnp.asarray(uv),
                                     jnp.ones(7, bool), jnp.asarray(depth),
                                     min_points=0))
        assert s_raw == pytest.approx(0.0005)

    def test_clamp_and_ema(self):
        assert float(clamp_scale(jnp.asarray(5000.0))) == 1.0
        assert float(clamp_scale(jnp.asarray(0.5))) == 0.5
        assert float(ema_scale(1.0, 2.0)) == pytest.approx(1.3)
