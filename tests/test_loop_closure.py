"""Loop closure: SE(3) pose graph + streaming keyframe integration.

The reference delegates global pose consistency to rtabmap_slam
(slam.launch.py:126-145); the rebuild's equivalent is
txr/geometry/pose_graph.py + the keyframe machinery in
txr/pipelines/streaming.py. Done-criterion from VERDICT r1 item 5: measured
drift reduction (end-to-start translation error) on a looped replay vs the
frame-to-frame-only path.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from txr.geometry.pose_graph import (optimize_pose_graph, se3_exp, se3_log,
                                     so3_exp, so3_log)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        for _ in range(20):
            xi = rng.normal(size=6) * 0.8
            np.testing.assert_allclose(se3_log(se3_exp(xi)), xi,
                                       rtol=1e-6, atol=1e-8)

    def test_so3_roundtrip_near_pi(self):
        w = np.array([0.0, 0.0, np.pi - 1e-4])
        np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-5)

    def test_so3_near_pi_mixed_sign_axis(self):
        """Regression: axes with a ~zero x component need the y/z RELATIVE
        sign, which lives in A[1,2] — the old per-component sqrt + A[0,*]
        sign fix returned the log of a different rotation."""
        for axis in ([0.0, 1.0, -1.0], [0.0, -1.0, 1.0], [1e-9, 1.0, 1.0],
                     [0.3, -0.7, 0.648], [-1.0, 0.0, 1.0], [0.0, 0.0, -1.0]):
            a = np.asarray(axis) / np.linalg.norm(axis)
            for th in (np.pi - 1e-7, np.pi - 5e-7, np.pi):
                w = a * th
                R = so3_exp(w)
                w2 = so3_log(R)
                # log is two-valued at exactly pi: compare rotations
                np.testing.assert_allclose(so3_exp(w2), R, atol=1e-6,
                                           err_msg=f"axis {axis} th {th}")


class TestPoseGraph:
    def _circle_problem(self, rng, n=20, noise=0.02):
        """Ground-truth poses on a circle; noisy odometry; exact loop edge."""
        gt = []
        for k in range(n):
            th = 2 * np.pi * k / n
            R = so3_exp(np.array([0, 0, th]))
            c = np.array([np.cos(th), np.sin(th), 0.0]) * 5.0
            t = -R @ c
            gt.append((R, t))

        def rel(a, b):
            Rab = b[0] @ a[0].T
            tab = b[1] - Rab @ a[1]
            return Rab, tab

        # integrate noisy odometry
        est = [gt[0]]
        meas = []
        for k in range(n - 1):
            Rab, tab = rel(gt[k], gt[k + 1])
            Rn = so3_exp(rng.normal(size=3) * noise) @ Rab
            tn = tab + rng.normal(size=3) * noise
            meas.append((k, k + 1, Rn, tn, 1.0))
            Rp, tp = est[-1]
            est.append((Rn @ Rp, Rn @ tp + tn))
        # exact loop edge: last node -> first
        Rl, tl = rel(gt[0], gt[n - 1])
        meas.append((0, n - 1, Rl, tl, 5.0))
        return gt, est, meas

    def test_loop_reduces_drift(self, rng):
        gt, est, meas = self._circle_problem(rng)
        n = len(gt)

        def end_err(poses):
            R, t = poses[-1]
            c = -R.T @ t
            Rg, tg = gt[-1]
            cg = -Rg.T @ tg
            return float(np.linalg.norm(c - cg))

        before = end_err(est)
        opt = optimize_pose_graph(est, meas, fixed=0)
        after = end_err(opt)
        assert before > 0.05, f"circle odometry produced no drift ({before})"
        assert after < 0.3 * before, (before, after)

    def test_consistent_graph_is_fixed_point(self, rng):
        gt, _, _ = self._circle_problem(rng, noise=0.0)
        meas = []
        for k in range(len(gt) - 1):
            Rab = gt[k + 1][0] @ gt[k][0].T
            tab = gt[k + 1][1] - Rab @ gt[k][1]
            meas.append((k, k + 1, Rab, tab, 1.0))
        opt = optimize_pose_graph(gt, meas, fixed=0, iterations=3)
        for (Ro, to), (Rn, tn) in zip(gt, opt):
            np.testing.assert_allclose(Rn, Ro, atol=1e-6)
            np.testing.assert_allclose(tn, to, atol=1e-6)


class FakeDepthModel:
    """Planar-ish depth with horizontal gradient (non-degenerate scale)."""

    def infer(self, img, intr=None):
        h, w = img.shape[:2]
        xx = np.linspace(0, 1, w, dtype=np.float32)[None, :]
        yy = np.linspace(0, 1, h, dtype=np.float32)[:, None]
        return 2.0 + 0.5 * xx + 0.3 * yy


def _pingpong_frames(rng, n_fwd=9, w=200, h=150, step=5):
    base = np.full((h, w, 3), 90, np.uint8)
    for _ in range(80):
        c = rng.integers(0, 255, 3).tolist()
        p = (int(rng.integers(5, w - 15)), int(rng.integers(5, h - 12)))
        cv2.rectangle(base, p, (p[0] + 7, p[1] + 6), c, -1)
    shifts = list(range(0, n_fwd * step, step))
    shifts = shifts + shifts[-2::-1]          # ping-pong back to start
    frames = []
    for dx in shifts:
        M = np.float32([[1, 0, -dx], [0, 1, 0]])
        f = cv2.warpAffine(base, M, (w, h), borderMode=cv2.BORDER_REFLECT)
        noise = rng.normal(0, 6, f.shape)
        frames.append(np.clip(f.astype(np.float32) + noise, 0, 255
                              ).astype(np.uint8))
    return frames


_run_cache: dict = {}


class TestStreamingLoopClosure:
    def _run(self, frames, loop_closure):
        # Frames are deterministic (function-scoped rng, fixed seed), so the
        # two tests below can share one reconstruction per closure setting —
        # each run costs ~40 s of XLA-CPU execution on this 1-CPU box.
        if loop_closure in _run_cache:
            return _run_cache[loop_closure]
        from txr.core.config import StreamingConfig
        from txr.core.intrinsics import CameraIntrinsics
        from txr.pipelines.streaming import StreamingReconstructor

        h, w = frames[0].shape[:2]
        intr = CameraIntrinsics(fx=160.0, fy=160.0, cx=w / 2.0, cy=h / 2.0,
                                width=w, height=h)
        cfg = StreamingConfig(voxel_size=0.05, max_map_points=1 << 17,
                              subsample_factor=4, keyframe_every=2,
                              loop_closure=loop_closure,
                              loop_min_separation=4, loop_stride=1,
                              loop_inliers=25, kf_cloud_points=4096)
        rec = StreamingReconstructor(intr, depth_model=FakeDepthModel(),
                                     config=cfg, use_icp=False, verbose=False)
        for i, f in enumerate(frames):
            rec.process_frame(f, float(i), str(i))
        _run_cache[loop_closure] = rec
        return rec

    def test_pingpong_drift_reduced(self, rng):
        frames = _pingpong_frames(rng)
        off = self._run(frames, loop_closure=False)
        on = self._run(frames, loop_closure=True)
        assert on.loops_closed >= 1, "no loop was closed on a looped replay"

        def end_center(rec):
            R, t = rec.poses[-1]
            return -R.T @ t

        # The replay ends where it started: the end-to-start translation
        # error IS the accumulated drift.
        drift_off = float(np.linalg.norm(end_center(off)))
        drift_on = float(np.linalg.norm(end_center(on)))
        assert drift_off > 1e-5, "no drift accumulated; test is vacuous"
        assert drift_on < drift_off, (drift_on, drift_off)

    def test_segment_moves_rigidly_with_keyframe(self, rng, monkeypatch):
        """Regression: loop-closure propagation must preserve each frame's
        pose RELATIVE to its keyframe (T_p T_a^-1 invariant). The old
        left-composition rotated orientations in place without moving
        camera centers with the keyframe."""
        from txr.core.config import StreamingConfig
        from txr.core.intrinsics import CameraIntrinsics
        from txr.core.types import PointSet
        from txr.pipelines import streaming as streaming_mod

        intr = CameraIntrinsics(fx=100.0, fy=100.0, cx=50.0, cy=50.0,
                                width=100, height=100)
        cfg = StreamingConfig(voxel_size=0.05, max_map_points=1 << 12,
                              loop_closure=True)
        rec = streaming_mod.StreamingReconstructor(
            intr, depth_model=FakeDepthModel(), config=cfg,
            use_icp=False, verbose=False)

        old_poses = []
        for _ in range(6):
            R = so3_exp(rng.normal(size=3) * 0.4).astype(np.float32)
            t = rng.normal(size=3).astype(np.float32)
            old_poses.append((R, t))
        rec.poses = [(R.copy(), t.copy()) for R, t in old_poses]
        cloud = PointSet(rng.normal(size=(8, 3)).astype(np.float32),
                         np.zeros((8, 3), np.float32), np.ones(8, bool))
        kf_idx = (0, 2, 4)
        rec.keyframes = [{"pose_idx": i, "features": None, "cloud": cloud}
                         for i in kf_idx]

        new_nodes = [(so3_exp(rng.normal(size=3) * 0.5), rng.normal(size=3))
                     for _ in kf_idx]
        monkeypatch.setattr(streaming_mod, "optimize_pose_graph",
                            lambda nodes, edges, fixed=0: new_nodes)
        rec._close_loop(0, np.eye(3), np.zeros(3))

        def T(pose):
            M = np.eye(4)
            M[:3, :3], M[:3, 3] = pose[0], np.asarray(pose[1]).reshape(3)
            return M

        for (a, ki) in enumerate(kf_idx):
            # the keyframe itself lands exactly on the optimizer output
            np.testing.assert_allclose(rec.poses[ki][0], new_nodes[a][0],
                                       atol=1e-5)
            np.testing.assert_allclose(rec.poses[ki][1], new_nodes[a][1],
                                       atol=1e-5)
            hi = kf_idx[a + 1] if a + 1 < len(kf_idx) else len(rec.poses)
            for p in range(ki, hi):
                rel_old = T(old_poses[p]) @ np.linalg.inv(T(old_poses[ki]))
                rel_new = T(rec.poses[p]) @ np.linalg.inv(T(rec.poses[ki]))
                np.testing.assert_allclose(rel_new, rel_old, atol=1e-4,
                                           err_msg=f"segment {a} frame {p}")

    def test_map_survives_rebuild(self, rng):
        from txr.fusion.offset_map import offset_map_size

        frames = _pingpong_frames(rng)
        on = self._run(frames, loop_closure=True)
        assert on.loops_closed >= 1
        assert int(offset_map_size(on.map)) > 100

    @pytest.mark.slow
    def test_long_session_bounded_device_memory(self, rng):
        """VERDICT r3 #5: a long session must not grow device memory with
        keyframe count. Two ping-pong laps with kf_working_set=4 (smaller
        than loop_min_separation, so EVERY loop candidate is a spilled
        host-resident keyframe that _try_loop_edge re-uploads): device-
        resident keyframes stay capped, spilled ones are numpy, loop
        closure still fires through the spill path, and the map keeps its
        fixed capacity."""
        from txr.core.config import StreamingConfig
        from txr.core.intrinsics import CameraIntrinsics
        from txr.pipelines.streaming import StreamingReconstructor

        frames = _pingpong_frames(rng)
        frames = frames + frames[1:]  # second lap: session of ~33 frames
        h, w = frames[0].shape[:2]
        intr = CameraIntrinsics(fx=160.0, fy=160.0, cx=w / 2.0, cy=h / 2.0,
                                width=w, height=h)
        cfg = StreamingConfig(voxel_size=0.05, max_map_points=1 << 17,
                              subsample_factor=4, keyframe_every=2,
                              loop_closure=True, loop_min_separation=4,
                              loop_stride=1, loop_inliers=25,
                              kf_cloud_points=4096, kf_working_set=4)
        rec = StreamingReconstructor(intr, depth_model=FakeDepthModel(),
                                     config=cfg, use_icp=False, verbose=False)
        map_cap = rec.map.khi.shape[0]
        for i, f in enumerate(frames):
            rec.process_frame(f, float(i), str(i))

        assert len(rec.keyframes) > 2 * cfg.kf_working_set
        n_device = sum(1 for kf in rec.keyframes if not kf.get("spilled"))
        assert n_device <= cfg.kf_working_set, (
            f"{n_device} device-resident keyframes > working set")
        for kf in rec.keyframes[:-cfg.kf_working_set]:
            assert isinstance(kf["features"].desc, np.ndarray), (
                "old keyframe descriptors still device-resident")
            assert isinstance(kf["cloud"].xyz, np.ndarray), (
                "old keyframe cloud still device-resident")
        # Loop closure works across the spill boundary (candidates are all
        # outside the working set here), and the map stays fixed-capacity.
        assert rec.loops_closed >= 1
        assert rec.map.khi.shape[0] == map_cap
        # Closures fired repeatedly across the spill boundary (measured 12
        # on this scenario) and the trajectory stayed finite; absolute drift
        # is in arbitrary monocular units and is pinned by the dedicated
        # drift tests above, not here.
        R, t = rec.poses[-1]
        assert np.isfinite(np.linalg.norm(-R.T @ t))
