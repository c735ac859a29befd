"""Fusion-from-precomputed-depth pipeline (depth_to_reconstruction parity).

Behavioral rebuild of the reference's DepthToReconstructionPipeline
(depth_to_reconstruction.py:423-703): RGB+depth pairing by filename, an
initialization pair (pose → triangulation → scale), incremental views with
pose chaining and a 0.7/0.3 scale EMA, and a final merge (voxel + statistical
outlier removal).

TPU-first architecture: one jitted `pair_step` (match → vmapped-RANSAC
essential → cheirality pose → batched triangulation → filtering) is compiled
once and reused for every consecutive frame pair; dense back-projection is a
second jitted step. The reference instead re-enters Python/OpenCV per pair and
runs a 2000-iteration RANSAC loop per match.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from txr.core.config import ReconstructionConfig
from txr.geometry.epipolar import essential_ransac
from txr.geometry.pose import recover_pose
from txr.geometry.triangulate import triangulate, reprojection_error
from txr.geometry.scale import estimate_scale, clamp_scale
from txr.geometry.features import SIFTDetector, Features, match_features
from txr.fusion.pointcloud import depth_to_pointcloud, merge_pointclouds
from txr.io.depth_io import load_depth, find_matching_depth
from txr.io.ply import write_ply


@partial(jax.jit, static_argnames=("num_hypotheses",))
def pair_step(
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    match_mask: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    ransac_threshold: float = 2.0,
    min_depth: float = 0.1,
    max_depth: float = 50.0,
    max_reproj: float = 5.0,
    num_hypotheses: int = 1024,
):
    """Relative pose + filtered sparse structure for one frame pair.

    Follows SparseReconstructor.compute_pose/triangulate/filter_points
    (depth_to_reconstruction.py:183-271): essential RANSAC → cheirality pose →
    DLT triangulation → filter by depth range in cam1, positive depth in cam2,
    and reprojection error < max_reproj px in both views.

    Returns R (3,3), t (3,), X (N,3) points in cam-1 frame, valid (N,),
    n_inliers scalar.

    Planar degeneracy: the 8-point essential solve is ill-posed when the
    matches lie on a plane (tunnel walls — this project's headline scenes;
    the reference's cv2 5-point solver does not share the degeneracy). A
    homography is fitted alongside and, when it explains most of the
    E-inlier set (n_H > 0.7 n_E — a planarity test on the CORRESPONDENCES,
    after ORB-SLAM's model selection), the pose comes from SVD homography
    decomposition with chirality voting instead. The threshold matters: on
    the two-plane golden scene the degenerate E still collects 100% inliers
    (a planar set satisfies a whole family of essential matrices, and the
    8-point answer flips with the RANSAC key), while H fits the dominant
    plane (~80%) and decomposes to the exact pose.
    """
    from txr.geometry.homography import (homography_ransac,
                                         recover_pose_homography,
                                         transfer_error)

    kE, kH = jax.random.split(key)
    E, inliers_e = essential_ransac(
        uv1, uv2, match_mask, K, kE, ransac_threshold, num_hypotheses
    )
    R_e, t_e, cheiral_e = recover_pose(E, uv1, uv2, K, inliers_e)

    H, inliers_h = homography_ransac(
        uv1, uv2, match_mask, kH, jnp.maximum(ransac_threshold, 3.0),
        num_hypotheses)
    R_h, t_h, cheiral_h = recover_pose_homography(H, uv1, uv2, K, inliers_h)

    n_e = jnp.sum(inliers_e)
    # Model selection rescores H at the SAME pixel threshold as E: the
    # RANSAC fit above may use a looser threshold for robustness, but
    # comparing raw counts measured under different thresholds inflates
    # n_H and can pick the plane-only pose on a well-conditioned scene
    # with a ~70%-dominant plane (ADVICE r1).
    h_sel = match_mask & (transfer_error(H, uv1, uv2)
                          < 2.0 * ransac_threshold ** 2)
    n_h = jnp.sum(h_sel)
    use_h = n_h.astype(K.dtype) > 0.7 * n_e.astype(K.dtype)

    R = jnp.where(use_h, R_h, R_e)
    t = jnp.where(use_h, t_h, t_e)
    cheiral = jnp.where(use_h, cheiral_h, cheiral_e)
    inliers = jnp.where(use_h, inliers_h, inliers_e)

    # Gauss-Newton polish on the essential manifold: minimal-solver poses
    # carry ~0.3-0.5 deg rotation error from pixel noise, which at
    # few-pixel parallax becomes 25-40% triangulated-depth bias
    # (txr/geometry/refine.py). Never worse than the input by construction.
    from txr.geometry.refine import refine_pose
    R, t = refine_pose(R, t, uv1, uv2, K, inliers & cheiral)

    eye = jnp.eye(3, dtype=K.dtype)
    P1 = K @ jnp.concatenate([eye, jnp.zeros((3, 1), K.dtype)], axis=1)
    P2 = K @ jnp.concatenate([R, t[:, None]], axis=1)
    X = triangulate(P1, P2, uv1, uv2)

    z1 = X[:, 2]
    z2 = X @ R[2, :] + t[2]
    err1 = reprojection_error(P1, X, uv1)
    err2 = reprojection_error(P2, X, uv2)
    valid = (
        inliers
        & cheiral
        & (z1 > min_depth)
        & (z1 < max_depth)
        & (z2 > min_depth)
        & (err1 < max_reproj)
        & (err2 < max_reproj)
        & jnp.isfinite(z1)
    )
    X = jnp.where(valid[:, None], X, 0.0)
    return R, t, X, valid, jnp.sum(inliers)


@jax.jit
def sparse_to_world(X: jnp.ndarray, valid: jnp.ndarray,
                    R_prev: jnp.ndarray, t_prev: jnp.ndarray):
    """Triangulated points (prev-camera frame) → world, with the reference's
    depth-range filter 0.1 < z_w < 100 (depth_to_reconstruction.py:630-637)."""
    Xw = (X - t_prev.reshape(1, 3)) @ R_prev  # R_prev^T (X - t_prev)
    ok = valid & (Xw[:, 2] > 0.1) & (Xw[:, 2] < 100.0)
    return Xw, ok


class DepthToReconstructionPipeline:
    """RGB + precomputed depth → fused PLY (reference CLI #1)."""

    def __init__(self, config: Optional[ReconstructionConfig] = None,
                 feature_capacity: int = 8192, verbose: bool = True,
                 feature_backend: str = "auto"):
        self.config = config or ReconstructionConfig()
        self.detector = SIFTDetector(capacity=feature_capacity,
                                     backend=feature_backend)
        self.verbose = verbose
        self.images: List[np.ndarray] = []
        self.depths: List[np.ndarray] = []
        self.image_names: List[str] = []
        self.camera_poses: List[Tuple[np.ndarray, np.ndarray]] = []
        self._key = jax.random.PRNGKey(0)

    # ------------------------------------------------------------------ I/O

    def _log(self, msg: str):
        if self.verbose:
            print(msg)

    def load_data(self, rgb_folder: str, depth_folder: str) -> int:
        """Pair RGB frames with depth maps by filename; resize depth to RGB
        (reference :439-477)."""
        rgb_files = sorted(
            f for f in os.listdir(rgb_folder)
            if os.path.splitext(f)[1].lower() in (".png", ".jpg", ".jpeg")
        )
        self._log(f"Found {len(rgb_files)} RGB images")
        for name in rgb_files:
            img = cv2.imread(os.path.join(rgb_folder, name))
            if img is None:
                continue
            depth_file = find_matching_depth(name, depth_folder)
            if depth_file is None:
                self._log(f"  Warning: No depth found for {name}")
                continue
            depth = load_depth(depth_file)
            if depth.shape[:2] != img.shape[:2]:
                depth = cv2.resize(depth, (img.shape[1], img.shape[0]),
                                   interpolation=cv2.INTER_LINEAR)
            self.images.append(img)
            self.depths.append(depth.astype(np.float32))
            self.image_names.append(name)
            self._log(f"  Loaded: {name} with depth")
        self._log(f"Loaded {len(self.images)} image-depth pairs")
        return len(self.images)

    # ------------------------------------------------------------- pipeline

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _match_pair(self, f1: Features, f2: Features):
        uv1, uv2, mask = match_features(f1, f2, self.config.match_ratio)
        return (jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(mask))

    def reconstruct(self):
        """Run the full pipeline. Returns (points, colors[0..255], poses)."""
        cfg = self.config
        if len(self.images) < 2:
            self._log("Need at least 2 images")
            return None, None, None

        self._log("\n" + "=" * 70)
        self._log("DEPTH-ENHANCED RECONSTRUCTION PIPELINE (TPU)")
        self._log("=" * 70)

        K = jnp.asarray(cfg.K.astype(np.float32))
        t0 = time.time()
        features = [self.detector.detect(img) for img in self.images]
        self._log(f"Features detected for {len(features)} frames "
                  f"({time.time() - t0:.2f}s)")

        all_clouds: List[Tuple[np.ndarray, np.ndarray]] = []

        # ---- Step 1: initialize with the first pair -----------------------
        self._log("\n--- Step 1: Initialize with first pair ---")
        uv1, uv2, mmask = self._match_pair(features[0], features[1])
        n_matches = int(jnp.sum(mmask))
        self._log(f"Feature matches: {n_matches}")
        if n_matches < 8:
            self._log("Insufficient matches for initialization")
            return None, None, None

        R, t, X, valid, n_inl = pair_step(
            uv1, uv2, mmask, K, self._next_key(),
            cfg.ransac_threshold, cfg.min_depth, cfg.max_depth,
        )
        self._log(f"Inliers: {int(n_inl)}")
        n_valid = int(jnp.sum(valid))
        self._log(f"Valid sparse points: {n_valid}")

        R_np, t_np = np.asarray(R), np.asarray(t)
        self.camera_poses = [
            (np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
            (R_np, t_np),
        ]

        # ---- Step 2: depth scale from sparse anchor ------------------------
        self._log("\n--- Step 2: Estimate depth scale ---")
        if n_valid >= 3:
            s1 = estimate_scale(X, uv1, valid, jnp.asarray(self.depths[0]))
            s2 = estimate_scale(X, uv2, valid, jnp.asarray(self.depths[1]))
            avg_scale = float((clamp_scale(s1) + clamp_scale(s2)) / 2.0)
        else:
            self._log("Warning: Not enough sparse points for scale estimation")
            avg_scale = 1.0
        self._log(f"Average scale: {avg_scale:.6f}")

        # ---- Step 3: dense clouds for the first two cameras ----------------
        self._log("\n--- Step 3: Generate dense point clouds ---")
        for i in (0, 1):
            Ri, ti = self.camera_poses[i]
            ps = depth_to_pointcloud(
                self.depths[i], self.images[i], Ri, ti,
                cfg.fx, cfg.fy, cfg.cx, cfg.cy,
                scale=avg_scale, subsample=cfg.subsample_factor,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
            )
            xyz, rgb = ps.to_numpy()
            all_clouds.append((xyz, rgb))
            self._log(f"Camera {i}: {len(xyz)} points")

        # ---- Step 4: incremental views -------------------------------------
        self._log("\n--- Step 4: Add remaining views ---")
        for i in range(2, len(self.images)):
            self._log(f"\nProcessing image {i}...")
            uvp, uvc, mm = self._match_pair(features[i - 1], features[i])
            nm = int(jnp.sum(mm))
            if nm < 8:
                self._log(f"  Skipping - insufficient matches ({nm})")
                continue
            R_rel, t_rel, Xs, vs, n_inl = pair_step(
                uvp, uvc, mm, K, self._next_key(),
                cfg.ransac_threshold, cfg.min_depth, cfg.max_depth,
            )
            if int(n_inl) < 8:
                self._log(f"  Skipping - insufficient inliers ({int(n_inl)})")
                continue

            R_prev, t_prev = self.camera_poses[-1]
            R_curr = np.asarray(R_rel) @ R_prev
            t_curr = np.asarray(R_rel) @ t_prev + np.asarray(t_rel)
            self.camera_poses.append((R_curr, t_curr))

            # Scale from this view's sparse points (world frame, reference
            # semantics at :633-650), EMA-smoothed.
            Xw, ok = sparse_to_world(Xs, vs, jnp.asarray(R_prev), jnp.asarray(t_prev))
            if int(jnp.sum(ok)) >= 3:
                scale_i = float(clamp_scale(
                    estimate_scale(Xw, uvc, ok, jnp.asarray(self.depths[i]))))
            else:
                self._log("  Warning: Not enough valid points for scale, using previous")
                scale_i = avg_scale
            avg_scale = 0.7 * avg_scale + 0.3 * scale_i

            ps = depth_to_pointcloud(
                self.depths[i], self.images[i], R_curr, t_curr,
                cfg.fx, cfg.fy, cfg.cx, cfg.cy,
                scale=avg_scale, subsample=cfg.subsample_factor,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
            )
            xyz, rgb = ps.to_numpy()
            all_clouds.append((xyz, rgb))
            self._log(f"  Camera {i}: {len(xyz)} points (scale {avg_scale:.4f})")

        # ---- Step 5: merge --------------------------------------------------
        self._log("\n--- Step 5: Merge and clean point cloud ---")
        points, colors = merge_pointclouds(
            all_clouds,
            voxel_size=cfg.voxel_size,
            outlier_neighbors=cfg.outlier_neighbors,
            outlier_std_ratio=cfg.outlier_std_ratio,
        )
        self._log(f"\nFinal reconstruction: {len(points)} points, "
                  f"{len(self.camera_poses)} cameras")
        return points, colors, self.camera_poses

    def save_reconstruction(self, points: np.ndarray, colors: np.ndarray,
                            output_path: str):
        if points is None or len(points) == 0:
            self._log("No points to save")
            return
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        write_ply(output_path, points, colors / 255.0)
        self._log(f"Saved to {output_path}")


class SparseReconstructor:
    """Reference-named facade (depth_to_reconstruction.py:122-271): CLAHE+SIFT
    detection/matching, essential-matrix pose, triangulation, and point
    filtering — on the TPU ops."""

    def __init__(self, config: Optional[ReconstructionConfig] = None,
                 feature_capacity: int = 8192):
        self.config = config or ReconstructionConfig()
        self.detector = SIFTDetector(capacity=feature_capacity)
        self._key = jax.random.PRNGKey(0)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def detect_and_match(self, img1: np.ndarray, img2: np.ndarray):
        """Returns (pts1 (M,2), pts2 (M,2), n_matches)."""
        f1 = self.detector.detect(img1)
        f2 = self.detector.detect(img2)
        uv1, uv2, mask = match_features(f1, f2, self.config.match_ratio)
        return uv1[mask], uv2[mask], int(mask.sum())

    def compute_pose(self, pts1: np.ndarray, pts2: np.ndarray):
        """Returns (R, t, inlier_mask) or (None, None, None) on failure."""
        if len(pts1) < 8:
            return None, None, None
        cap = 1 << max(8, int(np.ceil(np.log2(len(pts1)))))
        a = np.zeros((cap, 2), np.float32); a[:len(pts1)] = pts1
        b = np.zeros((cap, 2), np.float32); b[:len(pts2)] = pts2
        m = np.zeros((cap,), bool); m[:len(pts1)] = True
        K = jnp.asarray(self.config.K.astype(np.float32))
        R, t, X, valid, n_inl = pair_step(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(m), K,
            self._next_key(), self.config.ransac_threshold,
            self.config.min_depth, self.config.max_depth)
        if int(n_inl) < 8:
            return None, None, None
        self._last = (np.asarray(X)[:len(pts1)], np.asarray(valid)[:len(pts1)])
        return np.asarray(R), np.asarray(t), self._last[1]

    def triangulate(self, pts1, pts2, R, t):
        """DLT triangulation under (I|0) and (R|t)."""
        K = self.config.K.astype(np.float32)
        P1 = (K @ np.hstack([np.eye(3), np.zeros((3, 1))])).astype(np.float32)
        P2 = (K @ np.hstack([R.reshape(3, 3), np.asarray(t).reshape(3, 1)])).astype(np.float32)
        X = triangulate(jnp.asarray(P1), jnp.asarray(P2),
                        jnp.asarray(np.asarray(pts1, np.float32)),
                        jnp.asarray(np.asarray(pts2, np.float32)))
        return np.asarray(X)

    def filter_points(self, points_3d, pts1, pts2, R, t, max_error: float = 5.0):
        """Positive depth both cameras + reprojection < max_error px."""
        cfg = self.config
        K = cfg.K.astype(np.float32)
        P1 = (K @ np.hstack([np.eye(3), np.zeros((3, 1))])).astype(np.float32)
        P2 = (K @ np.hstack([R.reshape(3, 3), np.asarray(t).reshape(3, 1)])).astype(np.float32)
        X = jnp.asarray(np.asarray(points_3d, np.float32))
        e1 = np.asarray(reprojection_error(jnp.asarray(P1), X,
                                           jnp.asarray(np.asarray(pts1, np.float32))))
        e2 = np.asarray(reprojection_error(jnp.asarray(P2), X,
                                           jnp.asarray(np.asarray(pts2, np.float32))))
        z1 = np.asarray(points_3d)[:, 2]
        z2 = np.asarray(points_3d) @ np.asarray(R).reshape(3, 3)[2] + np.asarray(t).reshape(3)[2]
        return ((z1 > cfg.min_depth) & (z1 < cfg.max_depth)
                & (z2 > cfg.min_depth) & (e1 < max_error) & (e2 < max_error))


class DenseReconstructor:
    """Reference-named facade (depth_to_reconstruction.py:274-420)."""

    def __init__(self, config: Optional[ReconstructionConfig] = None):
        self.config = config or ReconstructionConfig()

    def estimate_scale(self, sparse_points, sparse_2d, depth_map) -> float:
        from txr.geometry.scale import DepthScaleEstimator

        s = DepthScaleEstimator().estimate_scale(sparse_points, sparse_2d, depth_map)
        return float(np.asarray(clamp_scale(jnp.asarray(s))))

    def depth_to_pointcloud(self, depth, color, pose=None, scale: float = 1.0,
                            subsample: int = 2):
        cfg = self.config
        R, t = pose if pose is not None else (np.eye(3), np.zeros(3))
        ps = depth_to_pointcloud(depth, color, np.asarray(R), np.asarray(t).reshape(3),
                                 cfg.fx, cfg.fy, cfg.cx, cfg.cy, scale=scale,
                                 subsample=subsample, min_depth=cfg.min_depth,
                                 max_depth=cfg.max_depth)
        xyz, rgb = ps.to_numpy()
        return xyz, rgb * 255.0

    def merge_pointclouds(self, clouds, voxel_size: float = 0.005):
        return merge_pointclouds(clouds, voxel_size=voxel_size,
                                 outlier_neighbors=self.config.outlier_neighbors,
                                 outlier_std_ratio=self.config.outlier_std_ratio)
