"""End-to-end depth-enhanced reconstruction (depth_enhanced_reconstruction
parity).

Behavioral rebuild of the reference DepthEnhancedReconstruction
(depth_enhanced_reconstruction.py:896-1311): per-image depth estimation,
hybrid feature detection, depth-filtered matching, fundamental-matrix RANSAC,
essential-matrix pose, DLT triangulation with reprojection filtering
(<8 px, 0.1 < Z < 100), median depth-scale anchoring, dense back-projection
at subsample 4, and a voxel-0.005 merge (no statistical outlier pass — this
script's merge differs from depth_to_reconstruction's).

TPU-first: depth inference batches frames through one compiled forward;
RANSAC/pose/triangulation reuse the jitted pair_step family on fixed-capacity
match buffers.
"""

from __future__ import annotations

import os
import glob
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from txr.geometry.hybrid import HybridFeatureDetector, DepthGuidedMatcher
from txr.geometry.epipolar import fundamental_ransac
from txr.geometry.scale import estimate_scale, clamp_scale
from txr.pipelines.fusion_pipeline import pair_step, sparse_to_world
from txr.fusion.pointcloud import depth_to_pointcloud, merge_pointclouds
from txr.io.ply import write_ply

MATCH_CAPACITY = 4096


def _pad_matches(pts1: np.ndarray, pts2: np.ndarray, capacity: int = MATCH_CAPACITY):
    n = min(len(pts1), capacity)
    a = np.zeros((capacity, 2), np.float32)
    b = np.zeros((capacity, 2), np.float32)
    m = np.zeros((capacity,), bool)
    a[:n] = pts1[:n]
    b[:n] = pts2[:n]
    m[:n] = True
    return jnp.asarray(a), jnp.asarray(b), jnp.asarray(m)


class DepthEnhancedReconstruction:
    """images folder → depth + hybrid features + from-scratch SfM → fused PLY."""

    def __init__(self, K: np.ndarray, use_depth: bool = True,
                 use_hybrid_features: bool = True, depth_model=None,
                 verbose: bool = True, subsample: int = 4,
                 voxel_size: float = 0.005, use_ba: bool = False,
                 ba_iterations: int = 15, feature_backend: str = "auto",
                 quant: str = "none"):
        self.K = np.asarray(K, np.float64)
        self.use_depth = use_depth
        self.use_hybrid = use_hybrid_features
        self.verbose = verbose
        self.subsample = subsample
        self.voxel_size = voxel_size
        self.use_ba = use_ba
        self.ba_iterations = ba_iterations
        self.quant = quant

        self.images: List[np.ndarray] = []
        self.image_names: List[str] = []
        self.depths: List[Optional[np.ndarray]] = []
        self.features: List = []
        self.camera_poses: List[Tuple[np.ndarray, np.ndarray]] = []
        self.sparse_points = np.zeros((0, 3), np.float32)
        self.sparse_colors = np.zeros((0, 3), np.float32)

        self.detector = HybridFeatureDetector(
            use_orb=use_hybrid_features, use_lines=use_hybrid_features,
            use_edges=use_hybrid_features, verbose=verbose,
            backend=feature_backend)
        self.depth_matcher = DepthGuidedMatcher()
        self._depth_model = depth_model
        self._key = jax.random.PRNGKey(0)

    def _log(self, msg):
        if self.verbose:
            print(msg)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # ---------------------------------------------------------------- I/O

    def load_images(self, folder: str) -> int:
        files = []
        for ext in ("jpg", "jpeg", "png", "bmp", "JPG", "PNG"):
            files.extend(glob.glob(os.path.join(folder, f"*.{ext}")))
        for path in sorted(set(files)):
            img = cv2.imread(path)
            if img is None:
                continue
            self.images.append(img)
            self.image_names.append(os.path.basename(path))
        self._log(f"Loaded {len(self.images)} images from {folder}")
        return len(self.images)

    # ---------------------------------------------------------- stage fns

    def estimate_all_depths(self):
        if not self.use_depth:
            self.depths = [None] * len(self.images)
            return
        if self._depth_model is None:
            from txr.models.depth_anything import DepthAnythingModel

            # Reference DepthEstimator loads DA-V2-Large via HF
            # (depth_enhanced_reconstruction.py:108-134).
            self._depth_model = DepthAnythingModel(version="v2", encoder="vitl",
                                                   quant=self.quant)
        self._log("Estimating depth maps...")
        self.depths = []
        shapes = {im.shape[:2] for im in self.images}
        if len(shapes) == 1 and len(self.images) > 1:
            # One batched forward — the TPU win over per-frame loops.
            batch = np.stack(self.images)
            d = self._depth_model.infer_batch(batch)
            self.depths = [d[i] for i in range(len(self.images))]
        else:
            for im in self.images:
                self.depths.append(self._depth_model.infer(im))
        self._log(f"  Depth maps: {len(self.depths)}")

    def detect_all_features(self):
        self._log("Detecting features...")
        self.features = []
        for i, im in enumerate(self.images):
            self._log(f" Image {i}:")
            self.features.append(self.detector.detect(im))

    def match_image_pair(self, i: int, j: int):
        """Hybrid match → depth filter → custom RANSAC-F
        (reference :998-1052). Returns (pts1, pts2) inlier arrays."""
        pts1, pts2 = self.detector.match_features(self.features[i], self.features[j])
        if len(pts1) < 8:
            return pts1, pts2
        if self.use_depth and self.depths[i] is not None:
            pts1, pts2 = self.depth_matcher.filter_matches_by_depth(
                pts1, pts2, self.depths[i], self.depths[j])
        if len(pts1) < 8:
            return pts1, pts2
        a, b, m = _pad_matches(pts1, pts2)
        F, inliers = fundamental_ransac(a, b, m, self._next_key(), threshold=3.0)
        inl = np.asarray(inliers)[: len(pts1)]
        self._log(f"  RANSAC-F inliers: {int(inl.sum())}/{len(pts1)}")
        return pts1[inl[: len(pts1)]], pts2[inl[: len(pts1)]]

    # ------------------------------------------------------------ pipeline

    def reconstruct(self, output_dir: str = "./output"):
        if len(self.images) < 2:
            self._log("Need at least 2 images")
            return None

        os.makedirs(output_dir, exist_ok=True)
        self.estimate_all_depths()
        self.detect_all_features()

        K = jnp.asarray(self.K.astype(np.float32))

        # ---- initialize with pair (0, 1) ---------------------------------
        self._log("\nMatching initial pair...")
        pts1, pts2 = self.match_image_pair(0, 1)
        if len(pts1) < 8:
            self._log("Insufficient matches for initialization")
            return None
        a, b, m = _pad_matches(pts1, pts2)
        R, t, X, valid, n_inl = pair_step(a, b, m, K, self._next_key(),
                                          2.0, 0.1, 100.0, 8.0)
        self._log(f"Pose inliers: {int(n_inl)}; valid sparse: {int(jnp.sum(valid))}")

        R_np, t_np = np.asarray(R), np.asarray(t)
        self.camera_poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
                             (R_np, t_np)]
        # image index → pose index (views can be skipped)
        pose_of_image = {0: 0, 1: 1}
        view_scales = {}

        # BA bookkeeping: sparse world points + their 2-view observations.
        ba_points: List[np.ndarray] = []
        ba_obs: List[tuple] = []

        def collect_ba(Xw_np, ok_np, uv_a, uv_b, pose_a, pose_b):
            base = sum(len(p) for p in ba_points)
            sel = np.where(ok_np)[0]
            ba_points.append(Xw_np[sel])
            for j, s in enumerate(sel):
                ba_obs.append((pose_a, base + j, uv_a[s]))
                ba_obs.append((pose_b, base + j, uv_b[s]))

        # ---- depth-scale anchor (median sparse_Z / depth) -----------------
        scale = 1.0
        if self.use_depth and self.depths[0] is not None:
            s0 = clamp_scale(estimate_scale(X, a, valid, jnp.asarray(self.depths[0])))
            s1 = clamp_scale(estimate_scale(X, b, valid, jnp.asarray(self.depths[1])))
            scale = float((s0 + s1) / 2.0)
            self._log(f"Depth scale estimate: {scale:.6f}")
        view_scales[0] = view_scales[1] = scale
        if self.use_ba:
            collect_ba(np.asarray(X), np.asarray(valid),
                       np.asarray(a), np.asarray(b), 0, 1)

        # Sparse reconstruction from the initial pair, colors sampled at the
        # image-0 keypoints (reference stores these and ALWAYS includes them
        # in the final cloud — depth_enhanced_reconstruction.py:1108-1165).
        v_np = np.asarray(valid)
        sp_xyz = np.asarray(X)[v_np]
        uv0 = np.clip(np.asarray(a)[v_np].astype(np.int32), 0,
                      [self.images[0].shape[1] - 1,
                       self.images[0].shape[0] - 1])
        sp_bgr = self.images[0][uv0[:, 1], uv0[:, 0]].astype(np.float32)
        if sp_bgr.ndim == 1:  # grayscale source
            sp_rgb = np.repeat(sp_bgr[:, None], 3, axis=1)
        else:
            sp_rgb = sp_bgr[:, ::-1]  # BGR -> RGB
        self.sparse_points = sp_xyz
        self.sparse_colors = sp_rgb

        # ---- incremental views (reference :1171-1238) ---------------------
        for i in range(2, len(self.images)):
            self._log(f"\nProcessing image {i}...")
            p_prev, p_curr = self.match_image_pair(i - 1, i)
            if len(p_prev) < 8:
                self._log("  Skipping - insufficient matches")
                continue
            a, b, m = _pad_matches(p_prev, p_curr)
            R_rel, t_rel, Xs, vs, n_inl = pair_step(a, b, m, K, self._next_key(),
                                                    2.0, 0.1, 100.0, 8.0)
            if int(n_inl) < 8:
                self._log("  Skipping - insufficient inliers")
                continue
            R_prev, t_prev = self.camera_poses[-1]
            prev_pose_idx = len(self.camera_poses) - 1
            R_curr = np.asarray(R_rel) @ R_prev
            t_curr = np.asarray(R_rel) @ t_prev + np.asarray(t_rel)
            self.camera_poses.append((R_curr, t_curr))
            pose_of_image[i] = len(self.camera_poses) - 1

            Xw, ok = sparse_to_world(Xs, vs, jnp.asarray(R_prev),
                                     jnp.asarray(t_prev))
            if self.use_depth and self.depths[i] is not None:
                if int(jnp.sum(ok)) >= 3:
                    s_i = float(clamp_scale(estimate_scale(
                        Xw, b, ok, jnp.asarray(self.depths[i]))))
                    scale = 0.7 * scale + 0.3 * s_i
                view_scales[i] = scale
                self._log(f"  Camera {i}: pose chained (scale {scale:.4f})")
            if self.use_ba:
                collect_ba(np.asarray(Xw), np.asarray(ok),
                           np.asarray(a), np.asarray(b),
                           prev_pose_idx, pose_of_image[i])

        # ---- bundle adjustment (the reference declares BA but never runs
        # it — depth_enhanced_reconstruction.py:45-50; ours does) ------------
        if self.use_ba and ba_points and sum(len(p) for p in ba_points) >= 10:
            from txr.geometry.bundle_adjustment import build_problem, bundle_adjust

            Xall = np.concatenate(ba_points).astype(np.float32)
            prob = build_problem(self.camera_poses, Xall, ba_obs)
            Rba, tba, _, hist = bundle_adjust(
                prob, K, iterations=self.ba_iterations)
            self._log(f"\nBundle adjustment: reprojection RMS "
                      f"{float(hist[0]):.3f} -> {float(hist[-1]):.3f} px "
                      f"({len(Xall)} points, {len(ba_obs)} observations)")
            self.camera_poses = [(np.asarray(Rba[i]), np.asarray(tba[i]))
                                 for i in range(len(self.camera_poses))]

        # ---- dense clouds at the (possibly refined) poses ------------------
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        all_clouds = []
        if self.use_depth:
            for i, pose_idx in pose_of_image.items():
                if self.depths[i] is None:
                    continue
                Ri, ti = self.camera_poses[pose_idx]
                ps = depth_to_pointcloud(self.depths[i], self.images[i], Ri, ti,
                                         fx, fy, cx, cy,
                                         scale=view_scales.get(i, scale),
                                         subsample=self.subsample,
                                         min_depth=0.1, max_depth=100.0)
                xyz, rgb = ps.to_numpy()
                all_clouds.append((xyz, rgb))
                self._log(f"Camera {i}: {len(xyz)} dense points")

        # The sparse pair-0 points always ride along (reference :1155-1165
        # vstacks them with the dense merge, and falls back to sparse-only
        # when depth is disabled or produced nothing).
        if len(self.sparse_points):
            all_clouds.append((self.sparse_points.astype(np.float32),
                               self.sparse_colors.astype(np.float32)))
        if not all_clouds:
            self._log("No sparse or dense points — nothing to merge")
            return None

        # ---- merge (voxel only — reference :1149 has no outlier pass) -----
        points, colors = merge_pointclouds(all_clouds, voxel_size=self.voxel_size,
                                           remove_outliers=False)
        self._log(f"\nFinal: {len(points)} points, {len(self.camera_poses)} cameras")

        out_path = os.path.join(output_dir, "reconstruction.ply")
        self._save_pointcloud(points, colors, out_path)
        return points, colors, self.camera_poses

    def _save_pointcloud(self, points, colors, path):
        if points is None or len(points) == 0:
            self._log("No points to save")
            return
        write_ply(path, points, colors / 255.0)
        self._log(f"Saved to {path}")
