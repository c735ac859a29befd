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

from txr.core.types import PointSet
from txr.core.precision import f32_dots
from txr.geometry.hybrid import HybridFeatureDetector, DepthGuidedMatcher
from txr.geometry.epipolar import fundamental_ransac
from txr.geometry.scale import estimate_scale, clamp_scale
from txr.ops.backproject import backproject_world
from txr.ops.voxel import voxel_downsample
from txr.pipelines.fusion_pipeline import (pair_step, sparse_to_world, _raw,
                                           _pad_pow2, _seq_chunk)
from txr.fusion.pointcloud import depth_to_pointcloud, merge_pointclouds
from txr.io.ply import write_ply

MATCH_CAPACITY = 4096

_fundamental_ransac_raw = _raw(fundamental_ransac)
_pair_step_raw = _raw(pair_step)
_sparse_to_world_raw = _raw(sparse_to_world)
_estimate_scale_raw = _raw(estimate_scale)   # used inside batched programs
_backproject_world_raw = _raw(backproject_world)
_voxel_downsample_raw = _raw(voxel_downsample)


# --- sequence-batched programs (constant dispatch count; see
# fusion_pipeline._pairs_batch for the rationale) ---------------------------

@jax.jit
@f32_dots
def _enh_pairs_batch(a, b, m, K, keys_f, keys_p):
    """RANSAC-F + pose/structure for every pair in one program.

    a/b/m: (P, cap, ...) padded depth-filtered matches (hybrid matching and
    the depth filter run on the host — the reference's own substrate).
    Reference semantics: custom fundamental RANSAC gates the matches
    (depth_enhanced_reconstruction.py:998-1052), then essential pose +
    triangulation + reprojection filter (<8 px, 0.1 < Z < 100).
    """

    def one(args):
        ai, bi, mi, kf, kp = args
        _, inliers = _fundamental_ransac_raw(ai, bi, mi, kf, threshold=3.0)
        mm = mi & inliers
        n_f = jnp.sum(mm)
        R, t, X, valid, n_inl = _pair_step_raw(ai, bi, mm, K, kp,
                                               2.0, 0.1, 100.0, 8.0)
        return R, t, X, valid, n_inl, n_f

    return jax.lax.map(one, (a, b, m, keys_f, keys_p))


@jax.jit
@f32_dots
def _enh_scales_batch(X, valid, b_uv, depths, R_prev, t_prev):
    """World-frame sparse points + per-view scale estimates, batched."""

    def one(Xp, vp, u2p, Rp, tp, depth_i):
        Xw, ok = _sparse_to_world_raw(Xp, vp, Rp, tp)
        s = _estimate_scale_raw(Xw, u2p, ok, depth_i)
        return Xw, ok, s, jnp.sum(ok)

    return jax.vmap(one)(X, valid, b_uv, R_prev, t_prev, depths[1:])


_ENH_DENSE_CACHE: dict = {}


def _enh_dense_merge_fn(fx, fy, cx, cy, subsample: int, voxel_size: float):
    """Vmapped dense back-projection + device voxel merge (NO outlier pass —
    this CLI's merge semantic, reference :1149); the sparse pair-0 points
    ride along as an extra masked set."""
    key = (fx, fy, cx, cy, subsample, voxel_size)
    if key in _ENH_DENSE_CACHE:
        return _ENH_DENSE_CACHE[key]

    @jax.jit
    def run(depths, bgrs, Rs, ts, scales, keep, sp_xyz, sp_rgb, sp_mask):
        def one(depth, bgr, Ri, ti, s):
            return _backproject_world_raw(depth, bgr[..., ::-1], Ri, ti,
                                          fx, fy, cx, cy, 0.1, 100.0,
                                          s, subsample)

        ps = jax.vmap(one)(depths, bgrs, Rs, ts, scales)
        m = ps.mask & keep[:, None]
        counts = jnp.sum(m, axis=1)
        flat = PointSet(
            jnp.concatenate([ps.xyz.reshape(-1, 3), sp_xyz]),
            jnp.concatenate([ps.rgb.reshape(-1, 3), sp_rgb]),
            jnp.concatenate([m.reshape(-1), sp_mask]))
        return _voxel_downsample_raw(flat, voxel_size), counts

    _ENH_DENSE_CACHE[key] = run
    return run


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
        if getattr(self.detector, "backend", "cv2") == "device":
            # One batched device program per 4 frames (all four stages
            # inside) instead of 4 dispatches + ~10 host syncs per frame.
            self.features = self.detector.detect_batch(self.images)
            for i in range(len(self.features)):
                self._log(f" Image {i}: (batched detect)")
        else:
            self.features = []
            for i, im in enumerate(self.images):
                self._log(f" Image {i}:")
                self.features.append(self.detector.detect(im))

    def match_image_pair(self, i: int, j: int):
        """Hybrid match → depth filter → custom RANSAC-F
        (reference :998-1052). Returns (pts1, pts2) inlier arrays."""
        pts1, pts2 = self._match_pair_host(i, j)
        if len(pts1) < 8:
            return pts1, pts2
        if len(pts1) > MATCH_CAPACITY:  # fixed-capacity RANSAC contract
            pts1, pts2 = pts1[:MATCH_CAPACITY], pts2[:MATCH_CAPACITY]
        a, b, m = _pad_matches(pts1, pts2)
        F, inliers = fundamental_ransac(a, b, m, self._next_key(), threshold=3.0)
        inl = np.asarray(inliers)[: len(pts1)]
        self._log(f"  RANSAC-F inliers: {int(inl.sum())}/{len(pts1)}")
        return pts1[inl], pts2[inl]

    def _match_pair_host(self, i: int, j: int):
        """Host part of pair matching: hybrid match + depth filter."""
        pts1, pts2 = self.detector.match_features(self.features[i], self.features[j])
        if len(pts1) < 8:
            return pts1, pts2
        if self.use_depth and self.depths[i] is not None:
            pts1, pts2 = self.depth_matcher.filter_matches_by_depth(
                pts1, pts2, self.depths[i], self.depths[j])
        return pts1, pts2

    # ------------------------------------------------------------ pipeline

    def reconstruct(self, output_dir: str = "./output"):
        if len(self.images) < 2:
            self._log("Need at least 2 images")
            return None

        os.makedirs(output_dir, exist_ok=True)
        self.estimate_all_depths()
        self.detect_all_features()

        K = jnp.asarray(self.K.astype(np.float32))
        n = len(self.images)
        n_pairs = n - 1
        p2 = _pad_pow2(n_pairs)

        # ---- host: hybrid match + depth filter for every consecutive pair
        # (the device work — RANSAC-F, pose, triangulation, scales, dense
        # back-projection, merge — then runs as THREE batched programs; see
        # fusion_pipeline._pairs_batch for the dispatch-count rationale).
        A = np.zeros((p2, MATCH_CAPACITY, 2), np.float32)
        B = np.zeros((p2, MATCH_CAPACITY, 2), np.float32)
        M = np.zeros((p2, MATCH_CAPACITY), bool)
        n_raw = np.zeros(p2, np.int64)
        keys_f = []
        keys_p = []
        # Local, not a module constant: device arrays at module scope init
        # the backend at import and risk the captured-const fastpath bug
        # (CLAUDE.md).
        _DUMMY_KEY = jax.random.PRNGKey(0)
        self._log("\nMatching initial pair...")
        for p in range(n_pairs):
            if p >= 1:
                self._log(f"\nProcessing image {p + 1}...")
            pts1, pts2 = self._match_pair_host(p, p + 1)
            n_raw[p] = len(pts1)
            c = min(len(pts1), MATCH_CAPACITY)
            A[p, :c] = pts1[:c]
            B[p, :c] = pts2[:c]
            M[p, :c] = True
            # Same key stream the frame-sequential loop drew (F then pose),
            # including its skip rule: pairs with <8 raw matches never
            # reached RANSAC and drew NO keys. Those pairs (and the pad
            # rows) get a fixed dummy key — their batch results are
            # discarded by the same <8 check in the host chain below.
            if n_raw[p] >= 8:
                keys_f.append(self._next_key())
                keys_p.append(self._next_key())
            else:
                keys_f.append(_DUMMY_KEY)
                keys_p.append(_DUMMY_KEY)
        for p in range(n_pairs, p2):
            keys_f.append(_DUMMY_KEY)
            keys_p.append(_DUMMY_KEY)

        # ---- program 1: RANSAC-F + pose/structure for all pairs ----------
        R_rel, t_rel, X, valid, n_inl, n_f = _enh_pairs_batch(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(M), K,
            jnp.stack(keys_f), jnp.stack(keys_p))
        R_rel_h = np.asarray(R_rel)
        t_rel_h = np.asarray(t_rel)
        n_inl_h = np.asarray(n_inl)
        n_f_h = np.asarray(n_f)

        for p in range(n_pairs):
            if n_raw[p] >= 8:
                self._log(f"  RANSAC-F inliers (pair {p}): "
                          f"{int(n_f_h[p])}/{int(n_raw[p])}")

        if min(n_raw[0], n_f_h[0]) < 8:
            self._log("Insufficient matches for initialization")
            return None
        valid0 = np.asarray(valid[0])
        self._log(f"Pose inliers: {int(n_inl_h[0])}; "
                  f"valid sparse: {int(valid0.sum())}")

        self.camera_poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
                             (R_rel_h[0], t_rel_h[0])]
        # image index → pose index (views can be skipped)
        pose_of_image = {0: 0, 1: 1}
        view_scales = {}

        # Host pose chain with the reference's skip rules (:1171-1238).
        R_prev = np.tile(np.eye(3, dtype=np.float32), (p2, 1, 1))
        t_prev = np.zeros((p2, 3), np.float32)
        prev_pose_of_pair = {}
        for i in range(2, n):
            p = i - 1
            if min(n_raw[p], n_f_h[p]) < 8:
                self._log(f"  Skipping image {i} - insufficient matches")
                continue
            if int(n_inl_h[p]) < 8:
                self._log(f"  Skipping image {i} - insufficient inliers")
                continue
            Rp, tp = self.camera_poses[-1]
            prev_pose_of_pair[p] = len(self.camera_poses) - 1
            R_prev[p], t_prev[p] = Rp, tp
            R_curr = R_rel_h[p] @ Rp
            t_curr = R_rel_h[p] @ tp + t_rel_h[p]
            self.camera_poses.append((R_curr, t_curr))
            pose_of_image[i] = len(self.camera_poses) - 1

        # ---- program 2: world-frame sparse + per-view scales --------------
        scale = 1.0
        need_scales = self.use_depth and self.depths[0] is not None
        # The EMA chain below reads sw_h/okn_h for ANY later view with depth,
        # so the batch must also run when only views >= 2 have depth files
        # (e.g. a folder missing the first depth map — the sequential loop
        # this replaced handled that layout).
        later_depth = self.use_depth and any(
            self.depths[i] is not None for i in range(2, n))
        if need_scales or later_depth or self.use_ba:
            # Pad to the max frame shape: matched uv never lands in the pad,
            # and padded depth rows read 0 (< min_depth) downstream.
            h = max(im.shape[0] for im in self.images)
            w = max(im.shape[1] for im in self.images)

            def depth_slab(lo, hi):
                slab = np.zeros((hi - lo, h, w), np.float32)
                for i in range(lo, min(hi, n)):
                    d = self.depths[i]
                    if d is not None:
                        slab[i - lo, :d.shape[0], :d.shape[1]] = d
                return slab

            # Sequences longer than TXR_SEQ_CHUNK pairs slice the scale
            # program: the (N, H, W) depth stack is O(views) in HBM
            # (8.3 MB/view f32 at 1080p) — and the padded host copy is
            # O(views) too, so slabs are built per chunk straight from
            # self.depths. The chunk is a power of two so it divides the
            # pow2-padded pair count; per-pair math is independent, so
            # results are identical.
            seq_chunk = _seq_chunk()
            if p2 <= seq_chunk:
                Xw_d, ok_d, sw_d, okn_d = _enh_scales_batch(
                    X, valid, jnp.asarray(B),
                    jnp.asarray(depth_slab(0, p2 + 1)),
                    jnp.asarray(R_prev), jnp.asarray(t_prev))
                sw_h = np.asarray(jax.vmap(clamp_scale)(sw_d))
                okn_h = np.asarray(okn_d)
            else:
                cp = seq_chunk
                # one host fetch; numpy slices re-stage per chunk (device
                # slicing would compile a program per start offset)
                X_h, valid_h = jax.device_get((X, valid))
                sw_l, okn_l, Xw_l, ok_l = [], [], [], []
                for s in range(0, p2, cp):
                    Xw_c, ok_c, sw_c, okn_c = _enh_scales_batch(
                        jnp.asarray(X_h[s:s + cp]),
                        jnp.asarray(valid_h[s:s + cp]),
                        jnp.asarray(B[s:s + cp]),
                        jnp.asarray(depth_slab(s, s + cp + 1)),
                        jnp.asarray(R_prev[s:s + cp]),
                        jnp.asarray(t_prev[s:s + cp]))
                    sw_l.append(np.asarray(jax.vmap(clamp_scale)(sw_c)))
                    okn_l.append(np.asarray(okn_c))
                    if self.use_ba:
                        Xw_l.append(np.asarray(Xw_c))
                        ok_l.append(np.asarray(ok_c))
                sw_h = np.concatenate(sw_l)
                okn_h = np.concatenate(okn_l)
                # host arrays; the BA block's np.asarray() is a no-op
                Xw_d = np.concatenate(Xw_l) if self.use_ba else None
                ok_d = np.concatenate(ok_l) if self.use_ba else None

        if need_scales:
            s0 = clamp_scale(estimate_scale(
                X[0], jnp.asarray(A[0]), valid[0],
                jnp.asarray(self.depths[0])))
            s1 = clamp_scale(estimate_scale(
                X[0], jnp.asarray(B[0]), valid[0],
                jnp.asarray(self.depths[1])))
            scale = float((s0 + s1) / 2.0)
            self._log(f"Depth scale estimate: {scale:.6f}")
        view_scales[0] = view_scales[1] = scale

        # Scale EMA chain over the processed views (reference :1221-1238).
        for i in range(2, n):
            p = i - 1
            if i not in pose_of_image:
                continue
            if self.use_depth and self.depths[i] is not None:
                if int(okn_h[p]) >= 3:
                    scale = 0.7 * scale + 0.3 * float(sw_h[p])
                view_scales[i] = scale
                self._log(f"  Camera {i}: pose chained (scale {scale:.4f})")

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

        if self.use_ba:
            collect_ba(np.asarray(X[0]), valid0, A[0], B[0], 0, 1)
            Xw_h = np.asarray(Xw_d)
            ok_h = np.asarray(ok_d)
            for i in range(2, n):
                p = i - 1
                if i in pose_of_image:
                    collect_ba(Xw_h[p], ok_h[p], A[p], B[p],
                               prev_pose_of_pair[p], pose_of_image[i])

        # Sparse reconstruction from the initial pair, colors sampled at the
        # image-0 keypoints (reference stores these and ALWAYS includes them
        # in the final cloud — depth_enhanced_reconstruction.py:1108-1165).
        sp_xyz = np.asarray(X[0])[valid0]
        uv0 = np.clip(A[0][valid0].astype(np.int32), 0,
                      [self.images[0].shape[1] - 1,
                       self.images[0].shape[0] - 1])
        sp_bgr = self.images[0][uv0[:, 1], uv0[:, 0]].astype(np.float32)
        if sp_bgr.ndim == 1:  # grayscale source
            sp_rgb = np.repeat(sp_bgr[:, None], 3, axis=1)
        else:
            sp_rgb = sp_bgr[:, ::-1]  # BGR -> RGB
        self.sparse_points = sp_xyz
        self.sparse_colors = sp_rgb

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

        # ---- program 3: dense clouds + device voxel merge ------------------
        fx, fy = self.K[0, 0], self.K[1, 1]
        cx, cy = self.K[0, 2], self.K[1, 2]
        have_dense = self.use_depth and any(
            self.depths[i] is not None for i in pose_of_image)
        if have_dense:
            h = max(im.shape[0] for im in self.images)
            w = max(im.shape[1] for im in self.images)
            nv = _pad_pow2(n)
            # Per-view lists; the padded stack is built only on the
            # single-program path (the chunked path builds per-chunk slabs
            # so host memory stays O(chunk), see chunked_merge.py).
            depth_list = [None] * nv
            img_list = [None] * nv
            Rs = np.tile(np.eye(3, dtype=np.float32), (nv, 1, 1))
            ts = np.zeros((nv, 3), np.float32)
            sc = np.ones((nv,), np.float32)
            keep = np.zeros((nv,), bool)
            for i, pose_idx in pose_of_image.items():
                if self.depths[i] is None:
                    continue
                depth_list[i] = self.depths[i]
                img_list[i] = self.images[i]
                Rs[i], ts[i] = self.camera_poses[pose_idx]
                sc[i] = view_scales.get(i, scale)
                keep[i] = True
            sp_cap = MATCH_CAPACITY
            sp_xyz_p = np.zeros((sp_cap, 3), np.float32)
            sp_rgb_p = np.zeros((sp_cap, 3), np.float32)
            sp_m = np.zeros((sp_cap,), bool)
            ns = min(len(self.sparse_points), sp_cap)
            sp_xyz_p[:ns] = self.sparse_points[:ns]
            sp_rgb_p[:ns] = self.sparse_colors[:ns] / 255.0
            sp_m[:ns] = True
            ss = int(self.subsample)
            rows_per_view = -(-h // ss) * -(-w // ss)
            single_rows = int(os.environ.get("TXR_DENSE_SINGLE_ROWS",
                                             str(1 << 24)))
            if nv * rows_per_view <= single_rows:
                depths_v = np.zeros((nv, h, w), np.float32)
                bgrs_v = np.zeros((nv, h, w, 3), np.uint8)
                for i in range(nv):
                    if depth_list[i] is None:
                        continue
                    d, im = depth_list[i], img_list[i]
                    depths_v[i, :d.shape[0], :d.shape[1]] = d
                    bgrs_v[i, :im.shape[0], :im.shape[1]] = im
                dense_merge = _enh_dense_merge_fn(
                    float(fx), float(fy), float(cx), float(cy),
                    ss, float(self.voxel_size))
                merged, counts_d = dense_merge(
                    jnp.asarray(depths_v), jnp.asarray(bgrs_v),
                    jnp.asarray(Rs), jnp.asarray(ts), jnp.asarray(sc),
                    jnp.asarray(keep), jnp.asarray(sp_xyz_p),
                    jnp.asarray(sp_rgb_p), jnp.asarray(sp_m))
                counts = np.asarray(counts_d)
            else:
                # Long sequences: bound device memory with the chunked
                # exact merge (txr/fusion/chunked_merge.py); the sparse
                # points join the final reduce as weight-1 rows, matching
                # the concatenate-then-downsample single-program semantics.
                from txr.fusion.chunked_merge import chunked_dense_voxel_merge

                chunk_views = max(1, _pad_pow2(max(1, single_rows // 2
                                                   // rows_per_view)) // 2)
                merged, counts = chunked_dense_voxel_merge(
                    depth_list, img_list, Rs, ts, sc, keep,
                    fx=fx, fy=fy, cx=cx, cy=cy,
                    min_depth=0.1, max_depth=100.0,
                    subsample=ss, voxel_size=float(self.voxel_size),
                    chunk_views=min(chunk_views, nv),
                    extra=PointSet(sp_xyz_p, sp_rgb_p, sp_m))
            for i in sorted(pose_of_image):
                if keep[i]:
                    self._log(f"Camera {i}: {int(counts[i])} dense points")
            points, colors = merged.to_numpy()
            colors = colors * 255.0
        else:
            # Sparse-only fallback (reference :1155-1165): voxel merge of the
            # pair-0 sparse points on the host path.
            if not len(self.sparse_points):
                self._log("No sparse or dense points — nothing to merge")
                return None
            points, colors = merge_pointclouds(
                [(self.sparse_points.astype(np.float32),
                  self.sparse_colors.astype(np.float32))],
                voxel_size=self.voxel_size, remove_outliers=False)
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
