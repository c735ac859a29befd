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
from txr.core.precision import f32_dots
from txr.core.types import PointSet
from txr.geometry.epipolar import essential_ransac
from txr.geometry.pose import recover_pose
from txr.geometry.triangulate import triangulate, reprojection_error
from txr.geometry.scale import estimate_scale, clamp_scale
from txr.geometry.features import SIFTDetector, Features, match_features
from txr.fusion.pointcloud import depth_to_pointcloud, merge_pointclouds
from txr.io.depth_io import load_depth, find_matching_depth
from txr.io.ply import write_ply
from txr.ops.backproject import backproject_world
from txr.ops.matching import match_l2_ratio
from txr.ops.outlier import remove_statistical_outliers_grid
from txr.ops.voxel import voxel_downsample


@partial(jax.jit, static_argnames=("num_hypotheses",))
@f32_dots
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
@f32_dots
def sparse_to_world(X: jnp.ndarray, valid: jnp.ndarray,
                    R_prev: jnp.ndarray, t_prev: jnp.ndarray):
    """Triangulated points (prev-camera frame) → world, with the reference's
    depth-range filter 0.1 < z_w < 100 (depth_to_reconstruction.py:630-637)."""
    Xw = (X - t_prev.reshape(1, 3)) @ R_prev  # R_prev^T (X - t_prev)
    ok = valid & (Xw[:, 2] > 0.1) & (Xw[:, 2] < 100.0)
    return Xw, ok


# Raw (unjitted) views of inner ops for composition INSIDE the batched
# programs below. Calling a jitted function with Python-float arguments
# inside another trace converts those floats to concrete Arrays (through
# jax's global scalar cache) which are then captured as lifted constvars of
# the outer executable — and jax 0.9's C++ fastpath drops lifted constants
# on later cache hits ("Execution supplied N buffers but compiled program
# expected N+1"). The raw functions keep Python scalars as jaxpr literals.
def _raw(f):
    return getattr(f, "__wrapped__", f)


_backproject_world_raw = _raw(backproject_world)
_voxel_downsample_raw = _raw(voxel_downsample)
_outliers_grid_raw = _raw(remove_statistical_outliers_grid)


# --- batched whole-sequence programs (constant dispatch count) -------------
#
# The frame-sequential loop pays ~6 device dispatches + syncs PER FRAME
# (match, pair_step, two count fetches, scale, cloud, ...). Through a relay
# with tens of ms per round trip that overhead dominates the pipeline
# (tools/profile_fusion_cli.py). Pair computations are mutually independent
# — every pair is (i-1, i) over the FIXED image list regardless of later
# skip decisions — so the whole sequence runs as THREE batched programs:
# (1) all pair matches + pair steps, (2) all scale estimates against the
# host-chained poses, (3) all dense clouds + the device-resident merge.
# Host Python keeps only the skip/chain/EMA logic (exact reference
# semantics, depth_to_reconstruction.py:479-671).

@partial(jax.jit, static_argnames=("num_hypotheses",))
def _pairs_batch(desc, fmask, fuv, K, keys, match_ratio, ransac_threshold,
                 min_depth, max_depth, num_hypotheses: int = 1024):
    """Match + pair_step for every consecutive frame pair.

    desc/fmask/fuv: (N, cap, ...) stacked features. Returns per-pair
    (R, t, X, valid, n_inl, n_match, uv1, uv2, ok) with leading dim N-1.
    """

    # pair_step's per-row costs (hypothesis scoring, DLT triangulation,
    # GN refine) scale with the feature CAPACITY (8192 at the CLI's
    # nfeatures=8000 operating point), but only the ratio-test MATCHES
    # matter — textureless scenes yield a few hundred. Compact to the top
    # PAIR_CAP matched rows (top_k on the mask is stable, so surviving
    # rows keep their order). Default 4096: paths at capacity ≤ 4096 (the
    # test/golden operating point) are bit-identical, the 8192 CLI path
    # halves its pair program. 2048 measured a 0.13%-of-scene-scale scale
    # shift on dense textured scenes (golden chamfer 0.08 vs the 1e-2
    # pin) — matches beyond 2048 still carry scale information there.
    # TXR_PAIR_CAP=0 disables.
    pair_cap = int(os.environ.get("TXR_PAIR_CAP", "4096"))

    def one(d1, m1, u1, d2, m2, u2, key):
        idx2, ok = match_l2_ratio(d1, d2, m1, m2, match_ratio)
        uv2 = u2[idx2]
        n_match = jnp.sum(ok)
        u1c = u1
        if 0 < pair_cap < u1.shape[0]:
            _, pick = jax.lax.top_k(ok.astype(jnp.int32), pair_cap)
            u1c = u1[pick]
            uv2 = uv2[pick]
            ok = ok[pick]
        # _raw: compose the unjitted body so pair_step's Python-float
        # default (max_reproj) stays a jaxpr literal (see _raw above).
        R, t, X, valid, n_inl = _raw(pair_step)(
            u1c, uv2, ok, K, key, ransac_threshold, min_depth, max_depth,
            num_hypotheses=num_hypotheses)
        return R, t, X, valid, n_inl, n_match, u1c, uv2, ok

    # lax.map (not vmap): the per-pair (cap, cap) match-distance matrix is
    # ~268 MB f32 at cap 8192 — serializing pairs inside the ONE program
    # keeps peak memory at a single pair while every pair's matmul still
    # fills the MXU.
    return jax.lax.map(
        lambda args: one(*args),
        (desc[:-1], fmask[:-1], fuv[:-1], desc[1:], fmask[1:], fuv[1:], keys))


@jax.jit
def _scales_init(X0, valid0, uv1_0, uv2_0, d0, d1):
    """Init-pair scale estimates only (the chunked-sequence split of
    _scales_batch)."""
    s1 = estimate_scale(X0, uv1_0, valid0, d0,
                        min_points=0, per_sample_clamp=True)
    s2 = estimate_scale(X0, uv2_0, valid0, d1,
                        min_points=0, per_sample_clamp=True)
    return clamp_scale(s1), clamp_scale(s2), jnp.sum(valid0)


@jax.jit
def _scales_views(X, valid, uv2, R_prev, t_prev, depths_next):
    """Per-view world-frame scales for one chunk of pairs (the chunked-
    sequence split of _scales_batch); depths_next[p] is view p+1's depth."""

    def one(Xp, vp, u2p, Rp, tp, depth_i):
        Xw, ok = sparse_to_world(Xp, vp, Rp, tp)
        s = estimate_scale(Xw, u2p, ok, depth_i,
                           min_points=0, per_sample_clamp=True)
        return clamp_scale(s), jnp.sum(ok)

    return jax.vmap(one)(X, valid, uv2, R_prev, t_prev, depths_next)


@jax.jit
@f32_dots
def _scales_batch(X, valid, uv1, uv2, depths, R_prev, t_prev):
    """Init-pair scales + per-view world-frame scales in one program.

    X/valid/uv1/uv2: (P, cap, ...) pair outputs (device-resident from
    _pairs_batch). depths: (N, H, W). R_prev/t_prev: (P, 3, 3)/(P, 3) —
    entry p holds the chained pose of the LAST SUCCESSFUL view before view
    p+1 (host-computed; entry 0 unused).
    Returns (s1, s2, n_valid0, sw (P,), ok_n (P,)).
    """
    # depth_to_reconstruction.py:297-326 semantics: no input-count gate,
    # per-ratio (0.001, 1000) clamp before the median.
    s1 = estimate_scale(X[0], uv1[0], valid[0], depths[0],
                        min_points=0, per_sample_clamp=True)
    s2 = estimate_scale(X[0], uv2[0], valid[0], depths[1],
                        min_points=0, per_sample_clamp=True)
    n_valid0 = jnp.sum(valid[0])

    def one(Xp, vp, u2p, Rp, tp, depth_i):
        Xw, ok = sparse_to_world(Xp, vp, Rp, tp)
        s = estimate_scale(Xw, u2p, ok, depth_i,
                           min_points=0, per_sample_clamp=True)
        return s, jnp.sum(ok)

    sw, ok_n = jax.vmap(one)(X, valid, uv2, R_prev, t_prev, depths[1:])
    return s1, s2, n_valid0, sw, ok_n


_DENSE_MERGE_CACHE: dict = {}


def _dense_merge_batch_fn(fx, fy, cx, cy, min_depth, max_depth, voxel_size,
                          outlier_std_ratio, subsample: int,
                          outlier_neighbors: int):
    """Per-config jitted dense+merge program: back-project every kept view
    and merge ON DEVICE (vmapped backproject_world → flat PointSet → voxel
    downsample → grid statistical outlier removal); only the final compacted
    cloud crosses to the host. Camera/merge scalars are CLOSED OVER rather
    than passed as runtime args: a shared jit entry hit with many
    same-structure scalar-arg combinations tripped a runtime buffer-count
    mismatch ("supplied 14 buffers but compiled program expected 15"), and
    trace-time constants fold better anyway. One jit object per config
    tuple; compile count per (config, shape) is unchanged."""
    key = (fx, fy, cx, cy, min_depth, max_depth, voxel_size,
           outlier_std_ratio, subsample, outlier_neighbors)
    if key in _DENSE_MERGE_CACHE:
        return _DENSE_MERGE_CACHE[key]

    @jax.jit
    def run(depths, bgrs, Rs, ts, scales, keep):
        def one(depth, bgr, Ri, ti, s):
            return _backproject_world_raw(depth, bgr[..., ::-1], Ri, ti,
                                          fx, fy, cx, cy, min_depth,
                                          max_depth, s, subsample)

        ps = jax.vmap(one)(depths, bgrs, Rs, ts, scales)
        m = ps.mask & keep[:, None]
        counts = jnp.sum(m, axis=1)
        flat = PointSet(ps.xyz.reshape(-1, 3), ps.rgb.reshape(-1, 3),
                        m.reshape(-1))
        out = _voxel_downsample_raw(flat, voxel_size)
        out = _outliers_grid_raw(
            out, None, nb_neighbors=outlier_neighbors,
            std_ratio=outlier_std_ratio)
        return out, counts

    _DENSE_MERGE_CACHE[key] = run
    return run


def _pad_pow2(n: int, lo: int = 1) -> int:
    return max(lo, 1 << int(np.ceil(np.log2(max(n, 1)))))


def _seq_chunk() -> int:
    """Pair-slab size for long sequences (TXR_SEQ_CHUNK, default 64),
    rounded up to a power of two so it divides the pow2-padded pair count.
    Shared by the fusion and enhanced pipelines."""
    return _pad_pow2(int(os.environ.get("TXR_SEQ_CHUNK", "64")))


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
        """Run the full pipeline. Returns (points, colors[0..255], poses).

        Sequence-batched: three jitted programs (pairs, scales,
        dense+merge), each invoked once for sequences up to TXR_SEQ_CHUNK
        pairs and once per fixed-size slab beyond that (same compiled
        shape; device memory O(chunk), results identical — see the
        program-1 comment). Host Python carries only the reference's
        skip / pose-chain / scale-EMA logic
        (depth_to_reconstruction.py:479-671). Frame counts are padded to a
        power of two so programs compile once per shape bucket.
        """
        cfg = self.config
        if len(self.images) < 2:
            self._log("Need at least 2 images")
            return None, None, None

        self._log("\n" + "=" * 70)
        self._log("DEPTH-ENHANCED RECONSTRUCTION PIPELINE (TPU)")
        self._log("=" * 70)

        K = jnp.asarray(cfg.K.astype(np.float32))
        t0 = time.time()
        # One batched device program per 8 frames (detect_batch) instead of
        # 2 dispatches + 4 host round trips per frame on the device backend.
        features = self.detector.detect_batch(self.images)
        self._log(f"Features detected for {len(features)} frames "
                  f"({time.time() - t0:.2f}s)")

        n = len(self.images)
        n_pairs = n - 1
        p2 = _pad_pow2(n_pairs)
        n2 = p2 + 1

        cap = features[0].uv.shape[0]
        if isinstance(features[0].desc, jnp.ndarray):
            # Device backend: features never left the device (see
            # SIFTDetector.detect_batch) — stack them there. The later
            # jnp.asarray(desc[...]) calls are no-ops on device arrays.
            pad_rows = n2 - len(features)
            desc = jnp.concatenate(
                [jnp.stack([f.desc for f in features])]
                + ([jnp.zeros((pad_rows, cap, features[0].desc.shape[1]),
                              jnp.float32)] if pad_rows else []))
            fuv = jnp.concatenate(
                [jnp.stack([f.uv for f in features])]
                + ([jnp.zeros((pad_rows, cap, 2), jnp.float32)]
                   if pad_rows else []))
            fmask = jnp.concatenate(
                [jnp.stack([f.mask for f in features])]
                + ([jnp.zeros((pad_rows, cap), bool)] if pad_rows else []))
        else:
            desc = np.zeros((n2, cap, features[0].desc.shape[1]), np.float32)
            fuv = np.zeros((n2, cap, 2), np.float32)
            fmask = np.zeros((n2, cap), bool)
            for i, f in enumerate(features):
                desc[i], fuv[i], fmask[i] = f.desc, f.uv, f.mask
        # Pad to the max frame shape — folders may mix resolutions (matched
        # uv never lands in the pad; padded depth reads 0 and masks out
        # downstream, mirroring the per-frame reference loop's tolerance).
        # Padded slabs are built on demand from self.depths so the chunked
        # long-sequence paths never hold a second O(views) host copy.
        h = max(d.shape[0] for d in self.depths)
        w = max(d.shape[1] for d in self.depths)

        def dslab(s, e):
            out = np.zeros((e - s, h, w), np.float32)
            for k in range(s, min(e, n)):
                d = self.depths[k]
                out[k - s, :d.shape[0], :d.shape[1]] = d
            return out

        depths_full = None  # (n2, h, w) stack, built only where needed

        # One key per pair, in pair order. On sequences where every pair
        # reaches RANSAC this is the exact key stream the frame-sequential
        # loop drew (keeps the committed golden cloud bit-stable). On
        # degraded inputs the sequential loop skipped the draw for <8-match
        # pairs, so the streams diverge after the first skip — both are
        # valid RANSAC draws; exact replication would need match counts on
        # host BEFORE program 1, an extra round trip per sequence.
        key_list = [self._next_key() for _ in range(p2)]

        # ---- program 1: all pair matches + pose/structure ------------------
        # Sequences longer than TXR_SEQ_CHUNK pairs run the SAME program
        # over fixed-size pair slabs: the stacked descriptor input is
        # O(views) in HBM (4.2 MB/view at cap 8192), so one program over a
        # 1000-view folder would stage >4 GB before compute starts. The
        # chunk is a power of two, so it divides the pow2-padded pair count
        # and every slab compiles to the one shape. Per-pair math is
        # independent — chunked results are identical. Per-chunk outputs
        # round-trip to host (~170 KB/pair) and re-stage for the scale
        # program, so HBM residency is O(chunk), not O(sequence).
        seq_chunk = _seq_chunk()
        pair_chunks = None
        if p2 <= seq_chunk:
            (R_rel, t_rel, X, valid, n_inl, n_match, uv1b, uv2b, _okb) = \
                _pairs_batch(jnp.asarray(desc), jnp.asarray(fmask),
                             jnp.asarray(fuv), K, jnp.stack(key_list),
                             cfg.match_ratio, cfg.ransac_threshold,
                             cfg.min_depth, cfg.max_depth)
            # ONE round-trip fetch of the small host-chain inputs (X/uv stay
            # on device for the scale program).
            R_rel_h, t_rel_h, n_inl_h, n_match_h = jax.device_get(
                (R_rel, t_rel, n_inl, n_match))
        else:
            cp = seq_chunk
            pair_chunks = []          # per-chunk HOST (X, valid, uv2)
            R_l, t_l, ni_l, nm_l = [], [], [], []
            uv1_0 = None
            for s in range(0, p2, cp):
                (Rc, tc, Xc, vc, nic, nmc, u1c, u2c, _ok) = _pairs_batch(
                    jnp.asarray(desc[s:s + cp + 1]),
                    jnp.asarray(fmask[s:s + cp + 1]),
                    jnp.asarray(fuv[s:s + cp + 1]), K,
                    jnp.stack(key_list[s:s + cp]),
                    cfg.match_ratio, cfg.ransac_threshold, cfg.min_depth,
                    cfg.max_depth)
                # host round trip doubles as backpressure: without it the
                # async dispatch would stage every slab into HBM at once
                Xh, vh, u2h, a, b, c2, d2 = jax.device_get(
                    (Xc, vc, u2c, Rc, tc, nic, nmc))
                if s == 0:
                    uv1_0 = np.asarray(u1c[0])
                pair_chunks.append((Xh, vh, u2h))
                R_l.append(a)
                t_l.append(b)
                ni_l.append(c2)
                nm_l.append(d2)
            R_rel_h = np.concatenate(R_l)
            t_rel_h = np.concatenate(t_l)
            n_inl_h = np.concatenate(ni_l)
            n_match_h = np.concatenate(nm_l)

        # ---- Step 1: initialize with the first pair ------------------------
        self._log("\n--- Step 1: Initialize with first pair ---")
        self._log(f"Feature matches: {int(n_match_h[0])}")
        if int(n_match_h[0]) < 8:
            self._log("Insufficient matches for initialization")
            return None, None, None
        self._log(f"Inliers: {int(n_inl_h[0])}")

        self.camera_poses = [
            (np.eye(3, dtype=np.float32), np.zeros(3, np.float32)),
            (R_rel_h[0], t_rel_h[0]),
        ]

        # Host pose chain with the reference's skip rules; R_prev[p] is the
        # last successful pose before view p+1 (feeds the scale program).
        R_prev = np.tile(np.eye(3, dtype=np.float32), (p2, 1, 1))
        t_prev = np.zeros((p2, 3), np.float32)
        processed: List[int] = []
        skip_reason: dict = {}
        for i in range(2, n):
            p = i - 1
            if int(n_match_h[p]) < 8:
                skip_reason[i] = f"insufficient matches ({int(n_match_h[p])})"
                continue
            if int(n_inl_h[p]) < 8:
                skip_reason[i] = f"insufficient inliers ({int(n_inl_h[p])})"
                continue
            Rp, tp = self.camera_poses[-1]
            R_prev[p], t_prev[p] = Rp, tp
            R_curr = R_rel_h[p] @ Rp
            t_curr = R_rel_h[p] @ tp + t_rel_h[p]
            self.camera_poses.append((R_curr, t_curr))
            processed.append(i)

        # ---- program 2: all scale estimates --------------------------------
        if pair_chunks is None:
            depths_full = dslab(0, n2)
            s1_d, s2_d, n_valid0_d, sw_d, okn_d = _scales_batch(
                X, valid, uv1b, uv2b, jnp.asarray(depths_full),
                jnp.asarray(R_prev), jnp.asarray(t_prev))
            s1c, s2c, n_valid0, sw_h, okn_h = jax.device_get(
                (clamp_scale(s1_d), clamp_scale(s2_d), n_valid0_d,
                 jax.vmap(clamp_scale)(sw_d), okn_d))
        else:
            # Same split, chunked: the (N, H, W) depth stack is the other
            # O(views) device allocation (8.3 MB/view f32 at 1080p).
            cp = seq_chunk
            X0, valid0_0, uv2_0 = pair_chunks[0]
            d01 = dslab(0, 2)
            s1_d, s2_d, nv0 = _scales_init(
                jnp.asarray(X0[0]), jnp.asarray(valid0_0[0]),
                jnp.asarray(uv1_0), jnp.asarray(uv2_0[0]),
                jnp.asarray(d01[0]), jnp.asarray(d01[1]))
            sw_l, okn_l = [], []
            for ci, s in enumerate(range(0, p2, cp)):
                Xc, vc, u2c = pair_chunks[ci]
                swc, oknc = _scales_views(
                    jnp.asarray(Xc), jnp.asarray(vc), jnp.asarray(u2c),
                    jnp.asarray(R_prev[s:s + cp]),
                    jnp.asarray(t_prev[s:s + cp]),
                    jnp.asarray(dslab(s + 1, s + cp + 1)))
                a, b = jax.device_get((swc, oknc))
                sw_l.append(a)
                okn_l.append(b)
                pair_chunks[ci] = None  # free this chunk's buffers
            s1c, s2c, n_valid0 = jax.device_get((s1_d, s2_d, nv0))
            sw_h = np.concatenate(sw_l)
            okn_h = np.concatenate(okn_l)
        n_valid0 = int(n_valid0)
        self._log(f"Valid sparse points: {n_valid0}")

        # ---- Step 2: depth scale from sparse anchor ------------------------
        self._log("\n--- Step 2: Estimate depth scale ---")
        if n_valid0 >= 3:
            avg_scale = float((s1c + s2c) / 2.0)
        else:
            self._log("Warning: Not enough sparse points for scale estimation")
            avg_scale = 1.0
        self._log(f"Average scale: {avg_scale:.6f}")

        # Scale EMA chain (reference :633-650) over the processed views.
        view_R = np.zeros((n2, 3, 3), np.float32)
        view_t = np.zeros((n2, 3), np.float32)
        view_scale = np.zeros((n2,), np.float32)
        keep = np.zeros((n2,), bool)
        for i in (0, 1):
            view_R[i], view_t[i] = self.camera_poses[i]
            view_scale[i] = avg_scale
            keep[i] = True
        pose_idx = 2
        scale_warn: dict = {}
        for i in processed:
            p = i - 1
            if int(okn_h[p]) >= 3:
                scale_i = float(sw_h[p])
            else:
                scale_warn[i] = True
                scale_i = avg_scale
            avg_scale = 0.7 * avg_scale + 0.3 * scale_i
            view_R[i], view_t[i] = self.camera_poses[pose_idx]
            view_scale[i] = avg_scale
            keep[i] = True
            pose_idx += 1

        # ---- program 3: dense clouds + device merge ------------------------
        ss = int(cfg.subsample_factor)
        rows_per_view = -(-h // ss) * -(-w // ss)
        single_rows = int(os.environ.get("TXR_DENSE_SINGLE_ROWS",
                                         str(1 << 24)))
        if n2 * rows_per_view <= single_rows:
            if depths_full is None:
                depths_full = dslab(0, n2)
            bgrs = np.zeros((n2, h, w, 3), np.uint8)
            for i, im in enumerate(self.images):
                bgrs[i, :im.shape[0], :im.shape[1]] = im
            dense_merge = _dense_merge_batch_fn(
                float(cfg.fx), float(cfg.fy), float(cfg.cx), float(cfg.cy),
                float(cfg.min_depth), float(cfg.max_depth),
                float(cfg.voxel_size), float(cfg.outlier_std_ratio),
                ss, int(cfg.outlier_neighbors))
            merged, counts_d = dense_merge(
                jnp.asarray(depths_full), jnp.asarray(bgrs),
                jnp.asarray(view_R), jnp.asarray(view_t),
                jnp.asarray(view_scale), jnp.asarray(keep))
            counts = np.asarray(counts_d)
        else:
            # Long sequences: one program over every view would stage
            # O(views) device memory and a sort far past the measured
            # envelope; chunk the views with an exact weighted merge
            # (txr/fusion/chunked_merge.py), then the same outlier pass.
            # Per-view lists (not padded stacks) keep host memory O(chunk).
            from txr.fusion.chunked_merge import chunked_dense_voxel_merge

            depths_full = None  # drop any stack before the chunked walk
            depth_list = list(self.depths) + [None] * (n2 - n)
            img_list = list(self.images) + [None] * (n2 - n)
            chunk_views = max(1, _pad_pow2(max(1, single_rows // 2
                                               // rows_per_view)) // 2)
            merged, counts = chunked_dense_voxel_merge(
                depth_list, img_list, view_R, view_t, view_scale, keep,
                fx=cfg.fx, fy=cfg.fy, cx=cfg.cx, cy=cfg.cy,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth,
                subsample=ss, voxel_size=float(cfg.voxel_size),
                chunk_views=min(chunk_views, n2))
            merged = remove_statistical_outliers_grid(
                merged, None, nb_neighbors=int(cfg.outlier_neighbors),
                std_ratio=float(cfg.outlier_std_ratio))
        points, colors = merged.to_numpy()
        colors = colors * 255.0

        # Narration (same lines/order as the frame-sequential reference loop).
        self._log("\n--- Step 3: Generate dense point clouds ---")
        for i in (0, 1):
            self._log(f"Camera {i}: {int(counts[i])} points")
        self._log("\n--- Step 4: Add remaining views ---")
        for i in range(2, n):
            self._log(f"\nProcessing image {i}...")
            self._log(f"Feature matches: {int(n_match_h[i - 1])}")
            if i in skip_reason:
                self._log(f"  Skipping - {skip_reason[i]}")
                continue
            if i in scale_warn:
                self._log("  Warning: Not enough valid points for scale, "
                          "using previous")
            self._log(f"  Camera {i}: {int(counts[i])} points "
                      f"(scale {view_scale[i]:.4f})")

        # ---- Step 5: merge --------------------------------------------------
        self._log("\n--- Step 5: Merge and clean point cloud ---")
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

        from txr.geometry.scale import estimate_scale as _es

        pts = jnp.asarray(np.asarray(sparse_points, np.float32))
        uv = jnp.asarray(np.asarray(sparse_2d, np.float32))
        mask = jnp.ones(pts.shape[0], bool)
        s = _es(pts, uv, mask, jnp.asarray(depth_map),
                min_points=0, per_sample_clamp=True)
        return float(np.asarray(clamp_scale(s)))

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
