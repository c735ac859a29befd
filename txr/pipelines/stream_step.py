"""One-device-program-per-frame streaming SLAM step.

The stepwise StreamingReconstructor (txr/pipelines/streaming.py) dispatches
~10 device programs per frame and pulls half a dozen host scalars between
them — on the axon relay that is ~10 × 40 ms of sync floor per frame
(measured 0.55 fps at 640×480/vits, BENCH_CONFIGS config 5), and on any TPU
it serializes host↔device round trips into the hot loop. The reference has
the same structure spread over an 8-process ROS2 graph
(slam.launch.py:79-145); its latency hides behind DDS queues.

This module fuses the ENTIRE per-frame chain into one jitted program over
device-resident state:

    frame u8 ──H2D──▶ [ gray+CLAHE → SIFT → match(prev) → RANSAC pose
                        → depth (DA forward) → scale EMA → backproject
                        → point-to-plane ICP vs map → voxel-map insert ]
                      ──▶ (state', tiny diagnostics)

State (voxel map accumulators, previous-frame features, pose chain, scale,
PRNG key) never leaves the device; the host uploads one uint8 frame and
reads back a ~100-byte diagnostic row (pose, inlier counts, fused flag).
Big per-frame products (depth map, feature arrays) are returned as device
references and only transferred on keyframe frames, where the host-side
loop-closure logic (streaming.py:_maybe_keyframe) needs them.

Semantics match the stepwise path exactly when loop closure is off: the
same key stream (one split per non-initial frame), the same skip rules
(MIN_INLIERS, constant-position + ICP rescue), the same scale-EMA updates,
and cv2's exact fixed-point BGR→gray conversion so the SIFT input is
bit-identical. Control flow is jnp.where / lax.cond — no host branching.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from txr.core.types import PointSet
from txr.fusion.offset_map import (
    OffsetVoxelMap,
    create_offset_map,
    offset_map_insert,
    offset_map_points,
    offset_map_size,
)
from txr.geometry.icp import estimate_normals, icp_point_to_plane
from txr.geometry.scale import clamp_scale, ema_scale, estimate_scale
from txr.ops.backproject import backproject, transform_to_world
from txr.ops.clahe import clahe
from txr.ops.matching import match_l2_ratio
from txr.ops.resize import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    compute_da_resize,
    resize_bicubic,
    resize_bilinear,
)
from txr.ops.sift import sift_features
from txr.pipelines.fusion_pipeline import pair_step

MIN_INLIERS = 15  # rtabmap rgbd_odometry Vis/MinInliers (slam.launch.py:115)


class FusedStreamState(NamedTuple):
    """Device-resident streaming state (everything the next frame needs)."""

    vm: OffsetVoxelMap
    prev_uv: jnp.ndarray     # (cap, 2) f32 previous-frame keypoints
    prev_desc: jnp.ndarray   # (cap, 128) f32 previous-frame descriptors
    prev_mask: jnp.ndarray   # (cap,) bool
    R: jnp.ndarray           # (3, 3) world→camera of the last fused frame
    t: jnp.ndarray           # (3,)
    scale: jnp.ndarray       # () f32 running depth-scale EMA
    key: jax.Array           # PRNG key (same stream the stepwise path draws)
    n_fused: jnp.ndarray     # () i32 frames fused so far


class FusedStreamDiag(NamedTuple):
    """Per-frame outputs. Scalars are fetched every chunk; `depth`/feature
    arrays are device references fetched only on keyframe frames."""

    R: jnp.ndarray
    t: jnp.ndarray
    scale: jnp.ndarray
    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    fused: jnp.ndarray       # bool: frame entered the map
    icp_frac: jnp.ndarray    # inlier fraction of the ICP solve (-1 = not run)
    map_size: jnp.ndarray    # occupied voxels after insert
    depth: jnp.ndarray       # (H, W) f32 — device ref, keyframe use only
    uv: jnp.ndarray          # (cap, 2) — this frame's features (device refs)
    desc: jnp.ndarray        # (cap, 128)
    fmask: jnp.ndarray       # (cap,)


def init_fused_state(map_capacity: int, voxel_size: float,
                     feature_capacity: int, seed: int = 0) -> FusedStreamState:
    return FusedStreamState(
        vm=create_offset_map(map_capacity, voxel_size),
        prev_uv=jnp.zeros((feature_capacity, 2), jnp.float32),
        prev_desc=jnp.zeros((feature_capacity, 128), jnp.float32),
        prev_mask=jnp.zeros((feature_capacity,), bool),
        R=jnp.eye(3, dtype=jnp.float32),
        t=jnp.zeros((3,), jnp.float32),
        scale=jnp.asarray(1.0, jnp.float32),
        key=jax.random.PRNGKey(seed),
        n_fused=jnp.asarray(0, jnp.int32),
    )


def _bgr_to_gray_u8(bgr_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.cvtColor(BGR2GRAY) bit-exact: fixed-point BT.601 with rounding
    (R*4899 + G*9617 + B*1868 + 2^13) >> 14."""
    b = bgr_u8[..., 0].astype(jnp.int32)
    g = bgr_u8[..., 1].astype(jnp.int32)
    r = bgr_u8[..., 2].astype(jnp.int32)
    y = (r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
    return y.astype(jnp.uint8)


def build_fused_stream_step(model, intr, cfg, *, h: int, w: int,
                            feature_capacity: int = 4096,
                            n_features: int | None = None,
                            contrast_threshold: float = 0.01,
                            edge_threshold: float = 15.0,
                            use_clahe: bool = True,
                            use_icp: bool = True,
                            metric_depth: bool = False,
                            icp_sample: int = 4096):
    """Build the jitted per-frame step for a fixed frame shape.

    Args:
      model: DepthAnythingModel (its Flax module + input_size are baked in;
        params are passed per call so they stay device-resident).
      intr: CameraIntrinsics.
      cfg: StreamingConfig (depth range, voxel size, ICP knobs, stride).
      h, w: frame shape (one compiled program per shape).

    Returns step(params, state, bgr_u8) -> (state', FusedStreamDiag), jitted.
    """
    in_h, in_w = compute_da_resize(h, w, model.input_size)
    flax_model = model.model
    # V3 metric heads scale by focal length (reference depth_processor.py:306).
    v3_factor = (float((intr.fx + intr.fy) / 2.0 / model.focal_length_ref)
                 if model.version == "v3" else 1.0)
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)
    min_depth, max_depth = float(cfg.min_depth), float(cfg.max_depth)
    stride = int(cfg.subsample_factor)
    icp_iters = int(cfg.icp_iterations)
    icp_max_corr = float(cfg.icp_max_correspondence)

    # NOT donated: diag fields alias state fields (e.g. this frame's feature
    # arrays are both diag.uv and state'.prev_uv) and the host fetches diags
    # in deferred chunks — donation would let a later step reuse buffers a
    # pending diag still references. The in-place saving is ~40 MB of HBM
    # traffic per step (<1 ms); correctness wins.
    @jax.jit
    def step(params, state: FusedStreamState, bgr_u8: jnp.ndarray):
        rgb_u8 = bgr_u8[..., ::-1]

        # ---- depth (DepthAnythingModel._batched_forward_fn, device-composed)
        x = rgb_u8.astype(jnp.float32) / 255.0
        x = resize_bicubic(x, in_h, in_w, align_corners=False)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = ((x - mean) / std)[None]
        depth = flax_model.apply({"params": params}, x)
        depth = resize_bilinear(depth[..., None], h, w,
                                align_corners=True)[0, ..., 0]
        if v3_factor != 1.0:
            depth = depth * v3_factor

        # ---- features (SIFTDetector device path) ---------------------------
        gray = _bgr_to_gray_u8(bgr_u8)
        if use_clahe:
            gray = clahe.__wrapped__(gray, 2.0, 8)
        f = sift_features(gray, capacity=feature_capacity,
                          contrast_threshold=contrast_threshold,
                          edge_threshold=edge_threshold,
                          n_features=n_features)

        # ---- relative pose vs previous frame (streaming.py:111-128) --------
        first = state.n_fused == 0
        # Key stream parity with the stepwise path: one split per non-initial
        # frame (frame 0 never calls pair_step there).
        key_next, sub = jax.random.split(state.key)
        key_next = jnp.where(first, state.key, key_next)
        K = jnp.asarray(intr.to_matrix(), jnp.float32)
        idx2, ok = match_l2_ratio.__wrapped__(
            state.prev_desc, f.desc, state.prev_mask, f.mask, 0.75)
        uv2 = f.uv[idx2]
        R_rel, t_rel, X, valid, n_inl = pair_step.__wrapped__(
            state.prev_uv, uv2, ok, K, sub, 2.0, min_depth, max_depth * 10)
        n_inl = jnp.where(first, 0, n_inl)

        # Scale anchor: X is in the previous camera's frame; depth pairs with
        # the CURRENT pixels, so transform first (streaming.py:121-127).
        X_curr = X @ R_rel.T + t_rel
        n_valid = jnp.sum(valid)
        s_i = clamp_scale(estimate_scale.__wrapped__(
            X_curr, uv2, valid, depth))

        feat_ok = (~first) & (n_inl >= MIN_INLIERS)
        R_chain = R_rel @ state.R
        t_chain = R_rel @ state.t + t_rel
        # first → identity; features ok → chained; else constant-position.
        R_pose = jnp.where(first, jnp.eye(3, dtype=jnp.float32),
                           jnp.where(feat_ok, R_chain, state.R))
        t_pose = jnp.where(first, 0.0, jnp.where(feat_ok, t_chain, state.t))
        upd_scale = feat_ok & (n_valid >= 5) & (not metric_depth)
        scale = jnp.where(first, 1.0,
                          jnp.where(upd_scale,
                                    ema_scale(state.scale, s_i), state.scale))
        # With ICP on, feature failure falls back to constant-position + ICP
        # rescue; with it off the frame is skipped (streaming.py:295-308).
        fused = first | feat_ok if not use_icp else jnp.asarray(True)

        # ---- backproject at the pose estimate ------------------------------
        ps = transform_to_world.__wrapped__(
            backproject.__wrapped__(depth, rgb_u8, fx, fy, cx, cy,
                                    min_depth, max_depth, scale, stride),
            R_pose, t_pose)

        # ---- ICP refinement against the map (streaming.py:130-163) ---------
        icp_frac = jnp.asarray(-1.0, jnp.float32)
        if use_icp:
            map_ps = offset_map_points.__wrapped__(state.vm)
            occ = map_ps.mask
            map_xyz = map_ps.xyz
            sstep = max(1, ps.xyz.shape[0] // icp_sample)
            src_xyz = ps.xyz[::sstep][:icp_sample]
            src_mask = ps.mask[::sstep][:icp_sample]
            # Strided subsample — the map is voxel-key sorted, so a prefix
            # slice would be one spatial corner of the scene.
            tcap = min(icp_sample * 4, map_xyz.shape[0])
            tstep = max(1, map_xyz.shape[0] // tcap)
            tgt_xyz = map_xyz[::tstep][:tcap]
            tgt_mask = occ[::tstep][:tcap]
            do_icp = ((~first) & (jnp.sum(tgt_mask) >= 100)
                      & (jnp.sum(src_mask) >= 100))

            def _icp(_):
                normals = estimate_normals.__wrapped__(tgt_xyz, tgt_mask, 8)
                Rc, tc, _rmse, frac = icp_point_to_plane.__wrapped__(
                    src_xyz, src_mask, tgt_xyz, normals, tgt_mask,
                    jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, dtype=jnp.float32),
                    icp_iters, icp_max_corr, 1024)
                return Rc, tc, frac.astype(jnp.float32)

            def _skip(_):
                return (jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, dtype=jnp.float32),
                        jnp.asarray(-1.0, jnp.float32))

            Rc, tc, icp_frac = jax.lax.cond(do_icp, _icp, _skip, None)
            apply_icp = do_icp & (icp_frac >= 0.3)
            # World correction X' = Rc X + tc folds into both the points and
            # the pose (identical to re-backprojecting at the new pose).
            R_new = R_pose @ Rc.T
            t_new = t_pose - R_new @ tc
            R_pose = jnp.where(apply_icp, R_new, R_pose)
            t_pose = jnp.where(apply_icp, t_new, t_pose)
            xyz_c = ps.xyz @ Rc.T + tc[None, :]
            ps = PointSet(
                xyz=jnp.where(apply_icp, jnp.where(ps.mask[:, None], xyz_c, 0.0),
                              ps.xyz),
                rgb=ps.rgb, mask=ps.mask)

        # ---- insert into the map -------------------------------------------
        ps = PointSet(xyz=ps.xyz, rgb=ps.rgb, mask=ps.mask & fused)
        vm = offset_map_insert.__wrapped__(state.vm, ps)

        new_state = FusedStreamState(
            vm=vm, prev_uv=f.uv, prev_desc=f.desc, prev_mask=f.mask,
            R=jnp.where(fused, R_pose, state.R),
            t=jnp.where(fused, t_pose, state.t),
            scale=scale, key=key_next,
            n_fused=state.n_fused + fused.astype(jnp.int32))
        diag = FusedStreamDiag(
            R=R_pose, t=t_pose, scale=scale,
            n_matches=jnp.sum(ok), n_inliers=n_inl, fused=fused,
            icp_frac=icp_frac,
            map_size=offset_map_size.__wrapped__(vm),
            depth=depth, uv=f.uv, desc=f.desc, fmask=f.mask)
        return new_state, diag

    return step


class FusedStreamBatchDiag(NamedTuple):
    """Per-frame outputs of the batched step; leading axis is the batch.
    `map_size` is a scalar (the map after the whole batch's insert).
    `kf_*` is each frame's CAMERA-frame keyframe cloud (pose-independent,
    what streaming.py stores for loop-closure re-fusion) so keyframe
    bookkeeping needs no extra device dispatch."""

    R: jnp.ndarray           # (B, 3, 3)
    t: jnp.ndarray           # (B, 3)
    scale: jnp.ndarray       # (B,)
    n_matches: jnp.ndarray   # (B,)
    n_inliers: jnp.ndarray   # (B,)
    fused: jnp.ndarray       # (B,) bool
    icp_frac: jnp.ndarray    # (B,)
    map_size: jnp.ndarray    # () i32 — after the batch insert
    depth: jnp.ndarray       # (B, H, W)
    uv: jnp.ndarray          # (B, cap, 2)
    desc: jnp.ndarray        # (B, cap, 128)
    fmask: jnp.ndarray       # (B, cap)
    kf_xyz: jnp.ndarray      # (B, kf_cloud_points, 3)
    kf_rgb: jnp.ndarray      # (B, kf_cloud_points, 3)
    kf_mask: jnp.ndarray     # (B, kf_cloud_points)


def build_fused_stream_batch_step(model, intr, cfg, *, h: int, w: int,
                                  batch: int,
                                  feature_capacity: int = 4096,
                                  n_features: int | None = None,
                                  contrast_threshold: float = 0.01,
                                  edge_threshold: float = 15.0,
                                  use_clahe: bool = True,
                                  use_icp: bool = True,
                                  metric_depth: bool = False,
                                  icp_sample: int = 4096,
                                  kf_cloud_points: int = 16384):
    """Batched fused streaming: ONE device program per `batch` frames.

    Per-frame streaming pays a dispatch + H2D round trip per frame (~40 ms
    sync-class cost each through the axon relay) and repeats three
    batch-amortizable computations every frame: the depth forward (MXU
    utilization at batch 1 is poor), the ICP target sampling + normal
    estimation over the full map, and the full-capacity voxel-map sort
    inside the insert. This builder runs the depth forward batched, the
    per-frame chain (SIFT → match → RANSAC → scale EMA → pose chain →
    backproject → ICP) as a `lax.scan` with EXACTLY the per-frame step's
    semantics (same key stream, same skip rules, same EMA updates), and a
    single map insert of all fused frames' points at the end.

    Three documented semantic deltas vs the per-frame step:
      - ICP registers each frame against the map AS OF THE BATCH START
        (its target sample + normals are computed once per batch), so a
        frame does not see points inserted by earlier frames of the same
        batch. Pose corrections still propagate through the chain inside
        the scan.
      - The map insert is one batched merge; per-voxel sums are identical
        to per-frame inserts up to float summation order.
      - A mid-batch loop closure that triggers a map REBUILD replaces the
        map with the keyframe-only re-fusion (streaming._rebuild_map) AFTER
        the whole batch was already inserted: the non-keyframe frames of
        that batch lose their (density-only) map contribution until the
        next insert, where the per-frame step would have inserted them into
        the rebuilt map (ADVICE r3). Keyframe clouds — the geometry the
        rebuild is built from — are unaffected; at the default
        keyframe_every=5 and stream_batch=8 this costs at most 7 frames of
        densification per rebuilding closure.

    step(params, state, frames_u8 (B,H,W,3), n_valid) -> (state', diag).
    Frames at index >= n_valid are padding: they never fuse, never touch
    the carry, and insert nothing — the tail of a stream reuses this same
    compiled program instead of compiling a per-frame one.
    """
    in_h, in_w = compute_da_resize(h, w, model.input_size)
    flax_model = model.model
    v3_factor = (float((intr.fx + intr.fy) / 2.0 / model.focal_length_ref)
                 if model.version == "v3" else 1.0)
    fx, fy = float(intr.fx), float(intr.fy)
    cx, cy = float(intr.cx), float(intr.cy)
    min_depth, max_depth = float(cfg.min_depth), float(cfg.max_depth)
    stride = int(cfg.subsample_factor)
    icp_iters = int(cfg.icp_iterations)
    icp_max_corr = float(cfg.icp_max_correspondence)
    B = int(batch)

    @jax.jit
    def step(params, state: FusedStreamState, frames_u8: jnp.ndarray,
             n_valid: jnp.ndarray):
        rgb = frames_u8[..., ::-1]

        # ---- depth forward, batched over all B frames ----------------------
        x = rgb.astype(jnp.float32) / 255.0
        x = resize_bicubic(x, in_h, in_w, align_corners=False)
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x - mean) / std
        depth = flax_model.apply({"params": params}, x)
        depth = resize_bilinear(depth[..., None], h, w,
                                align_corners=True)[..., 0]
        if v3_factor != 1.0:
            depth = depth * v3_factor

        # ---- ICP target from the batch-start map (amortized) ---------------
        if use_icp:
            map_ps = offset_map_points.__wrapped__(state.vm)
            tcap = min(icp_sample * 4, map_ps.xyz.shape[0])
            tstep = max(1, map_ps.xyz.shape[0] // tcap)
            tgt_xyz = map_ps.xyz[::tstep][:tcap]
            tgt_mask = map_ps.mask[::tstep][:tcap]
            have_map = jnp.sum(tgt_mask) >= 100
            normals = estimate_normals.__wrapped__(tgt_xyz, tgt_mask, 8)

        K = jnp.asarray(intr.to_matrix(), jnp.float32)
        eye3 = jnp.eye(3, dtype=jnp.float32)
        zero3 = jnp.zeros((3,), jnp.float32)

        # ---- feature detection, hoisted out of the scan --------------------
        # Detection is pure per-frame (no carry dependence), so it runs
        # before the scan. lax.map, not vmap: vmapping SIFT's packed
        # single-row-gather passes lowers to a slower two-axis gather
        # (104.5 vs 37.8 ms/frame standalone at cap 8192 —
        # tools/probe_device_features.py, r5); TXR_SIFT_HOIST=vmap is the
        # probe knob to re-measure.
        def detect_one(bgr_i):
            gray = _bgr_to_gray_u8(bgr_i)
            if use_clahe:
                gray = clahe.__wrapped__(gray, 2.0, 8)
            f = sift_features(gray, capacity=feature_capacity,
                              contrast_threshold=contrast_threshold,
                              edge_threshold=edge_threshold,
                              n_features=n_features)
            return f.uv, f.desc, f.mask

        import os as _os
        if _os.environ.get("TXR_SIFT_HOIST", "map") == "vmap":
            uv_all, desc_all, mask_all = jax.vmap(detect_one)(frames_u8)
        else:
            uv_all, desc_all, mask_all = jax.lax.map(detect_one, frames_u8)

        def body(carry, xs):
            (prev_uv, prev_desc, prev_mask, R_st, t_st,
             scale_st, key_st, n_fused_st) = carry
            bgr_i, depth_i, valid_i, f_uv, f_desc, f_mask = xs
            rgb_i = bgr_i[..., ::-1]

            first = n_fused_st == 0
            key_next, sub = jax.random.split(key_st)
            key_next = jnp.where(first, key_st, key_next)
            idx2, ok = match_l2_ratio.__wrapped__(
                prev_desc, f_desc, prev_mask, f_mask, 0.75)
            uv2 = f_uv[idx2]
            R_rel, t_rel, X, valid3, n_inl = pair_step.__wrapped__(
                prev_uv, uv2, ok, K, sub, 2.0, min_depth, max_depth * 10)
            n_inl = jnp.where(first, 0, n_inl)

            X_curr = X @ R_rel.T + t_rel
            n_anchor = jnp.sum(valid3)
            s_i = clamp_scale(estimate_scale.__wrapped__(
                X_curr, uv2, valid3, depth_i))

            feat_ok = (~first) & (n_inl >= MIN_INLIERS)
            R_chain = R_rel @ R_st
            t_chain = R_rel @ t_st + t_rel
            R_pose = jnp.where(first, eye3,
                               jnp.where(feat_ok, R_chain, R_st))
            t_pose = jnp.where(first, 0.0, jnp.where(feat_ok, t_chain, t_st))
            upd_scale = feat_ok & (n_anchor >= 5) & (not metric_depth)
            scale = jnp.where(first, 1.0,
                              jnp.where(upd_scale,
                                        ema_scale(scale_st, s_i), scale_st))
            fused = first | feat_ok if not use_icp else jnp.asarray(True)
            fused = fused & valid_i

            ps = transform_to_world.__wrapped__(
                backproject.__wrapped__(depth_i, rgb_i, fx, fy, cx, cy,
                                        min_depth, max_depth, scale, stride),
                R_pose, t_pose)

            icp_frac = jnp.asarray(-1.0, jnp.float32)
            if use_icp:
                sstep = max(1, ps.xyz.shape[0] // icp_sample)
                src_xyz = ps.xyz[::sstep][:icp_sample]
                src_mask = ps.mask[::sstep][:icp_sample]
                do_icp = ((~first) & have_map
                          & (jnp.sum(src_mask) >= 100) & valid_i)

                def _icp(_):
                    Rc, tc, _rmse, frac = icp_point_to_plane.__wrapped__(
                        src_xyz, src_mask, tgt_xyz, normals, tgt_mask,
                        eye3, zero3, icp_iters, icp_max_corr, 1024)
                    return Rc, tc, frac.astype(jnp.float32)

                def _skip(_):
                    return eye3, zero3, jnp.asarray(-1.0, jnp.float32)

                Rc, tc, icp_frac = jax.lax.cond(do_icp, _icp, _skip, None)
                apply_icp = do_icp & (icp_frac >= 0.3)
                R_new = R_pose @ Rc.T
                t_new = t_pose - R_new @ tc
                R_pose = jnp.where(apply_icp, R_new, R_pose)
                t_pose = jnp.where(apply_icp, t_new, t_pose)
                xyz_c = ps.xyz @ Rc.T + tc[None, :]
                ps = PointSet(
                    xyz=jnp.where(apply_icp,
                                  jnp.where(ps.mask[:, None], xyz_c, 0.0),
                                  ps.xyz),
                    rgb=ps.rgb, mask=ps.mask)

            ins_mask = ps.mask & fused

            # CAMERA-frame keyframe cloud: the world points mapped back
            # through this frame's (post-ICP) pose are exactly the raw
            # camera backprojection, so no second backproject is needed.
            kstep = max(1, ps.xyz.shape[0] // kf_cloud_points)
            kx_w = ps.xyz[::kstep][:kf_cloud_points]
            kf_xyz = kx_w @ R_pose.T + t_pose[None, :]
            kf_rgb = ps.rgb[::kstep][:kf_cloud_points]
            kf_mask = ps.mask[::kstep][:kf_cloud_points]

            # Padding frames leave the carry untouched.
            new_carry = (
                jnp.where(valid_i, f_uv, prev_uv),
                jnp.where(valid_i, f_desc, prev_desc),
                jnp.where(valid_i, f_mask, prev_mask),
                jnp.where(valid_i & fused, R_pose, R_st),
                jnp.where(valid_i & fused, t_pose, t_st),
                jnp.where(valid_i, scale, scale_st),
                jnp.where(valid_i, key_next, key_st),
                n_fused_st + (fused & valid_i).astype(jnp.int32),
            )
            outs = (ps.xyz, ps.rgb, ins_mask,
                    R_pose, t_pose, scale, jnp.sum(ok), n_inl, fused,
                    icp_frac, kf_xyz, kf_rgb, kf_mask)
            return new_carry, outs

        carry0 = (state.prev_uv, state.prev_desc, state.prev_mask,
                  state.R, state.t, state.scale, state.key, state.n_fused)
        valid = jnp.arange(B) < n_valid
        carry, outs = jax.lax.scan(
            body, carry0,
            (frames_u8, depth, valid, uv_all, desc_all, mask_all))
        (xyz_b, rgb_b, mask_b, R_b, t_b, scale_b, n_match_b, n_inl_b,
         fused_b, icp_frac_b, kf_xyz_b, kf_rgb_b, kf_mask_b) = outs
        # Feature diags come straight from the hoisted batched detection.
        uv_b, desc_b, fmask_b = uv_all, desc_all, mask_all

        cap_pts = xyz_b.shape[1]
        ps_all = PointSet(xyz=xyz_b.reshape(B * cap_pts, 3),
                          rgb=rgb_b.reshape(B * cap_pts, 3),
                          mask=mask_b.reshape(B * cap_pts))
        vm = offset_map_insert.__wrapped__(state.vm, ps_all)

        (prev_uv, prev_desc, prev_mask, R_c, t_c,
         scale_c, key_c, n_fused_c) = carry
        new_state = FusedStreamState(
            vm=vm, prev_uv=prev_uv, prev_desc=prev_desc, prev_mask=prev_mask,
            R=R_c, t=t_c, scale=scale_c, key=key_c, n_fused=n_fused_c)
        diag = FusedStreamBatchDiag(
            R=R_b, t=t_b, scale=scale_b, n_matches=n_match_b,
            n_inliers=n_inl_b, fused=fused_b, icp_frac=icp_frac_b,
            map_size=offset_map_size.__wrapped__(vm),
            depth=depth, uv=uv_b, desc=desc_b, fmask=fmask_b,
            kf_xyz=kf_xyz_b, kf_rgb=kf_rgb_b, kf_mask=kf_mask_b)
        return new_state, diag

    return step
