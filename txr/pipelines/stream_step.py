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
                          edge_threshold=edge_threshold)

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
