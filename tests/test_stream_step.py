"""Fused one-program-per-frame streaming step (txr/pipelines/stream_step.py).

Parity contract: StreamingReconstructor.run with fused=True must reproduce
the stepwise per-op path (same kernels, same key stream, same skip rules) up
to XLA fusion-order float drift. The stepwise loop is the oracle here; its
own geometric correctness is covered by tests/test_streaming.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from txr.core.config import StreamingConfig
from txr.core.intrinsics import CameraIntrinsics
from txr.fusion.offset_map import offset_map_size
from txr.pipelines.stream_step import _bgr_to_gray_u8
from txr.pipelines.streaming import StreamingReconstructor

W, H = 160, 128


class ListSource:
    def __init__(self, frames):
        self.frames = frames

    def __iter__(self):
        for i, f in enumerate(self.frames):
            yield f, float(i), f"f{i}"


@pytest.fixture(scope="module")
def tiny_model():
    from txr.models.depth_anything import DepthAnythingModel

    # input_size 70 → 70x84 model grid: small enough for CPU compiles of the
    # full fused program (DA forward + SIFT + RANSAC + ICP + insert).
    return DepthAnythingModel(version="v2", encoder="vits", input_size=70,
                              seed=0)


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(0)
    base = np.full((H, W, 3), 90, np.uint8)
    for _ in range(60):
        c = rng.integers(0, 255, 3).tolist()
        p = (int(rng.integers(5, W - 12)), int(rng.integers(5, H - 12)))
        cv2.rectangle(base, p, (p[0] + 7, p[1] + 6), c, -1)
    out = []
    for dx in (0, 3, 6, 9, 12):
        M = np.float32([[1, 0, dx], [0, 1, 0]])
        out.append(cv2.warpAffine(base, M, (W, H)))
    return out


def _run(model, frames, fused, **cfg_kw):
    intr = CameraIntrinsics(130.0, 130.0, W / 2, H / 2, W, H)
    cfg = StreamingConfig(voxel_size=0.02, max_map_points=1 << 14,
                          subsample_factor=2, max_depth=1e6, min_depth=1e-6,
                          loop_closure=False, **cfg_kw)
    rec = StreamingReconstructor(intr, depth_model=model, config=cfg,
                                 use_icp=True, metric_depth=True,
                                 verbose=False, fused=fused,
                                 feature_capacity=1024, icp_sample=512)
    rec.detector.backend = "device"  # stepwise oracle on the same kernels
    n = rec.run(ListSource(frames))
    return rec, n


def test_gray_matches_cv2(frames):
    """The in-program BGR→gray must be bit-exact with cv2.cvtColor so the
    SIFT input (and therefore the whole feature chain) matches stepwise."""
    for f in frames[:2]:
        ours = np.asarray(_bgr_to_gray_u8(jnp.asarray(f)))
        ref = cv2.cvtColor(f, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(ours, ref)


def test_fused_matches_stepwise(tiny_model, frames):
    # stream_batch=1 pins the per-frame fused step: its parity with the
    # stepwise oracle is exact (same key stream, same per-frame ICP map).
    rec_f, n_f = _run(tiny_model, frames, fused=True, stream_batch=1)
    rec_s, n_s = _run(tiny_model, frames, fused=False)
    assert n_f == n_s == len(frames)
    assert rec_f.frames_skipped == rec_s.frames_skipped == 0
    assert len(rec_f.poses) == len(rec_s.poses)
    for (Rf, tf), (Rs, ts) in zip(rec_f.poses, rec_s.poses):
        np.testing.assert_allclose(Rf, Rs, atol=5e-3)
        np.testing.assert_allclose(tf, ts, atol=2e-2)
    nf = int(offset_map_size(rec_f.map))
    ns = int(offset_map_size(rec_s.map))
    assert nf > 100
    assert abs(nf - ns) <= max(2, ns // 20)


def test_batched_matches_per_frame(tiny_model, frames):
    """The stream_batch path (one program per B frames, lax.scan chain,
    single batched insert) must track the per-frame fused step. Deltas are
    bounded, not exact: batched ICP registers against the batch-START map
    (stream_step.py build_fused_stream_batch_step docstring), so poses can
    drift within a batch; the key stream and skip rules are identical.
    B=3 over 5 frames also exercises the padded tail (n_valid=2 < B)."""
    rec_b, n_b = _run(tiny_model, frames, fused=True, stream_batch=3)
    rec_f, n_f = _run(tiny_model, frames, fused=True, stream_batch=1)
    assert n_b == n_f == len(frames)
    assert rec_b.frames_skipped == rec_f.frames_skipped == 0
    assert len(rec_b.poses) == len(rec_f.poses)
    for (Rb, tb), (Rf, tf) in zip(rec_b.poses, rec_f.poses):
        np.testing.assert_allclose(Rb, Rf, atol=5e-2)
        np.testing.assert_allclose(tb, tf, atol=8e-2)
    nb = int(offset_map_size(rec_b.map))
    nf = int(offset_map_size(rec_f.map))
    assert nb > 100
    assert abs(nb - nf) <= max(5, nf // 10)


def test_fused_loop_closure_smoke(tiny_model, frames):
    """Keyframe bookkeeping runs on chunk-final frames; loop edges (if any)
    resync the device state without crashing or corrupting poses."""
    intr = CameraIntrinsics(130.0, 130.0, W / 2, H / 2, W, H)
    cfg = StreamingConfig(voxel_size=0.02, max_map_points=1 << 14,
                          subsample_factor=2, max_depth=1e6, min_depth=1e-6,
                          loop_closure=True, keyframe_every=2,
                          loop_min_separation=1, loop_stride=1,
                          loop_inliers=15)
    rec = StreamingReconstructor(intr, depth_model=tiny_model, config=cfg,
                                 use_icp=True, metric_depth=True,
                                 verbose=False, fused=True,
                                 feature_capacity=1024, icp_sample=512)
    # Out-and-back trajectory: the return frames revisit early content.
    loop_frames = frames + frames[-2::-1]
    n = rec.run(ListSource(loop_frames))
    assert n == len(loop_frames)
    assert len(rec.keyframes) >= 3
    for R, t in rec.poses:
        assert np.isfinite(R).all() and np.isfinite(t).all()
    assert int(offset_map_size(rec.map)) > 100


def test_fused_skip_without_icp(tiny_model):
    """Featureless frames must be skipped (not fused) when ICP rescue is
    off, mirroring streaming.py:295-302."""
    rng = np.random.default_rng(1)
    base = np.full((H, W, 3), 90, np.uint8)
    for _ in range(60):
        c = rng.integers(0, 255, 3).tolist()
        p = (int(rng.integers(5, W - 12)), int(rng.integers(5, H - 12)))
        cv2.rectangle(base, p, (p[0] + 7, p[1] + 6), c, -1)
    flat = np.full((H, W, 3), 120, np.uint8)  # textureless → no matches
    intr = CameraIntrinsics(130.0, 130.0, W / 2, H / 2, W, H)
    cfg = StreamingConfig(voxel_size=0.02, max_map_points=1 << 14,
                          subsample_factor=2, max_depth=1e6, min_depth=1e-6,
                          loop_closure=False)
    rec = StreamingReconstructor(intr, depth_model=tiny_model, config=cfg,
                                 use_icp=False, metric_depth=True,
                                 verbose=False, fused=True,
                                 feature_capacity=1024)
    n = rec.run(ListSource([base, flat, base]))
    assert rec.frames_skipped >= 1
    assert n == rec.frames_processed < 3


def test_mixed_fused_then_stepwise_then_fused(tiny_model, frames):
    """Interleaving the per-frame API with fused runs must not leave the
    fused state aliasing donated map buffers (review r2): process_frame
    donates self.map (= state.vm after a fused run); the resync keeps the
    continuation alive and the map monotone."""
    intr = CameraIntrinsics(130.0, 130.0, W / 2, H / 2, W, H)
    cfg = StreamingConfig(voxel_size=0.02, max_map_points=1 << 14,
                          subsample_factor=2, max_depth=1e6, min_depth=1e-6,
                          loop_closure=False)
    rec = StreamingReconstructor(intr, depth_model=tiny_model, config=cfg,
                                 use_icp=True, metric_depth=True,
                                 verbose=False, fused=True,
                                 feature_capacity=1024, icp_sample=512)
    rec.detector.backend = "device"
    rec.run(ListSource(frames[:2]))
    size_a = int(offset_map_size(rec.map))
    assert rec._fused_state is not None
    rec.process_frame(frames[2], 2.0, "f2")      # stepwise insert (donates)
    assert rec._fused_state.vm is rec.map         # alias resynced
    n = rec.run(ListSource(frames[3:]))           # fused continuation
    assert n  # no deleted-buffer crash
    assert rec.frames_processed == len(frames)
    assert len(rec.poses) == len(frames)
    assert int(offset_map_size(rec.map)) >= size_a
