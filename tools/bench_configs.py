#!/usr/bin/env python3
"""Measure the non-headline BASELINE.json configs and write BENCH_CONFIGS.json.

bench.py keeps the one-JSON-line stdout contract for the headline number
(north-star e2e 1080p); this sidecar records the other four pipeline configs
(VERDICT r1 item 4). All numbers run on whatever device JAX selects (the
bench box exposes one v5e behind the axon relay, which adds a ~26 ms
host-sync floor per frame-at-a-time round trip — the frame-sequential
configs 2/4/5 pay it once per frame by construction, matching the
reference's own frame-at-a-time semantics).

Configs (BASELINE.json "configs"):
 1. fusion-only: RGB + precomputed depth -> fused PLY (depth_to_reconstruction)
 2. depth-only images mode, DA-V2-small, tunnel_set1_1_fps
 3. enhanced end-to-end (depth + hybrid features + SfM -> PLY)
 4. V3 metric (vkitti, max-depth 80) on a video source, 50% sampling, both
 5. streaming reconstruction.py folder replay (SLAM-like, tunnel_set1_2_fps)
"""

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")

import numpy as np

TUNNEL1 = "/root/reference/input_folder/exp_tunnel_set1_images_1_fps"
TUNNEL2 = "/root/reference/input_folder/exp_tunnel_set1_images_2_fps"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                   if "tools" in os.path.abspath(__file__) else ".",
                   "BENCH_CONFIGS.json")
OUT = "/root/repo/BENCH_CONFIGS.json"


def log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- split timer
# Device-vs-host attribution (VERDICT r2 #2/#9): each config runs its e2e
# timing untouched, then a second PROFILED pass wraps the config's jitted
# entry points with a per-dispatch terminal sync and records
# (wall - sync_floor) per program. Per CLAUDE.md TIMING, a synced dispatch
# measures device + ~10-15 ms dispatch-class cost — so device_ms here is an
# upper bound on pure device time, and host_ms = e2e_total - device_ms a
# lower bound on host work. The floor is measured fresh per run (it drifts).


def relay_probe():
    """Point-in-time relay health: sync floor + H2D/D2H bandwidth on a 4 MB
    array. Every config records this at its start so stage splits can be
    read against the relay state they were measured under (VERDICT r3 #3:
    a 0.3 MB/s relay makes staging-inclusive 'device' times meaningless)."""
    import jax
    import jax.numpy as jnp

    one = jnp.ones((8,), jnp.float32)
    float(jnp.sum(one))
    t0 = time.perf_counter()
    for _ in range(5):
        float(jnp.sum(one))
    floor = (time.perf_counter() - t0) / 5 * 1000.0
    buf = np.ones((1 << 20,), np.float32)  # 4 MB
    t0 = time.perf_counter()
    d = jax.device_put(buf)
    float(jnp.sum(d[:8]))
    h2d = 4.0 / max(time.perf_counter() - t0 - floor / 1000.0, 1e-6)
    t0 = time.perf_counter()
    np.asarray(d)
    d2h = 4.0 / max(time.perf_counter() - t0, 1e-6)
    return {"sync_floor_ms": round(floor, 1), "h2d_MBps": round(h2d, 1),
            "d2h_MBps": round(d2h, 1)}


class SplitTimer:
    def __init__(self):
        self.acc = {}
        self.host_acc = {}
        import jax
        import jax.numpy as jnp

        self._jax, self._jnp = jax, jnp
        one = jnp.ones((8,), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(5):
            float(jnp.sum(one))
        self.floor_ms = (time.perf_counter() - t0) / 5 * 1000.0

    def _sync(self, out):
        leaves = [x for x in self._jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")]
        if leaves:
            float(self._jnp.sum(leaves[0].astype(self._jnp.float32)))

    def wrap(self, fn, name):
        def w(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            self._sync(out)
            dt = (time.perf_counter() - t0) * 1000.0 - self.floor_ms
            ms, cnt = self.acc.get(name, (0.0, 0))
            self.acc[name] = (ms + max(dt, 0.0), cnt + 1)
            return out
        return w

    def wrap_host(self, fn, name):
        """Wall-clock a HOST stage (no device sync, no floor subtraction) —
        artifact writes, codecs, D2H pulls that happen inside the stage."""
        def w(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            dt = (time.perf_counter() - t0) * 1000.0
            ms, cnt = self.host_acc.get(name, (0.0, 0))
            self.host_acc[name] = (ms + dt, cnt + 1)
            return out
        return w

    host_acc: dict

    def split(self, total_s: float, frames: int):
        dev_ms = sum(ms for ms, _ in self.acc.values())
        per_frame = {k: round(ms / frames, 1) for k, (ms, _) in
                     sorted(self.acc.items(), key=lambda kv: -kv[1][0])}
        host_acc = getattr(self, "host_acc", {})
        host_stages = {k: round(ms / frames, 1) for k, (ms, _) in
                       sorted(host_acc.items(), key=lambda kv: -kv[1][0])}
        total_pf = total_s * 1000.0 / frames
        out = {
            "device_ms_per_frame": round(dev_ms / frames, 1),
            "host_ms_per_frame": round(max(total_pf - dev_ms / frames, 0.0), 1),
            "device_stages_ms_per_frame": per_frame,
            "sync_floor_ms": round(self.floor_ms, 1),
        }
        if host_stages:
            out["host_stages_ms_per_frame"] = host_stages
        return out


def synth_scene(root, n=12, w=640, h=480):
    """Two-layer textured scene with analytic depth (buddha_images stand-in —
    the README's dataset is not in the reference repo)."""
    import cv2

    rng = np.random.default_rng(3)
    rgb_dir = os.path.join(root, "rgb")
    dep_dir = os.path.join(root, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    fx = fy = 520.0
    cx, cy = w / 2.0, h / 2.0
    tex = cv2.resize(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8),
                     (768, 768), interpolation=cv2.INTER_NEAREST)
    for i in range(n):
        tx = 0.08 * i
        vv, uu = np.mgrid[0:h, 0:w].astype(np.float64)
        rx, ry = (uu - cx) / fx, (vv - cy) / fy
        depth = np.full((h, w), 6.0, np.float32)
        m = (np.abs(rx * 3.0 + tx) < 1.0) & (np.abs(ry * 3.0) < 1.0)
        depth[m] = 3.0
        z = depth
        ti = np.clip((rx * z + tx + 5) / 10 * 767, 0, 767).astype(int)
        tj = np.clip((ry * z + 5) / 10 * 767, 0, 767).astype(int)
        img = tex[tj, ti]
        cv2.imwrite(os.path.join(rgb_dir, f"f_{i:03d}.png"), img)
        np.save(os.path.join(dep_dir, f"f_{i:03d}_depth.npy"), depth / 6.0)
    return rgb_dir, dep_dir, (fx, fy, cx, cy)


def config1_fusion_only(results):
    from txr.core.config import ReconstructionConfig
    from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline

    relay = relay_probe()

    with tempfile.TemporaryDirectory() as td:
        rgb, dep, (fx, fy, cx, cy) = synth_scene(td, n=12)
        cfg = ReconstructionConfig(fx=fx, fy=fy, cx=cx, cy=cy,
                                   voxel_size=0.02, subsample_factor=2)
        pipe = DepthToReconstructionPipeline(cfg, verbose=False)
        n = pipe.load_data(rgb, dep)
        t0 = time.perf_counter()
        pipe.reconstruct()                      # cold: compiles included
        cold = time.perf_counter() - t0
        pipe2 = DepthToReconstructionPipeline(cfg, verbose=False)
        pipe2.load_data(rgb, dep)
        t0 = time.perf_counter()
        pts, cols, poses = pipe2.reconstruct()  # warm: compile cache hit
        dt = time.perf_counter() - t0

        # Profiled pass: wrap the three sequence programs + device SIFT.
        import txr.pipelines.fusion_pipeline as fp

        st = SplitTimer()
        saved = {k: getattr(fp, k) for k in
                 ("_pairs_batch", "_scales_batch", "_scales_init",
                  "_scales_views", "_dense_merge_batch_fn")}
        try:
            fp._pairs_batch = st.wrap(saved["_pairs_batch"], "pairs")
            fp._scales_batch = st.wrap(saved["_scales_batch"], "scales")
            fp._scales_init = st.wrap(saved["_scales_init"], "scales")
            fp._scales_views = st.wrap(saved["_scales_views"], "scales")
            fp._dense_merge_batch_fn = lambda *a, **k: st.wrap(
                saved["_dense_merge_batch_fn"](*a, **k), "dense_merge")
            # Profile the WARM pipe2 instance: detector jit programs are
            # per-instance closures, so a fresh pipeline here retraces +
            # cache-loads them inside the wrapped call and the "sift" stage
            # absorbs seconds of compile machinery (r4 recorded 536 ms/frame
            # vs the 37.8 ms standalone probe — almost all retrace).
            pipe2.detector.detect = st.wrap(pipe2.detector.detect, "sift")
            pipe2.detector.detect_batch = st.wrap(
                pipe2.detector.detect_batch, "sift")
            t0 = time.perf_counter()
            pipe2.reconstruct()
            prof_dt = time.perf_counter() - t0
        finally:
            for k, v in saved.items():
                setattr(fp, k, v)
    results["fusion_only_640x480"] = {
        "frames": n, "seconds": round(dt, 2), "fps": round(n / dt, 2),
        "relay": relay,
        "compile_overhead_s": round(cold - dt, 1),
        "points": 0 if pts is None else int(len(pts)),
        **st.split(dt, n)}
    log(f"config1 fusion-only: {n} frames in {dt:.1f}s = {n/dt:.2f} fps"
        f" (+{cold - dt:.0f}s compile; profiled pass {prof_dt:.1f}s)")


def _vits_model(version="v2", encoder="vits", **kw):
    from txr.models.depth_anything import DepthAnythingModel

    return DepthAnythingModel(version=version, encoder=encoder, seed=0, **kw)


def config2_depth_images(results):
    import cv2
    from txr.io.sources import FolderSource
    from txr.pipelines.depth_pipeline import DepthProcessor

    relay = relay_probe()

    model = _vits_model()
    with tempfile.TemporaryDirectory() as td:
        src = FolderSource(TUNNEL1)
        proc = DepthProcessor(model=model, source=src, output_dir=td,
                              mode="images")
        # warm the jit: one sequential-shape program + the fused batch
        # program (depth_pipeline auto-batches folder sources)
        img0 = cv2.imread(sorted(
            os.path.join(TUNNEL1, f) for f in os.listdir(TUNNEL1)
            if f.endswith(".jpg"))[0])
        model.infer(img0)
        import numpy as _np

        h0, w0 = img0.shape[:2]
        b0 = proc._resolve_batch()
        if b0 > 1:
            run = proc._fused_batch_fn(b0, h0, w0)
            d, _ = run(model.params, _np.zeros((b0, h0, w0, 3), _np.uint8))
            _np.asarray(d)
        t0 = time.perf_counter()
        n = proc.process(show_preview=False)
        dt = time.perf_counter() - t0
        n = n if isinstance(n, int) and n else 85
    results["depth_images_vits_tunnel1"] = {
        "frames": n, "seconds": round(dt, 2), "fps": round(n / dt, 2),
        "relay": relay}
    log(f"config2 depth images vits: {n} frames in {dt:.1f}s = {n/dt:.2f} fps")


def config3_enhanced_e2e(results):
    import cv2
    from txr.pipelines.enhanced_pipeline import DepthEnhancedReconstruction

    relay = relay_probe()

    model = _vits_model()
    with tempfile.TemporaryDirectory() as td:
        rgb, dep, (fx, fy, cx, cy) = synth_scene(td, n=6)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        rec = DepthEnhancedReconstruction(K, use_depth=True,
                                          use_hybrid_features=True,
                                          depth_model=model, verbose=False,
                                          subsample=4, voxel_size=0.02)
        n = rec.load_images(rgb)
        t0 = time.perf_counter()
        rec.reconstruct(output_dir=os.path.join(td, "out"))  # cold
        cold = time.perf_counter() - t0
        rec2 = DepthEnhancedReconstruction(K, use_depth=True,
                                           use_hybrid_features=True,
                                           depth_model=model, verbose=False,
                                           subsample=4, voxel_size=0.02)
        rec2.load_images(rgb)
        t0 = time.perf_counter()
        result = rec2.reconstruct(output_dir=os.path.join(td, "out2"))
        dt = time.perf_counter() - t0

        # Profiled pass: batched pair/scale programs, depth batch, hybrid
        # detect (device SIFT/ORB/LSD/Canny + host NCC), dense merge.
        import txr.pipelines.enhanced_pipeline as ep

        st = SplitTimer()
        saved = {k: getattr(ep, k) for k in
                 ("_enh_pairs_batch", "_enh_scales_batch",
                  "_enh_dense_merge_fn")}
        saved_infer = (model.infer_batch, model.infer)
        try:
            ep._enh_pairs_batch = st.wrap(saved["_enh_pairs_batch"], "pairs")
            ep._enh_scales_batch = st.wrap(saved["_enh_scales_batch"],
                                           "scales")
            ep._enh_dense_merge_fn = lambda *a, **k: st.wrap(
                saved["_enh_dense_merge_fn"](*a, **k), "dense_merge")
            model.infer_batch = st.wrap(model.infer_batch, "depth")
            model.infer = st.wrap(model.infer, "depth")
            # Profile the WARM rec2 instance (same rationale as config1:
            # per-instance detector jits retrace on a fresh instance and
            # the retrace lands in "hybrid_detect" — r4's 2065 ms/frame vs
            # the 117 ms standalone probe).
            rec2.detector.detect = st.wrap(rec2.detector.detect,
                                           "hybrid_detect")
            rec2.detector.detect_batch = st.wrap(rec2.detector.detect_batch,
                                                 "hybrid_detect")
            rec2.reconstruct(output_dir=os.path.join(td, "out3"))
        finally:
            for k, v in saved.items():
                setattr(ep, k, v)
            model.infer_batch, model.infer = saved_infer
    results["enhanced_e2e_vits_640x480"] = {
        "frames": n, "seconds": round(dt, 2), "fps": round(n / dt, 2),
        "relay": relay,
        "compile_overhead_s": round(cold - dt, 1),
        "points": 0 if result is None else int(len(result[0])),
        **st.split(dt, n)}
    log(f"config3 enhanced e2e: {n} frames in {dt:.1f}s = {n/dt:.2f} fps"
        f" (+{cold - dt:.0f}s compile)")


def config4_v3_metric_video(results):
    import cv2
    from txr.io.sources import VideoSource
    from txr.pipelines.depth_pipeline import DepthProcessor

    relay = relay_probe()

    model = _vits_model(version="v3", encoder="large", metric=True,
                        dataset="vkitti", max_depth=80.0)
    files = sorted(os.path.join(TUNNEL2, f) for f in os.listdir(TUNNEL2)
                   if f.endswith(".jpg"))[:40]
    with tempfile.TemporaryDirectory() as td:
        vid = os.path.join(td, "in.avi")
        img0 = cv2.imread(files[0])
        h, w = img0.shape[:2]
        vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
        for f in files:
            vw.write(cv2.imread(f))
        vw.release()
        src = VideoSource(vid, fps_mode="custom", fps_percent=50.0)
        proc = DepthProcessor(model=model, source=src, output_dir=td,
                              mode="both", pointcloud_downsample=4,
                              max_depth=80.0)
        model.infer(img0)  # warm the sequential-path compile
        t0 = time.perf_counter()
        proc.process(show_preview=False)  # cold: fused-batch compile included
        cold = time.perf_counter() - t0
        # Warm timed pass (fresh replay; the fused-batch program is cached
        # at module level now): r4 recorded the ViT-L fused-batch compile
        # as 1.3 s/frame of unattributed "host" time.
        src1 = VideoSource(vid, fps_mode="custom", fps_percent=50.0)
        proc1 = DepthProcessor(model=model, source=src1,
                               output_dir=os.path.join(td, "warm"),
                               mode="both", pointcloud_downsample=4,
                               max_depth=80.0)
        t0 = time.perf_counter()
        n = proc1.process(show_preview=False)
        dt = time.perf_counter() - t0
        n = n if isinstance(n, int) and n else len(files) // 2

        # Profiled pass over a fresh replay of the same video. The round-3
        # split recorded ONE opaque stage (fused_batch 3.3 s/frame,
        # VERDICT r3 #7); now the host side is staged too: the batched
        # drain's D2H pull (depths + points cross here), artifact writes
        # (npy + colormap PNG + mm PNG + per-frame PLY), and video decode
        # all land in host_stages_ms_per_frame.
        st = SplitTimer()
        src2 = VideoSource(vid, fps_mode="custom", fps_percent=50.0)
        src2_iter_next = type(src2).__next__
        proc2 = DepthProcessor(model=model, source=src2,
                               output_dir=os.path.join(td, "prof"),
                               mode="both", pointcloud_downsample=4,
                               max_depth=80.0)
        orig = proc2._fused_batch_fn

        def staged(*a):
            run = orig(*a)

            def timed_run(params, images):
                t0 = time.perf_counter()
                out = run(params, images)
                st._sync(out)
                dt_ = (time.perf_counter() - t0) * 1000.0 - st.floor_ms
                ms, c = st.acc.get("fused_batch", (0.0, 0))
                st.acc["fused_batch"] = (ms + max(dt_, 0.0), c + 1)
                # D2H drain measured as its own host stage (the batched
                # path pulls depths + xyz/rgb/mask right after the program)
                t0 = time.perf_counter()
                pulled = jax.tree_util.tree_map(np.asarray, out)
                ms, c = st.host_acc.get("d2h_drain", (0.0, 0))
                st.host_acc["d2h_drain"] = (
                    ms + (time.perf_counter() - t0) * 1000.0, c + 1)
                return pulled

            return timed_run

        import jax

        proc2._fused_batch_fn = staged
        proc2._save_depth = st.wrap_host(proc2._save_depth, "save_depth_pngs")
        proc2._save_pointcloud = st.wrap_host(proc2._save_pointcloud,
                                              "save_ply")
        model.infer = st.wrap(model.infer, "infer_seq")
        n2 = proc2.process(show_preview=False)
        model.infer = model.__class__.infer.__get__(model)
    results["v3_metric_vkitti_video_50pct"] = {
        "frames": n, "seconds": round(dt, 2), "fps": round(n / dt, 2),
        "relay": relay,
        "compile_overhead_s": round(max(cold - dt, 0.0), 1),
        **st.split(dt, max(n2 if isinstance(n2, int) else n, 1))}
    log(f"config4 v3 metric video: {n} frames in {dt:.1f}s = {n/dt:.2f} fps")


def config5_streaming(results):
    from txr.core.config import StreamingConfig
    from txr.fusion.offset_map import offset_map_size
    from txr.io.sources import FolderSource
    from txr.pipelines.streaming import StreamingReconstructor

    relay = relay_probe()
    model = _vits_model()
    src = FolderSource(TUNNEL2)
    cfg = StreamingConfig(voxel_size=0.02, subsample_factor=2,
                          max_depth=10.0, max_map_points=1 << 20)
    warm = StreamingReconstructor(src.intrinsics, depth_model=model,
                                  config=cfg, verbose=False)
    warm.run(FolderSource(TUNNEL2), max_frames=4)   # compile outside timing
    rec = StreamingReconstructor(src.intrinsics, depth_model=model,
                                 config=cfg, verbose=False)
    t0 = time.perf_counter()
    n = rec.run(src, max_frames=40)
    dt = time.perf_counter() - t0

    # Profiled pass: per-dispatch-synced fused step over the same frames.
    st = SplitTimer()
    rec2 = StreamingReconstructor(src.intrinsics, depth_model=model,
                                  config=cfg, verbose=False)
    orig = rec2._fused_step_for

    def wrapped(h, w):
        return st.wrap(orig(h, w), "fused_step")

    rec2._fused_step_for = wrapped
    orig_b = rec2._fused_batch_step_for

    def wrapped_b(h, w, b):
        return st.wrap(orig_b(h, w, b), "fused_batch_step")

    rec2._fused_batch_step_for = wrapped_b
    n2 = rec2.run(FolderSource(TUNNEL2), max_frames=40)
    results["streaming_folder_vits_tunnel2"] = {
        "frames": n, "seconds": round(dt, 2), "fps": round(n / dt, 2),
        "relay": relay,
        "map_voxels": int(offset_map_size(rec.map)),
        "loops_closed": rec.loops_closed,
        **st.split(dt, max(n2, 1))}
    log(f"config5 streaming: {n} frames in {dt:.1f}s = {n/dt:.2f} fps")


def config6_streaming_pingpong(results):
    """Loop-closure demonstration on real frames: replay tunnel frames
    forward then back to the start (the reference camera node's video
    ping-pong playback, simple_camera_node.py:67-81), so the trajectory
    physically returns to its first view; measure end-to-start camera-center
    drift with loop closure on vs off. Ground truth: the first and last
    frames are the SAME image, so true drift is zero."""
    import cv2
    from txr.core.config import StreamingConfig
    from txr.io.sources import FolderSource
    from txr.pipelines.streaming import StreamingReconstructor

    model = _vits_model()
    folder = FolderSource(TUNNEL2)
    files = folder.files[:24]
    seq = files + files[-2::-1]          # ends back at files[0]

    class ListSource:
        def __init__(self, paths, intr):
            self.paths, self.intrinsics, self.i = paths, intr, 0

        def __iter__(self):
            return self

        def __next__(self):
            if self.i >= len(self.paths):
                raise StopIteration
            p = self.paths[self.i]
            self.i += 1
            return cv2.imread(p), float(self.i), os.path.basename(p)

    def center(R, t):
        return -np.asarray(R, np.float64).T @ np.asarray(
            t, np.float64).reshape(3)

    def drift(rec):
        cs = [center(R, t) for R, t in rec.poses]
        path = float(sum(np.linalg.norm(b - a) for a, b in zip(cs, cs[1:])))
        return float(np.linalg.norm(cs[-1] - cs[0])), path

    out = {"relay": relay_probe()}
    for name, lc in (("closure_on", True), ("closure_off", False)):
        cfg = StreamingConfig(voxel_size=0.02, subsample_factor=2,
                              max_depth=10.0, max_map_points=1 << 20,
                              loop_closure=lc)
        # Warm pass first: a full throwaway session populates the in-process
        # and persistent compile caches (the closure path compiles its
        # verify + rebuild-shape insert programs lazily at the FIRST
        # closure, which the old single-pass measurement charged to
        # closure_on's fps — r4 recorded 242 s of "loop_verify" that was
        # mostly remote compile). The timed pass below then measures
        # steady-state; cold-vs-warm is reported as compile_overhead_s.
        t0 = time.perf_counter()
        rec_w = StreamingReconstructor(folder.intrinsics, depth_model=model,
                                       config=cfg, verbose=False)
        rec_w.run(ListSource(seq, folder.intrinsics))
        cold_s = time.perf_counter() - t0
        rec = StreamingReconstructor(folder.intrinsics, depth_model=model,
                                     config=cfg, verbose=False)
        # Closure-stage attribution (VERDICT r3 #4: nothing recorded where
        # the closure-on slowdown goes): wall-wrap the closure machinery.
        stages = {}

        def host_wrap(fn, sname):
            def w(*a, **k):
                t0_ = time.perf_counter()
                r = fn(*a, **k)
                stages[sname] = stages.get(sname, 0.0) + (
                    time.perf_counter() - t0_)
                return r
            return w

        if lc:
            rec._try_loop_edge = host_wrap(rec._try_loop_edge, "loop_verify")
            rec._rebuild_map = host_wrap(rec._rebuild_map, "map_rebuild")
            rec._camera_cloud = host_wrap(rec._camera_cloud, "kf_cloud")
            rec._close_loop = host_wrap(rec._close_loop,
                                        "close_loop_total")
            import txr.pipelines.streaming as sm
            saved_opt = sm.optimize_pose_graph
            sm.optimize_pose_graph = host_wrap(saved_opt, "pose_graph_solve")
        t0 = time.perf_counter()
        n = rec.run(ListSource(seq, folder.intrinsics))
        dt = time.perf_counter() - t0
        if lc:
            sm.optimize_pose_graph = saved_opt
        d, path = drift(rec)
        entry = {"frames": n, "fps": round(n / dt, 2),
                 "end_drift": round(d, 4),
                 "drift_per_path": round(d / max(path, 1e-9), 4),
                 "loops_closed": rec.loops_closed,
                 "compile_overhead_s": round(max(cold_s - dt, 0.0), 1)}
        if lc:
            # close_loop_total double-counts its inner stages; report the
            # solve/rebuild split and the residual separately.
            inner = (stages.get("pose_graph_solve", 0.0)
                     + stages.get("map_rebuild", 0.0))
            entry["closure_stages_s"] = {
                k: round(v, 2) for k, v in sorted(
                    stages.items(), key=lambda kv: -kv[1])}
            entry["closure_stages_s"]["close_loop_other"] = round(
                max(stages.get("close_loop_total", 0.0) - inner, 0.0), 2)
        out[name] = entry
        log(f"config6 pingpong {name}: {n} frames, drift {d:.4f} "
            f"(path {path:.2f}), {rec.loops_closed} loops; stages "
            f"{ {k: round(v,1) for k,v in stages.items()} }")
    results["streaming_pingpong_loop_tunnel2"] = out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="",
                    help="comma list of config numbers to run (e.g. 1,3); "
                         "others keep their existing BENCH_CONFIGS.json "
                         "entries")
    args = ap.parse_args()
    note = ("frame-sequential configs ride the axon relay, whose"
            " sync floor DRIFTS round to round (26 ms r1, ~40 r2,"
            " 23-127 ms within one r3 run — see each config's"
            " sync_floor_ms); compare device_ms_per_frame across"
            " rounds, not raw fps. The batched headline bench"
            " (bench.py) is the chip-throughput number")
    results = {"note": note}
    configs = {1: config1_fusion_only, 2: config2_depth_images,
               3: config3_enhanced_e2e, 4: config4_v3_metric_video,
               5: config5_streaming, 6: config6_streaming_pingpong}
    wanted = ([int(x) for x in args.only.split(",") if x]
              if args.only else sorted(configs))
    if args.only:
        try:  # partial rerun: keep the other configs' entries
            with open(OUT) as f:
                results = json.load(f)
            results["note"] = note
        except (OSError, ValueError):
            pass
    for i in wanted:
        fn = configs[i]
        try:
            fn(results)
        except Exception as e:  # record, keep going
            results[fn.__name__] = {"error": f"{type(e).__name__}: {e}"}
            log(f"{fn.__name__} FAILED: {e}")
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {OUT}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
