"""Stage-level wall-clock profile of DepthToReconstructionPipeline on TPU.

BENCH_CONFIGS records config1 (fusion-only, 12 synthetic 640x480 frames) at
~0.43 fps warm. This wraps the pipeline's device entry points with timers to
see where the 2.3 s/frame goes (dispatch syncs? H2D re-uploads? detect?).
Run twice — first populates the compile cache, second is the honest profile.
"""

import os
import sys
import tempfile
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from bench_configs import synth_scene  # noqa: E402

import txr.pipelines.fusion_pipeline as fp  # noqa: E402

TIMES = defaultdict(float)
COUNTS = defaultdict(int)


def timed(name, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        r = fn(*a, **kw)
        TIMES[name] += time.perf_counter() - t0
        COUNTS[name] += 1
        return r
    return wrap


def main():
    from txr.core.config import ReconstructionConfig

    fp.pair_step = timed("pair_step", fp.pair_step)
    fp.estimate_scale = timed("estimate_scale", fp.estimate_scale)
    fp.depth_to_pointcloud = timed("depth_to_pointcloud", fp.depth_to_pointcloud)
    fp.merge_pointclouds = timed("merge_pointclouds", fp.merge_pointclouds)
    fp.match_features = timed("match_features", fp.match_features)

    with tempfile.TemporaryDirectory() as td:
        rgb, dep, (fx, fy, cx, cy) = synth_scene(td, n=12)
        cfg = ReconstructionConfig(fx=fx, fy=fy, cx=cx, cy=cy,
                                   voxel_size=0.02, subsample_factor=2)
        for run in ("cold", "warm"):
            TIMES.clear()
            COUNTS.clear()
            pipe = fp.DepthToReconstructionPipeline(cfg, verbose=False)
            pipe.load_data(rgb, dep)
            pipe.detector.detect = timed("detect", pipe.detector.detect)
            t0 = time.perf_counter()
            pts, _, _ = pipe.reconstruct()
            total = time.perf_counter() - t0
            print(f"--- {run}: total {total:.2f}s, "
                  f"points {0 if pts is None else len(pts)}")
            acc = 0.0
            for k in sorted(TIMES, key=TIMES.get, reverse=True):
                print(f"  {k:22s} {TIMES[k]:7.2f}s  x{COUNTS[k]}")
                acc += TIMES[k]
            print(f"  {'(untimed rest)':22s} {total - acc:7.2f}s")


if __name__ == "__main__":
    main()
