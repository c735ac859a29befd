"""Reproduce VERDICT r3 weak #1: grid outlier pass zeroes the golden scene.

Monkeypatches the outlier pass to identity to capture the pre-outlier cloud,
then probes auto_cell / grid_knn_mean_distance stats on it.
"""
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from test_golden import build_scene, FX, FY, CX, CY


def run(capture_pre=True):
    from txr.core.config import ReconstructionConfig
    from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline
    import txr.pipelines.fusion_pipeline as fp

    if capture_pre:
        fp._outliers_grid_raw = lambda ps, cell, nb_neighbors, std_ratio: ps
        fp._DENSE_MERGE_CACHE.clear()

    td = tempfile.mkdtemp()
    rgb_dir, depth_dir = build_scene(td)
    cfg = ReconstructionConfig(fx=FX, fy=FY, cx=CX, cy=CY,
                               voxel_size=0.05, subsample_factor=4)
    pipe = DepthToReconstructionPipeline(cfg, feature_capacity=4096,
                                         verbose=False, feature_backend="cv2")
    pipe.load_data(rgb_dir, depth_dir)
    points, colors, poses = pipe.reconstruct()
    return points, colors


def main():
    points, colors = run(capture_pre=True)
    print("pre-outlier points:", len(points))
    np.save("/tmp/pre_outlier_xyz.npy", points)

    from txr.core.types import PointSet
    from txr.ops.grid_knn import auto_cell, grid_knn_mean_distance

    xyz = points.astype(np.float32)
    n = len(xyz)
    cap = 1 << max(10, int(np.ceil(np.log2(max(n, 1)))))
    ps = PointSet.from_numpy(xyz, capacity=cap)
    lo, hi = xyz.min(0), xyz.max(0)
    print("bbox lo", lo, "hi", hi, "ext", hi - lo)
    # nearest-neighbor spacing oracle
    from scipy.spatial import cKDTree  # may not exist; fallback below
    cell = auto_cell(ps.xyz, ps.mask, k=20, per_cell=8)
    print("auto_cell:", float(cell))
    md = grid_knn_mean_distance(ps.xyz, ps.mask, cell, k=20, per_cell=8,
                                chunk=65536)
    md = np.asarray(md)[: cap][np.asarray(ps.mask)]
    sent = md > 1.0e6
    print(f"valid={n} sentinels={sent.sum()} frac={sent.mean():.3f}")
    good = md[~sent]
    if len(good):
        print("mean_d stats: min %.4f med %.4f max %.4f" % (
            good.min(), np.median(good), good.max()))
    # oracle: exact kNN mean distance
    d2 = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, 1e30)
    nn = np.sqrt(np.sort(d2, axis=1)[:, :20]).mean(1)
    print("exact knn20 mean-dist: min %.4f med %.4f max %.4f" % (
        nn.min(), np.median(nn), nn.max()))
    mu, sd = nn.mean(), nn.std()
    print("exact keep-count at mu+2s:", int((nn <= mu + 2 * sd).sum()))


if __name__ == "__main__":
    main()
