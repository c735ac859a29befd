"""Dense point-cloud generation and merging.

TPU-native equivalents of the reference's DensePointCloudGenerator /
DenseReconstructor (depth_enhanced_reconstruction.py:535-645,
depth_to_reconstruction.py:274-420): per-frame back-projection with pose and
scale, and Open3D-style merge = concat → voxel downsample → statistical
outlier removal. All stages consume/produce fixed-capacity PointSets on
device; host compaction happens only at the PLY boundary.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from txr.core.types import PointSet
from txr.ops.backproject import backproject_world
from txr.ops.voxel import voxel_downsample
from txr.ops.outlier import remove_statistical_outliers


def depth_to_pointcloud(
    depth: np.ndarray,
    bgr: np.ndarray,
    R: np.ndarray,
    t: np.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    scale: float = 1.0,
    subsample: int = 2,
    min_depth: float = 0.1,
    max_depth: float = 50.0,
) -> PointSet:
    """Back-project one frame into a world-frame PointSet.

    Mirrors DenseReconstructor.depth_to_pointcloud
    (depth_to_reconstruction.py:328-384): depth * scale, subsampled grid,
    validity range, camera→world via R^T (P - t). BGR→RGB happens in-trace.
    """
    rgb = jnp.asarray(bgr)[..., ::-1]
    return backproject_world(
        jnp.asarray(depth),
        rgb,
        jnp.asarray(R, dtype=jnp.float32),
        jnp.asarray(t, dtype=jnp.float32).reshape(3),
        fx, fy, cx, cy,
        min_depth, max_depth, scale, subsample,
    )


def merge_pointclouds(
    clouds: Sequence[Tuple[np.ndarray, np.ndarray]],
    voxel_size: float = 0.005,
    outlier_neighbors: int = 20,
    outlier_std_ratio: float = 2.0,
    remove_outliers: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Concat → voxel downsample → statistical outlier removal.

    Accepts host (xyz, rgb[0..1]) pairs, pads the concatenation to a shape
    bucket (power-of-two capacity) so repeated merges reuse compiles, and
    returns compacted host arrays — colors scaled to 0..255 like the
    reference's merge output (depth_to_reconstruction.py:386-420).
    """
    # Filter PAIRS together: a cloud with points but no colors would
    # otherwise desync the two concatenations (zero-fill its colors).
    xs, cs = [], []
    for x, c in clouds:
        x = np.asarray(x)
        if not len(x):
            continue
        xs.append(x)
        c = np.asarray(c)
        cs.append(c if len(c) == len(x) else np.zeros((len(x), 3), np.float32))
    if not xs:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
    xyz = np.concatenate(xs).astype(np.float32)
    rgb = np.concatenate(cs).astype(np.float32)
    if rgb.max() > 1.5:  # tolerate 0..255 inputs
        rgb = rgb / 255.0

    n = len(xyz)
    cap = 1 << max(10, int(np.ceil(np.log2(max(n, 1)))))
    ps = PointSet.from_numpy(xyz, rgb, capacity=cap)
    ps = voxel_downsample(ps, voxel_size)
    if remove_outliers:
        if cap > (1 << 17):
            # Exact O(N^2) kNN is hopeless at this scale — use the
            # grid-accelerated path (Open3D uses a KD-tree here).
            from txr.ops.outlier import remove_statistical_outliers_grid

            ps = remove_statistical_outliers_grid(
                ps, cell=2.5 * voxel_size, nb_neighbors=outlier_neighbors,
                std_ratio=outlier_std_ratio)
        else:
            ps = remove_statistical_outliers(ps, outlier_neighbors,
                                             outlier_std_ratio)
    out_xyz, out_rgb = ps.to_numpy()
    return out_xyz, out_rgb * 255.0


class DensePointCloudGenerator:
    """Reference-named facade (depth_enhanced_reconstruction.py:535-645):
    depth_to_pointcloud with (R, t) pose + merge (voxel downsample only —
    this script's merge has no statistical-outlier pass)."""

    def __init__(self, K: np.ndarray, min_depth: float = 0.1,
                 max_depth: float = 100.0):
        self.K = np.asarray(K, np.float64)
        self.min_depth = min_depth
        self.max_depth = max_depth

    def depth_to_pointcloud(self, depth, color, R=None, t=None,
                            scale: float = 1.0, subsample: int = 4):
        R = np.eye(3) if R is None else np.asarray(R)
        t = np.zeros(3) if t is None else np.asarray(t).reshape(3)
        ps = depth_to_pointcloud(
            depth, color, R, t,
            self.K[0, 0], self.K[1, 1], self.K[0, 2], self.K[1, 2],
            scale=scale, subsample=subsample,
            min_depth=self.min_depth, max_depth=self.max_depth)
        xyz, rgb = ps.to_numpy()
        return xyz, rgb * 255.0

    def merge_pointclouds(self, clouds, voxel_size: float = 0.005):
        return merge_pointclouds(clouds, voxel_size=voxel_size,
                                 remove_outliers=False)
