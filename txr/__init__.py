"""txr — TPU-native textureless-surface 3D reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
kamalnath26/textureless-3d-reconstruction:

- Monocular depth estimation (Depth Anything V1/V2/V3; ViT encoder + DPT head;
  relative and metric heads) as Flax modules with Pallas flash-attention.
- Intrinsics-based back-projection of depth maps to colored point clouds as
  batched XLA ops.
- Metric-scale anchoring of relative depth via sparse SfM (features, vmapped
  RANSAC epipolar geometry, batched DLT triangulation, masked-median scale).
- Incremental multi-view fusion: voxel-grid downsampling (sort + segment-mean),
  statistical outlier removal (grid-hash kNN), streaming fixed-capacity map.
- CLI surfaces compatible with the reference scripts: depth_processor.py,
  depth_to_reconstruction.py, depth_enhanced_reconstruction.py, and the
  README-promised reconstruction.py.

Package layout:
  core/      intrinsics, configs, typed point-set containers
  ops/       XLA/Pallas compute kernels (backproject, voxel, knn, resize, ...)
  geometry/  epipolar geometry, triangulation, pose, scale, features, ICP
  fusion/    point-cloud generation, merging, streaming map
  models/    Flax ViT + DPT depth models, checkpoint conversion
  io/        frame sources, PLY/PNG16 codecs, RTAB-Map DB replay
  parallel/  device mesh + sharding helpers
  pipelines/ orchestration per CLI
  cli/       argparse surfaces (kept flag-compatible with the reference)
"""

__version__ = "0.1.0"
