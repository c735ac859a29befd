#!/usr/bin/env python3
"""Depth to 3D Reconstruction — fuse RGB frames + precomputed depth maps into
a single PLY point cloud, anchored to metric scale by sparse SfM.

TPU-native rebuild of the reference CLI (kamalnath26/textureless-3d-
reconstruction depth_to_reconstruction.py:770-814) with an identical argparse
surface. The engine underneath runs vmapped-RANSAC epipolar geometry, batched
DLT triangulation, and XLA voxel/outlier fusion on TPU instead of
OpenCV/Open3D loops.

Usage:
    python depth_to_reconstruction.py --rgb-folder images/ --depth-folder depth/ \
        --output ./output/reconstruction.ply
"""

import argparse

from txr.core.config import ReconstructionConfig
from txr.pipelines.fusion_pipeline import DepthToReconstructionPipeline
from txr.utils.visualize import visualize_reconstruction


def main():
    parser = argparse.ArgumentParser(description='Depth to 3D Reconstruction')
    parser.add_argument('--rgb-folder', type=str, required=True,
                        help='Folder with RGB images')
    parser.add_argument('--depth-folder', type=str, required=True,
                        help='Folder with depth images')
    parser.add_argument('--output', type=str, default='./output/reconstruction.ply',
                        help='Output PLY file path')
    parser.add_argument('--fx', type=float, default=1719.0)
    parser.add_argument('--fy', type=float, default=1719.0)
    parser.add_argument('--cx', type=float, default=540.0)
    parser.add_argument('--cy', type=float, default=960.0)
    parser.add_argument('--voxel-size', type=float, default=0.005)
    parser.add_argument('--subsample', type=int, default=2)
    parser.add_argument('--no-vis', action='store_true')
    parser.add_argument('--device-features', action='store_true',
                        help='Run SIFT detection as XLA ops on the accelerator '
                             'instead of host OpenCV (extends the reference)')

    args = parser.parse_args()

    config = ReconstructionConfig(
        fx=args.fx, fy=args.fy,
        cx=args.cx, cy=args.cy,
        voxel_size=args.voxel_size,
        subsample_factor=args.subsample,
    )

    pipeline = DepthToReconstructionPipeline(
        config,
        feature_backend="device" if args.device_features else "auto")

    num_loaded = pipeline.load_data(args.rgb_folder, args.depth_folder)
    if num_loaded < 2:
        print("Failed to load sufficient data")
        return

    points, colors, poses = pipeline.reconstruct()

    if points is not None and len(points) > 0:
        pipeline.save_reconstruction(points, colors, args.output)
        if not args.no_vis:
            visualize_reconstruction(points, colors, poses,
                                     "Depth-Enhanced Reconstruction")
    else:
        print("Reconstruction failed")


if __name__ == "__main__":
    main()
