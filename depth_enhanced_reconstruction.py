#!/usr/bin/env python3
"""Depth-Enhanced 3D Reconstruction — end-to-end monocular reconstruction for
textureless surfaces: neural depth + hybrid features (SIFT/ORB/lines/edges) +
from-scratch SfM → fused PLY.

TPU-native rebuild of the reference CLI (kamalnath26/textureless-3d-
reconstruction depth_enhanced_reconstruction.py:1418-1468) with an identical
argparse surface. Depth runs as a batched Flax forward on TPU; the 2000-iter
RANSAC loop becomes one vmapped hypothesis batch; triangulation is batched
DLT; fusion is an XLA voxel merge.

Usage:
    python depth_enhanced_reconstruction.py --input ./input_folder/buddha_images
"""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Depth-Enhanced 3D Reconstruction')
    parser.add_argument('--input', type=str, default='./input_folder/buddha_images',
                        help='Input folder with images')
    parser.add_argument('--output', type=str, default='./output',
                        help='Output directory')
    parser.add_argument('--fx', type=float, default=1719.0, help='Focal length X')
    parser.add_argument('--fy', type=float, default=1719.0, help='Focal length Y')
    parser.add_argument('--cx', type=float, default=540.0, help='Principal point X')
    parser.add_argument('--cy', type=float, default=960.0, help='Principal point Y')
    parser.add_argument('--no-depth', action='store_true', help='Disable depth estimation')
    parser.add_argument('--no-hybrid', action='store_true', help='Disable hybrid features')
    parser.add_argument('--ba', action='store_true',
                        help='Refine poses with bundle adjustment (extends the '
                             'reference, which declares BA but never runs it)')
    parser.add_argument('--int8', action='store_true',
                        help='Encoder denses as W8A8 int8 MXU matmuls '
                             '(TPU-native extension; ~2x encoder throughput)')
    parser.add_argument('--device-features', action='store_true',
                        help='Run SIFT/ORB/LSD/Canny as XLA ops on the '
                             'accelerator instead of host OpenCV (extends the '
                             'reference; same detectors, TPU-native kernels)')

    args = parser.parse_args()

    K = np.array([
        [args.fx, 0, args.cx],
        [0, args.fy, args.cy],
        [0, 0, 1]
    ], dtype=np.float64)

    from txr.pipelines.enhanced_pipeline import DepthEnhancedReconstruction
    from txr.utils.visualize import visualize_reconstruction

    reconstructor = DepthEnhancedReconstruction(
        K=K,
        use_depth=not args.no_depth,
        quant="int8" if args.int8 else "none",
        use_hybrid_features=not args.no_hybrid,
        use_ba=args.ba,
        feature_backend="device" if args.device_features else "auto",
    )

    num_images = reconstructor.load_images(args.input)
    if num_images < 2:
        print("Need at least 2 images for reconstruction")
        raise SystemExit(1)

    result = reconstructor.reconstruct(output_dir=args.output)

    if result is not None:
        points, colors, poses = result
        visualize_reconstruction(points, colors, poses,
                                 title="Depth-Enhanced 3D Reconstruction")
    else:
        print("Reconstruction failed")


if __name__ == "__main__":
    main()
