#!/usr/bin/env python3
"""Extract frames from a video into numbered JPEGs.

Parity with the reference utility (kamalnath26/textureless-3d-reconstruction
extract_frames.py:5-61): writes `frame_%04d.jpg`, optionally subsampling to a
target fps via interval = video_fps / target_fps, keeping frames where
frame_count % interval < 1.

Usage:
    python extract_frames.py video.mp4 ./frames --fps 2
"""

import argparse
import os

import cv2


def extract_frames(video_path: str, output_dir: str, fps: float = None) -> int:
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"Cannot open video: {video_path}")
    os.makedirs(output_dir, exist_ok=True)
    video_fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    interval = (video_fps / fps) if fps and fps > 0 else 1.0

    frame_count = 0
    saved = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if frame_count % interval < 1:
            cv2.imwrite(os.path.join(output_dir, f"frame_{saved:04d}.jpg"), frame)
            saved += 1
        frame_count += 1
    cap.release()
    print(f"Extracted {saved} frames from {frame_count} "
          f"(video {video_fps:.1f} fps -> target {fps or video_fps})")
    return saved


def main():
    parser = argparse.ArgumentParser(description="Extract frames from video")
    parser.add_argument("video", help="Input video file")
    parser.add_argument("output", help="Output folder")
    parser.add_argument("--fps", type=float, default=None,
                        help="Target frames per second (default: all frames)")
    args = parser.parse_args()
    extract_frames(args.video, args.output, args.fps)


if __name__ == "__main__":
    main()
