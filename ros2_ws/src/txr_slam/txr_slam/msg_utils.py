"""ROS2 message packing helpers (no cv_bridge dependency).

sensor_msgs/Image <-> numpy conversion and CameraInfo construction used by
every node in this package. Mirrors the topic contract of the reference's
monocular_slam package (SURVEY §1 L6): bgr8 images, 32FC1 depth, plumb_bob
camera info with the fx = 0.8*width default heuristic.
"""

from __future__ import annotations

import numpy as np
from sensor_msgs.msg import CameraInfo, Image


def image_to_msg(img: np.ndarray, encoding: str, stamp, frame_id: str) -> Image:
    msg = Image()
    msg.header.stamp = stamp
    msg.header.frame_id = frame_id
    msg.height, msg.width = img.shape[:2]
    msg.encoding = encoding
    msg.is_bigendian = False
    msg.step = msg.width * (img.itemsize * (img.shape[2] if img.ndim == 3 else 1))
    msg.data = np.ascontiguousarray(img).tobytes()
    return msg


def msg_to_image(msg: Image) -> np.ndarray:
    if msg.encoding in ("bgr8", "rgb8"):
        return np.frombuffer(msg.data, np.uint8).reshape(msg.height, msg.width, 3)
    if msg.encoding == "32FC1":
        return np.frombuffer(msg.data, np.float32).reshape(msg.height, msg.width)
    if msg.encoding in ("mono8", "8UC1"):
        return np.frombuffer(msg.data, np.uint8).reshape(msg.height, msg.width)
    if msg.encoding == "16UC1":
        return np.frombuffer(msg.data, np.uint16).reshape(msg.height, msg.width)
    raise ValueError(f"Unsupported encoding: {msg.encoding}")


def make_camera_info(width: int, height: int, header=None,
                     fx=None, fy=None, cx=None, cy=None) -> CameraInfo:
    """plumb_bob CameraInfo; defaults to the fx = 0.8*width heuristic."""
    info = CameraInfo()
    if header is not None:
        info.header = header
    info.width = int(width)
    info.height = int(height)
    info.distortion_model = "plumb_bob"
    info.d = [0.0] * 5
    fx = float(fx) if fx is not None else width * 0.8
    fy = float(fy) if fy is not None else fx
    cx = float(cx) if cx is not None else width / 2.0
    cy = float(cy) if cy is not None else height / 2.0
    info.k = [fx, 0.0, cx, 0.0, fy, cy, 0.0, 0.0, 1.0]
    info.r = [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
    info.p = [fx, 0.0, cx, 0.0, 0.0, fy, cy, 0.0, 0.0, 0.0, 1.0, 0.0]
    return info
