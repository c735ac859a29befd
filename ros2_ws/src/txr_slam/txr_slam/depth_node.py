#!/usr/bin/env python3
"""Monocular depth node: RGB in, registered metric depth out — on TPU.

Topic/behavior parity with the reference's depth_anything_node
(monocular_slam/depth_anything_node.py): subscribes /camera/image_raw,
publishes 32FC1 meters on /camera/depth_registered/image_raw plus a synced
CameraInfo; converts the relative network output with the inverse-depth
heuristic metric = depth_scale_factor / max(relative, 1e-3) and zeroes (=
invalidates) everything past max_depth. The model here is the Flax Depth
Anything running on TPU instead of a per-frame torch forward.

Parameters: model_version (v1/v2/v3), model_encoder, checkpoint, metric
(native metric head instead of the inverse heuristic), compute settings
max_depth (default 3.5) and depth_scale_factor (default 20.0).
"""

import numpy as np
import rclpy
from rclpy.node import Node
from sensor_msgs.msg import CameraInfo, Image

from txr_slam.msg_utils import image_to_msg, msg_to_image


class DepthNode(Node):
    def __init__(self):
        super().__init__("txr_depth_node")
        self.declare_parameter("model_version", "v2")
        self.declare_parameter("model_encoder", "vits")
        self.declare_parameter("checkpoint", "")
        self.declare_parameter("metric", False)
        self.declare_parameter("max_depth", 3.5)
        self.declare_parameter("depth_scale_factor", 20.0)

        from txr.models.depth_anything import DepthAnythingModel

        self.metric = bool(self.get_parameter("metric").value)
        self.max_depth = float(self.get_parameter("max_depth").value)
        self.scale_factor = float(self.get_parameter("depth_scale_factor").value)
        ckpt = self.get_parameter("checkpoint").value or None
        self.model = DepthAnythingModel(
            version=self.get_parameter("model_version").value,
            encoder=self.get_parameter("model_encoder").value,
            checkpoint_path=ckpt,
            metric=self.metric,
            max_depth=self.max_depth if self.metric else 20.0,
        )
        self.get_logger().info("Depth model ready on TPU")

        self._last_info = None
        self.create_subscription(Image, "/camera/image_raw", self._on_image, 10)
        self.create_subscription(CameraInfo, "/camera/camera_info", self._on_info, 10)
        self.depth_pub = self.create_publisher(
            Image, "/camera/depth_registered/image_raw", 10)
        self.info_pub = self.create_publisher(
            CameraInfo, "/camera/depth_registered/camera_info", 10)

    def _on_info(self, msg: CameraInfo):
        self._last_info = msg

    def _on_image(self, msg: Image):
        bgr = msg_to_image(msg)
        if msg.encoding == "rgb8":
            bgr = bgr[..., ::-1]
        rel = self.model.infer(np.ascontiguousarray(bgr))

        if self.metric:
            depth = rel
        else:
            # Inverse-depth heuristic (reference depth_anything_node.py:76-79).
            depth = self.scale_factor / np.maximum(rel, 1e-3)
        # Past max_depth → 0 = invalid (reference :83-85).
        depth = np.where(depth > self.max_depth, 0.0, depth).astype(np.float32)

        out = image_to_msg(depth, "32FC1", msg.header.stamp, msg.header.frame_id)
        self.depth_pub.publish(out)
        if self._last_info is not None:
            info = self._last_info
            info.header = out.header
            self.info_pub.publish(info)


def main(args=None):
    rclpy.init(args=args)
    node = DepthNode()
    try:
        rclpy.spin(node)
    finally:
        node.destroy_node()
        rclpy.shutdown()


if __name__ == "__main__":
    main()
