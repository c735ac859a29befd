#!/usr/bin/env python3
"""Depth-stream probe node (reference monocular_slam/check_depth.py parity):
subscribes the registered depth topic and logs min/max/mean of valid pixels."""

import numpy as np
import rclpy
from rclpy.node import Node
from sensor_msgs.msg import Image

from txr_slam.msg_utils import msg_to_image


class CheckDepthNode(Node):
    def __init__(self):
        super().__init__("txr_check_depth")
        self.declare_parameter("topic", "/camera/depth_registered/image_raw")
        topic = self.get_parameter("topic").value
        self.create_subscription(Image, topic, self._on_depth, 10)
        self.get_logger().info(f"Monitoring {topic}")

    def _on_depth(self, msg: Image):
        depth = msg_to_image(msg)
        valid = depth[(depth > 0) & np.isfinite(depth)]
        if valid.size:
            self.get_logger().info(
                f"depth {msg.width}x{msg.height}: min={valid.min():.3f} "
                f"max={valid.max():.3f} mean={valid.mean():.3f} "
                f"({valid.size / depth.size:.0%} valid)")
        else:
            self.get_logger().warning("depth frame has no valid pixels")


def main(args=None):
    rclpy.init(args=args)
    node = CheckDepthNode()
    try:
        rclpy.spin(node)
    finally:
        node.destroy_node()
        rclpy.shutdown()


if __name__ == "__main__":
    main()
