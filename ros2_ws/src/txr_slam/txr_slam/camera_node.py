#!/usr/bin/env python3
"""Camera/video source node.

Topic-contract parity with the reference's simple_camera_node
(monocular_slam/simple_camera_node.py): publishes bgr8 frames on
/camera/image_raw and approximate CameraInfo on /camera/camera_info at a
configurable framerate; webcam mode auto-reconnects on read failure; video
mode plays the file in a ping-pong loop (index bounces between the ends) so
RTAB-Map-style consumers see continuous motion.
"""

import cv2
import rclpy
from rclpy.node import Node
from sensor_msgs.msg import CameraInfo, Image

from txr_slam.msg_utils import image_to_msg, make_camera_info


class CameraNode(Node):
    def __init__(self):
        super().__init__("txr_camera_node")
        self.declare_parameter("video_device", 0)
        self.declare_parameter("width", 1280)
        self.declare_parameter("height", 720)
        self.declare_parameter("frame_id", "camera")
        self.declare_parameter("framerate", 30.0)
        self.declare_parameter("video_path", "")

        self.device_id = self.get_parameter("video_device").value
        self.width = self.get_parameter("width").value
        self.height = self.get_parameter("height").value
        self.frame_id = self.get_parameter("frame_id").value
        self.video_path = self.get_parameter("video_path").value

        self.pub = self.create_publisher(Image, "/camera/image_raw", 10)
        self.info_pub = self.create_publisher(CameraInfo, "/camera/camera_info", 10)

        self.cap = None
        self.total_frames = 0
        self.frame_idx = 0
        self.direction = 1
        self._video_fails = 0
        self._open()

        rate = float(self.get_parameter("framerate").value)
        self.timer = self.create_timer(1.0 / max(rate, 1e-3), self._tick)

    def _open(self):
        if self.cap is not None:
            self.cap.release()
        if self.video_path:
            self.get_logger().info(f"Opening video file: {self.video_path}")
            self.cap = cv2.VideoCapture(self.video_path)
            self.total_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
            self.frame_idx = 0
            self.direction = 1
            self._video_fails = 0
        else:
            self.get_logger().info(f"Opening camera {self.device_id}")
            self.cap = cv2.VideoCapture(self.device_id)
            self.cap.set(cv2.CAP_PROP_FRAME_WIDTH, self.width)
            self.cap.set(cv2.CAP_PROP_FRAME_HEIGHT, self.height)
            self.cap.set(cv2.CAP_PROP_FOURCC, cv2.VideoWriter_fourcc(*"MJPG"))
        if not self.cap.isOpened():
            self.get_logger().error("Failed to open video source")

    def _read_video_pingpong(self):
        """Bounce playback between the first and last frame."""
        self.cap.set(cv2.CAP_PROP_POS_FRAMES, self.frame_idx)
        ok, frame = self.cap.read()
        if ok:
            self._video_fails = 0
            self.frame_idx += self.direction
            if self.frame_idx >= self.total_frames - 1:
                self.direction = -1
            elif self.frame_idx <= 0:
                self.direction = 1
        else:
            # Read failure near an end: reverse and step back in. If reads
            # keep failing in both directions (1-frame file, over-reported
            # CAP_PROP_FRAME_COUNT), reopen the file instead of oscillating
            # between two bad indices forever.
            self._video_fails += 1
            if self._video_fails >= 10:
                self.get_logger().warning("Video reads failing; reopening")
                self._open()
                return False, None
            self.direction *= -1
            self.frame_idx = min(max(self.frame_idx + self.direction, 0),
                                 max(self.total_frames - 1, 0))
        return ok, frame

    def _tick(self):
        if self.cap is None or not self.cap.isOpened():
            self._open()
            return
        if self.video_path:
            ok, frame = self._read_video_pingpong()
            if not ok:
                return
        else:
            ok, frame = self.cap.read()
            if not ok:
                self.get_logger().warning("Capture failed; reconnecting")
                self._open()
                return

        stamp = self.get_clock().now().to_msg()
        msg = image_to_msg(frame, "bgr8", stamp, self.frame_id)
        self.pub.publish(msg)
        info = make_camera_info(frame.shape[1], frame.shape[0], header=msg.header)
        self.info_pub.publish(info)


def main(args=None):
    rclpy.init(args=args)
    node = CameraNode()
    try:
        rclpy.spin(node)
    finally:
        node.destroy_node()
        rclpy.shutdown()


if __name__ == "__main__":
    main()
