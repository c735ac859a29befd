"""Live SLAM graph: source → TPU depth → RTAB-Map odometry/SLAM/viz.

Graph parity with the reference's slam.launch.py (monocular_slam/launch):
- source selection by db_path emptiness (db player XOR camera/video node),
- TPU depth node feeding /camera/depth_registered/*,
- rtabmap_odom rgbd_odometry (Frame→Frame strategy, optical-flow
  correspondences, Vis/MinInliers 15) + rtabmap_slam (Grid/Depth clipped at
  5 m, fresh DB each launch) + rtabmap_viz, all approx-time-synced with a
  deep queue because depth inference runs below camera rate,
- static TFs base_link → camera → camera_optical (optical frame rotated
  RPY −π/2, 0, −π/2).

Falls back gracefully when RTAB-Map is not installed: the txr nodes still run
and our own check_depth can probe the stream.
"""

from launch import LaunchDescription
from launch.actions import DeclareLaunchArgument
from launch.conditions import IfCondition
from launch.substitutions import LaunchConfiguration, PythonExpression
from launch_ros.actions import Node


def generate_launch_description():
    video_path = LaunchConfiguration("video_path")
    db_path = LaunchConfiguration("db_path")
    encoder = LaunchConfiguration("model_encoder")

    use_db = PythonExpression(["'", db_path, "' != ''"])
    use_camera = PythonExpression(["'", db_path, "' == ''"])

    common_sync = {
        "approx_sync": True,
        "sync_queue_size": 100,  # depth runs below camera rate; buffer deep
        "qos": 1,
    }

    return LaunchDescription([
        DeclareLaunchArgument("video_path", default_value="",
                              description="Video file to replay (else webcam)"),
        DeclareLaunchArgument("db_path", default_value="",
                              description="RTAB-Map DB to replay (overrides camera)"),
        DeclareLaunchArgument("model_encoder", default_value="vits",
                              description="Depth Anything encoder size"),

        # --- frame source: DB replay XOR camera/video --------------------
        Node(
            package="txr_slam", executable="db_player_node",
            name="db_player_node", output="screen",
            condition=IfCondition(use_db),
            parameters=[{"db_path": db_path, "framerate": 30.0}],
        ),
        Node(
            package="txr_slam", executable="camera_node",
            name="camera_node", output="screen",
            condition=IfCondition(use_camera),
            parameters=[{"video_path": video_path, "framerate": 30.0}],
        ),

        # --- TPU depth ----------------------------------------------------
        Node(
            package="txr_slam", executable="depth_node",
            name="depth_node", output="screen",
            parameters=[{
                "model_version": "v2",
                "model_encoder": encoder,
                "max_depth": 3.5,
                "depth_scale_factor": 20.0,
            }],
        ),

        # --- RTAB-Map odometry / SLAM / viz --------------------------------
        Node(
            package="rtabmap_odom", executable="rgbd_odometry",
            name="rgbd_odometry", output="screen",
            parameters=[{
                **common_sync,
                "frame_id": "base_link",
                "publish_tf": True,
                "Odom/Strategy": "1",              # Frame→Frame
                "Vis/CorType": "1",                # optical flow
                "Vis/MinInliers": "15",
                "Odom/ResetCountdown": "1",
            }],
            remappings=[
                ("rgb/image", "/camera/image_raw"),
                ("rgb/camera_info", "/camera/camera_info"),
                ("depth/image", "/camera/depth_registered/image_raw"),
            ],
        ),
        Node(
            package="rtabmap_slam", executable="rtabmap",
            name="rtabmap", output="screen",
            arguments=["--delete_db_on_start"],
            parameters=[{
                **common_sync,
                "frame_id": "base_link",
                "subscribe_depth": True,
                "Grid/DepthMax": "5.0",
                "Grid/RangeMax": "5.0",
            }],
            remappings=[
                ("rgb/image", "/camera/image_raw"),
                ("rgb/camera_info", "/camera/camera_info"),
                ("depth/image", "/camera/depth_registered/image_raw"),
            ],
        ),
        Node(
            package="rtabmap_viz", executable="rtabmap_viz",
            name="rtabmap_viz", output="screen",
            parameters=[{**common_sync, "frame_id": "base_link",
                         "subscribe_depth": True}],
            remappings=[
                ("rgb/image", "/camera/image_raw"),
                ("rgb/camera_info", "/camera/camera_info"),
                ("depth/image", "/camera/depth_registered/image_raw"),
            ],
        ),

        # --- static TFs -----------------------------------------------------
        Node(
            package="tf2_ros", executable="static_transform_publisher",
            name="base_to_camera",
            arguments=["0", "0", "0", "0", "0", "0", "base_link", "camera"],
        ),
        Node(
            package="tf2_ros", executable="static_transform_publisher",
            name="camera_to_optical",
            arguments=["0", "0", "0", "-1.5708", "0", "-1.5708",
                       "camera", "camera_optical_frame"],
        ),
    ])
