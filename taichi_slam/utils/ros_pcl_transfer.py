"""taichi_slam.utils.ros_pcl_transfer — reference-compatible import path."""
from taichislam_tpu.utils.ros_pcl_transfer import *  # noqa: F401,F403
from taichislam_tpu.utils.ros_pcl_transfer import (  # noqa: F401
    get_xyz_rgb_points,
    iteration_over_bag,
    point_cloud,
    pointcloud2_to_xyz_rgb_array,
    pose_msg_to_numpy,
    quaternion_matrix,
    transform_msg_to_numpy,
)
