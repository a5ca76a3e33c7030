from taichi_slam.utils import communication, ros_pcl_transfer  # noqa: F401
