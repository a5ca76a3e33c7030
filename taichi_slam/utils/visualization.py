"""taichi_slam.utils.visualization — reference-compatible import path."""
from taichislam_tpu.utils.visualization import TaichiSLAMRender  # noqa: F401
