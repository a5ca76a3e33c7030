"""taichi_slam.mapping — reference-compatible import path
(cf. /root/reference/taichi_slam/mapping/__init__.py)."""

from taichislam_tpu.models import (  # noqa: F401
    BaseMap,
    DenseESDF,
    DenseTSDF,
    MarchingCubeMesher,
    Octomap,
    SubmapMapping,
    TopoGraphGen,
)
