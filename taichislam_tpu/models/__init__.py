"""Map types with the reference's public API surface
(cf. /root/reference/taichi_slam/mapping/__init__.py — the reference
re-exports taichi_octomap, dense_tsdf, submap_mapping, mapping_common,
marching_cube_mesher, topo_graph; dense_esdf is deliberately unexported
there because it bit-rotted, but our DenseESDF is fully working)."""

from taichislam_tpu.models.base_map import BaseMap
from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.dense_esdf import DenseESDF
from taichislam_tpu.models.octomap import Octomap
from taichislam_tpu.models.submap_mapping import SubmapMapping
from taichislam_tpu.models.mesher import MarchingCubeMesher
from taichislam_tpu.models.topo_graph import TopoGraphGen

__all__ = ["BaseMap", "DenseTSDF", "DenseESDF", "Octomap", "SubmapMapping",
           "MarchingCubeMesher", "TopoGraphGen"]
