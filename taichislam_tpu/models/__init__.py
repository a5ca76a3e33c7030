"""Map types with the reference's public API surface
(cf. /root/reference/taichi_slam/mapping/__init__.py — the reference
re-exports taichi_octomap, dense_tsdf, submap_mapping, mapping_common,
marching_cube_mesher, topo_graph; dense_esdf is deliberately unexported
there, but our DenseESDF is fully working and exported)."""

from taichislam_tpu.models.base_map import BaseMap
from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.octomap import Octomap

__all__ = ["BaseMap", "DenseTSDF", "Octomap"]
