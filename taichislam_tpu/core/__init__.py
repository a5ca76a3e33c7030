from taichislam_tpu.core.config import GridSpec, TSDFConfig, OctomapConfig
from taichislam_tpu.core.grid import GridState, make_grid_state, allocate_blocks, lookup_slots
from taichislam_tpu.core import geometry

__all__ = [
    "GridSpec",
    "TSDFConfig",
    "OctomapConfig",
    "GridState",
    "make_grid_state",
    "allocate_blocks",
    "lookup_slots",
    "geometry",
]
