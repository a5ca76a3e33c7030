"""BaseMap: shared pose state, camera intrinsics, and submap registry.

The API mirrors the reference's BaseMap
(/root/reference/taichi_slam/mapping/mapping_common.py) so downstream code
(node, demos, SubmapMapping) is drop-in, but all mutable state is host-side
numpy plus an immutable device `GridState` owned by subclasses — the compute
path stays functional.

Deviation (deliberate bug fix): the reference initializes per-submap base
rotations to **zeros** (mapping_common.py:106), which silently zeroes poses
for standalone maps that never call ``set_base_pose_submap``; we initialize
to identity so standalone use is sane. Semantics once poses are set are
identical.
"""

from __future__ import annotations

import numpy as np

from taichislam_tpu.core import geometry
from taichislam_tpu.core.colormap import jet_lut_np


class BaseMap:
    def __init__(self, voxel_scale: float):
        self.voxel_scale = voxel_scale
        self.input_R = np.eye(3, dtype=np.float32)
        self.input_T = np.zeros(3, dtype=np.float32)
        self.base_R_np = np.eye(3)
        self.base_T_np = np.zeros(3)
        self.frame_id = 0
        self.submap_enabled = False
        self.K_cam_dep = None
        self.K_cam_color = None
        self.colormap = jet_lut_np()

    # -- camera ------------------------------------------------------------
    def set_dep_camera_intrinsic(self, K):
        """K is a flattened row-major 3x3 (mapping_common.py:25-26)."""
        self.K_cam_dep = np.asarray(K, np.float32).reshape(-1)

    def set_color_camera_intrinsic(self, K):
        self.K_cam_color = np.asarray(K, np.float32).reshape(-1)

    # -- pose --------------------------------------------------------------
    def convert_by_base(self, R, T):
        """mapping_common.py:91-100."""
        if self.submap_enabled:
            base_R = self.submaps_base_R_np[self.active_submap_id]
            base_T = self.submaps_base_T_np[self.active_submap_id]
        else:
            base_R, base_T = self.base_R_np, self.base_T_np
        return geometry.convert_by_base(base_R, base_T, R, T)

    def set_pose(self, _R, _T):
        """mapping_common.py:149-156: store the sensor pose expressed in the
        active submap's frame."""
        R_, T_ = self.convert_by_base(np.asarray(_R), np.asarray(_T))
        self.input_R = R_.astype(np.float32)
        self.input_T = T_.astype(np.float32)

    def set_base_pose(self, _R, _T):
        self.base_R_np = np.asarray(_R, np.float64)
        self.base_T_np = np.asarray(_T, np.float64)

    # -- frame-keyed ingest shims --------------------------------------------
    # The node calls the by_frame API on whatever mapping backend it holds
    # (reference taichislam_node.py:376,392), but the reference implements
    # it only on SubmapMapping — its non-submap depth/pcl ingest crashes
    # with AttributeError. These shims apply the camera extrinsic and
    # forward (a single map has no keyframe/submap lifecycle).
    def recast_depth_to_map_by_frame(self, frame_id, is_keyframe, pose, ext,
                                     depthmap, texture):
        R, T = pose
        R_ext, T_ext = ext
        self.recast_depth_to_map(R @ R_ext, T + R @ T_ext, depthmap, texture)

    def recast_pcl_to_map_by_frame(self, frame_id, is_keyframe, pose, ext,
                                   pcl, rgb_array):
        R, T = pose
        R_ext, T_ext = ext
        Rc, Tc = R @ R_ext, T + R @ T_ext
        from taichislam_tpu.models.octomap import Octomap
        if isinstance(self, Octomap):
            self.recast_pcl_to_map(Rc, Tc, pcl, rgb_array, len(pcl))
        else:
            self.recast_pcl_to_map(Rc, Tc, pcl, rgb_array)

    # -- submap registry (mapping_common.py:102-131) -------------------------
    def initialize_submap_fields(self, max_submap_num: int):
        self.submap_enabled = True
        self.max_submap_num = max_submap_num
        self.submaps_base_R_np = np.tile(np.eye(3, dtype=np.float32),
                                         (max_submap_num, 1, 1))
        self.submaps_base_T_np = np.zeros((max_submap_num, 3), np.float32)
        self.active_submap_id = 0
        self.remote_submap_num = 0

    def get_active_submap_id(self):
        return self.active_submap_id

    def switch_to_next_submap(self):
        self.finalization_current_submap()
        self.active_submap_id += 1
        return self.active_submap_id

    def set_base_pose_submap(self, submap_id, _R, _T):
        self.submaps_base_R_np[submap_id] = np.asarray(_R, np.float32)
        self.submaps_base_T_np[submap_id] = np.asarray(_T, np.float32)

    def finalization_current_submap(self):
        pass

    # -- display helper (mapping_common.py:78-89) ----------------------------
    def render_occupy_map_to_particles(self, pars, pos_, colors,
                                      num_particles_, voxel_scale):
        if num_particles_ == 0:
            return
        pos = pos_[0:num_particles_, :]
        if not self.enable_texture:
            from matplotlib import cm
            max_z = np.max(pos[:, 2])
            min_z = np.min(pos[:, 2])
            rng = max(max_z - min_z, 1e-9)
            colors = cm.jet((pos[:, 2] - min_z) / rng)
        pars.set_particles(pos)
        pars.set_particle_radii(np.ones(num_particles_) * voxel_scale / 2)
        pars.set_particle_colors(colors)
