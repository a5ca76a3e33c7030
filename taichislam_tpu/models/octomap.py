"""Octomap: probabilistic occupancy map with K³-tree semantics.

API mirrors /root/reference/taichi_slam/mapping/taichi_octomap.py. Storage
is the block voxel grid; the K**R tree levels survive as the LOD parameter
of ``cvt_occupy_to_voxels(level)`` (stride-K**level corner subsampling).
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from taichislam_tpu.core.config import OctomapConfig
from taichislam_tpu.models.base_map import BaseMap
from taichislam_tpu.ops import occupancy as occ_ops


class Octomap(BaseMap):
    def __init__(self, map_scale=[10, 10], voxel_scale=0.05,
                 min_occupy_thres=3, texture_enabled=False,
                 min_ray_length=0.3, max_ray_length=3.0,
                 max_disp_particles=1000000, K=2, max_submap_num=1024,
                 disp_ceiling=10.0, disp_floor=-10.0, is_global_map=False,
                 recast_step=2, color_same_proj=True, max_blocks=8192):
        super().__init__(voxel_scale)
        self.cfg = OctomapConfig(
            map_scale=tuple(map_scale), voxel_scale=voxel_scale,
            min_occupy_thres=min_occupy_thres,
            texture_enabled=texture_enabled, min_ray_length=min_ray_length,
            max_ray_length=max_ray_length,
            max_disp_particles=max_disp_particles, K=K,
            max_submap_num=max_submap_num, disp_ceiling=disp_ceiling,
            disp_floor=disp_floor, is_global_map=is_global_map,
            recast_step=recast_step, color_same_proj=color_same_proj,
            max_blocks=max_blocks)
        self.K = K
        self.Rxy = self.cfg.Rxy
        self.Rz = self.cfg.Rz
        self.N = self.cfg.N
        self.Nz = self.cfg.Nz
        self.voxel_scale = self.cfg.voxel_scale  # re-derived map/N
        self.map_size_xy = map_scale[0]
        self.map_size_z = map_scale[1]
        self.max_disp_particles = max_disp_particles
        self.min_occupy_thres = min_occupy_thres
        self.max_ray_length = max_ray_length
        self.min_ray_length = min_ray_length
        self.enable_texture = texture_enabled
        self.max_submap_num = max_submap_num
        self.disp_ceiling = disp_ceiling
        self.disp_floor = disp_floor
        self.is_global_map = is_global_map
        self.recast_step = recast_step
        self.color_same_proj = color_same_proj

        self.state = occ_ops.make_octomap_state(self.cfg)
        self.initialize_submap_fields(max_submap_num)
        self.num_export_particles = 0
        self.export_x = np.zeros((0, 3), np.float32)
        self.export_color = np.zeros((0, 3), np.float32)

    # -- ingestion ----------------------------------------------------------
    def recast_pcl_to_map(self, R, T, xyz_array, rgb_array, n):
        """taichi_octomap.py:126-128. ``n`` caps the used prefix."""
        self.set_pose(R, T)
        xyz = np.asarray(xyz_array)[:n]
        rgb = np.asarray(rgb_array)[:n] if self.enable_texture else \
            np.zeros((len(xyz), 3), np.float32)
        self.state = occ_ops.integrate_pcl(
            self.cfg, self.state, jnp.asarray(xyz, jnp.float32),
            jnp.asarray(rgb, jnp.float32), jnp.asarray(self.input_R),
            jnp.asarray(self.input_T), jnp.int32(self.active_submap_id))

    def recast_depth_to_map(self, R, T, depthmap, texture):
        """taichi_octomap.py:130-132."""
        self.set_pose(R, T)
        texture_arr = texture if self.enable_texture else np.zeros(
            (1, 1, 3), np.uint8)
        kc = self.K_cam_color if self.K_cam_color is not None else \
            self.K_cam_dep
        self.state = occ_ops.integrate_depth(
            self.cfg, self.state, jnp.asarray(depthmap),
            jnp.asarray(texture_arr), jnp.asarray(self.input_R),
            jnp.asarray(self.input_T), jnp.asarray(self.K_cam_dep),
            jnp.asarray(kc), jnp.int32(self.active_submap_id))

    # -- exports ------------------------------------------------------------
    def _occupy_export(self, capacity, level):
        from taichislam_tpu.ops import exports as exports_ops
        bcap = min(exports_ops.pow2_capacity(
            int(self.state.num_blocks) + 1, lo=64), self.cfg.max_blocks)
        ex, ey, ez, color, n = occ_ops.occupy_export(
            self.cfg, capacity, int(level), bcap, self.state,
            jnp.asarray(self.submaps_base_R_np),
            jnp.asarray(self.submaps_base_T_np),
            jnp.int32(self.active_submap_id))
        xyz = np.stack([np.array(ex), np.array(ey), np.array(ez)], axis=1)
        return xyz, np.array(color), int(n)

    def cvt_occupy_to_voxels(self, level=0):
        (self.export_x, self.export_color,
         self.num_export_particles) = self._occupy_export(
            self.max_disp_particles, level)

    def cvt_occupy_voxels_to(self, level, cur_num, max_disp_particles,
                             x, color):
        """Append variant (taichi_octomap.py:104-114); survivors are
        compacted to the front, so appending is a slice copy."""
        xyz, col, kept = self._occupy_export(max_disp_particles, level)
        copy = min(kept, max(0, max_disp_particles - cur_num))
        if copy > 0:
            sl = slice(cur_num, cur_num + copy)
            x[sl] = xyz[:copy]
            color[sl] = col[:copy]
        return cur_num + copy

    def get_occupy_voxels(self, l=0):
        self.cvt_occupy_to_voxels(l)
        return self.export_x, self.export_color

    def get_voxels_occupy(self):
        self.cvt_occupy_to_voxels(0)
        return self.export_x, self.export_color

    # -- fusion / reset -----------------------------------------------------
    def fuse_submaps(self, submaps: "Octomap"):
        self.reset()
        t = time.time()
        # fusion reads THIS (global) map's pose registry, matching
        # taichi_octomap.py:198
        self.state = occ_ops.fuse_submaps(
            submaps.cfg, self.cfg, self.state, submaps.state,
            jnp.asarray(self.submaps_base_R_np),
            jnp.asarray(self.submaps_base_T_np),
            jnp.int32(submaps.max_submap_num))
        print(f"[OctoMap] Fuse submaps {(time.time()-t)*1000:.1f}ms, "
              f"active local: {submaps.active_submap_id} "
              f"remote: {submaps.remote_submap_num}")

    def fuse_submaps_incremental(self, submaps: "Octomap", submap_id: int,
                                 sub_bcap=None, defer_verdict=False):
        """Splat ONE finished submap into this global map without resetting
        it. Hit-count accumulation is associative (occupy += submap_occ,
        taichi_octomap.py:186), so fusing each submap exactly once equals
        the reference's reset + refuse-all — until PGO moves base poses,
        when SubmapMapping falls back to the full :meth:`fuse_submaps`.
        ``sub_bcap``/``defer_verdict`` are accepted for signature parity
        with DenseTSDF; the occupancy splat has no capacity verdicts (its
        source lanes span the collection grid, which cannot drop)."""
        t = time.time()
        self.state = occ_ops.fuse_submaps(
            submaps.cfg, self.cfg, self.state, submaps.state,
            jnp.asarray(self.submaps_base_R_np),
            jnp.asarray(self.submaps_base_T_np),
            jnp.int32(submaps.max_submap_num),
            only_submap=jnp.int32(submap_id))
        print(f"[OctoMap] Fuse submap {submap_id} incrementally "
              f"{(time.time()-t)*1000:.1f}ms")

    def resolve_deferred_fuse(self):
        """No-op: octomap fuses dispatch eagerly with no deferred capacity
        verdicts (see :meth:`fuse_submaps_incremental`)."""

    def reset(self):
        from taichislam_tpu.core.grid import reset_grid
        self.state = reset_grid(self.state)

    # -- misc (reference API completeness) ----------------------------------
    def random_init_octo(self, pts=1000):
        """Random smoke-test fill (mapping_common.py:67-73)."""
        rng = np.random.default_rng(0)
        half_n, half_z = self.N // 2, self.Nz // 2
        ijk = np.stack([
            rng.integers(-half_n, half_n, pts),
            rng.integers(-half_n, half_n, pts),
            rng.integers(-half_z, half_z, pts)], -1).astype(np.float32)
        xyz = ijk * self.voxel_scale
        counts = rng.integers(0, 10, pts).astype(np.float32)
        # scatter counts by repeated integration of weighted points
        from taichislam_tpu.ops.occupancy import _scatter_hits
        state = self.state
        pts_rep = np.repeat(xyz, counts.astype(np.int64), axis=0)
        if len(pts_rep):
            state = _scatter_hits(
                self.cfg, state, jnp.asarray(pts_rep), None,
                jnp.ones(len(pts_rep), bool), jnp.int32(self.active_submap_id))
        self.state = state

    def is_occupy_fn(self):
        from taichislam_tpu.ops.raycast import make_octomap_occupancy_fn
        return make_octomap_occupancy_fn(self.cfg, self.state,
                                         self.active_submap_id)

    def saveMap(self, path):
        pass

    def export_submap(self):
        return {}

    def finalization_current_submap(self):
        pass
