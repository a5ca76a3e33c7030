"""ShardedDenseTSDF: the DenseTSDF/DenseESDF frame loop on a device mesh.

SURVEY.md §5.7's stated purpose, as a user-facing model: a map whose voxel
channels exceed one chip's HBM lives sharded over the slot axis of a
``jax.sharding.Mesh`` (parallel.block_sharded layout) while the whole
frame loop still runs as collectives —

    integrate (sharded scatter)  →  dirty union  →  incremental ESDF
    (psum working-set assembly + all_gather halo sweeps, Pallas chunk
    kernel on TPU meshes)  →  surface-block gather (psum)  →
    marching-cubes mesh patch on the compact surface working set

— so only the *surface shell* (``surface_block_cap`` blocks) ever has to
fit replicated on one device; the full map never does. Results are
bit-exact with the single-device DenseESDF pipeline (every collective is
a disjoint partition or replication of the same arithmetic — asserted in
tests/test_parallel.py::test_sharded_model_matches_single_device and the
driver dryrun's end-to-end stage).

The reference has no analog: its maps are single-device Taichi fields
(/root/reference/taichi_slam/mapping/dense_tsdf.py), so map size is
bounded by one GPU's memory.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.models.base_map import BaseMap
from taichislam_tpu.ops import exports as exports_ops
from taichislam_tpu.ops import marching_cubes as mc_ops


class ShardedDenseTSDF(BaseMap):
    def __init__(self, mesh: Mesh | None = None, map_scale=[10, 10],
                 voxel_scale=0.05, texture_enabled=False,
                 min_ray_length=0.3, max_ray_length=3.0,
                 max_disp_particles=1 << 20, num_voxel_per_blk_axis=16,
                 max_blocks=8191, max_submap_num=64, recast_step=2,
                 enable_esdf=True, max_esdf_sweeps=8, esdf_block_cap=512,
                 esdf_raise_slack_voxels=None, surface_block_cap=512,
                 max_triangles=1 << 18, max_bins=8192,
                 max_march_lanes=262144, storage_dtype="float32"):
        super().__init__(voxel_scale)
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("block",))
        self.mesh = mesh
        n = mesh.devices.size
        # slot axis must divide the mesh (block_sharded rule): round up
        max_blocks = -(-(max_blocks + 1) // n) * n - 1
        kw = dict(
            map_scale=tuple(map_scale), voxel_scale=voxel_scale,
            texture_enabled=texture_enabled, min_ray_length=min_ray_length,
            max_ray_length=max_ray_length, recast_step=recast_step,
            max_blocks=max_blocks, max_bins=max_bins,
            max_submap_num=max_submap_num, max_march_lanes=max_march_lanes,
            storage_dtype=storage_dtype)
        if esdf_raise_slack_voxels is not None:
            kw["esdf_raise_slack_voxels"] = esdf_raise_slack_voxels
        self.cfg = TSDFConfig(**kw)
        self.map_size_xy, self.map_size_z = map_scale[0], map_scale[1]
        self.max_ray_length = max_ray_length
        self.min_ray_length = min_ray_length
        self.enable_texture = texture_enabled
        self.max_disp_particles = max_disp_particles
        self.num_voxel_per_blk_axis = num_voxel_per_blk_axis
        self.is_global_map = False
        self.initialize_submap_fields(max_submap_num)

        self.enable_esdf = enable_esdf
        self.max_esdf_sweeps = max_esdf_sweeps
        self.esdf_block_cap = esdf_block_cap
        self._esdf_cap_bucket = min(128, esdf_block_cap)
        self.surface_block_cap = surface_block_cap
        self.max_triangles = max_triangles
        self.tsdf_surface_thres = self.cfg.tsdf_surface_thres

        from taichislam_tpu.ops import tsdf as tsdf_ops
        from taichislam_tpu.parallel.block_sharded import (
            gather_surface_blocks, shard_state, sharded_integrate_depth)
        self.state = shard_state(tsdf_ops.make_tsdf_state(self.cfg), mesh)
        self._integrate_fn = sharded_integrate_depth(self.cfg, mesh)
        self._gather_fn = gather_surface_blocks(self.cfg, mesh,
                                                surface_block_cap)
        self._esdf_fns = {}
        nb = self.cfg.grid.max_blocks + 1
        shape = (nb, self.cfg.grid.voxels_per_block)
        from taichislam_tpu.parallel.sharded_esdf import esdf_sharding
        sh = esdf_sharding(mesh)
        self.esdf = jax.device_put(jnp.zeros(shape, jnp.float32), sh)
        self.esdf_fixed = jax.device_put(jnp.zeros(shape, jnp.int8), sh)
        self._esdf_pending = jnp.zeros((nb,), bool)
        self._mesh_dirty = jnp.zeros((nb,), bool)
        self.last_esdf_sweeps = 0
        self.num_TSDF_particles = 0
        self.export_TSDF_xyz = np.zeros((0, 3), np.float32)
        self.export_TSDF = np.zeros((0,), np.float32)
        self.export_color = np.zeros((0, 3), np.float32)

    # -- frame loop ----------------------------------------------------------
    def _esdf_fn(self, cap):
        if cap not in self._esdf_fns:
            from taichislam_tpu.parallel.sharded_esdf import \
                sharded_esdf_update
            self._esdf_fns[cap] = sharded_esdf_update(
                self.cfg, self.max_esdf_sweeps, cap, self.mesh,
                incremental=True)
        return self._esdf_fns[cap]

    def recast_depth_to_map(self, R, T, depthmap, texture=None):
        """Integrate one depth frame (world-frame camera pose) and run the
        incremental sharded ESDF on the touched ∪ pending working set."""
        self.set_pose(R, T)
        tex = (jnp.asarray(texture) if texture is not None and
               self.enable_texture else jnp.zeros((1, 1, 3), jnp.uint8))
        kc = self.K_cam_color if self.K_cam_color is not None else \
            self.K_cam_dep
        self.state, touched = self._integrate_fn(
            self.state, jnp.asarray(depthmap), tex,
            jnp.asarray(self.input_R), jnp.asarray(self.input_T),
            jnp.asarray(self.K_cam_dep), jnp.asarray(kc),
            jnp.int32(self.active_submap_id))
        self._mesh_dirty = self._mesh_dirty | touched
        if self.enable_esdf:
            self.update_esdf(touched)

    def update_esdf(self, touched=None):
        nb = self.cfg.grid.max_blocks + 1
        dirty = self._esdf_pending if touched is None else \
            (touched | self._esdf_pending)
        while True:
            cap = self._esdf_cap_bucket
            esdf, fixed, _, sweeps, changed, overflow = self._esdf_fn(cap)(
                self.state, self.esdf, self.esdf_fixed,
                jnp.int32(self.active_submap_id), dirty)
            ov = int(overflow)
            if ov > 0 and cap < self.esdf_block_cap:
                grown = cap
                while grown < cap + ov:
                    grown *= 2
                self._esdf_cap_bucket = min(grown, self.esdf_block_cap)
                continue   # inputs untouched: redo with the larger cap
            if ov > 0:
                print(f"[ShardedDenseTSDF] ESDF working set over "
                      f"esdf_block_cap by {ov}")
            break
        self.esdf, self.esdf_fixed = esdf, fixed
        self._esdf_pending = changed
        self.last_esdf_sweeps = int(sweeps)

    # -- consumption: compact surface working set -----------------------------
    def _surface_state(self):
        """Gather the (replicated) surface-block mini state; grows the cap
        on overflow — the only part of the map that must fit one device."""
        from taichislam_tpu.parallel.block_sharded import (
            gather_surface_blocks, surface_block_cfg)
        while True:
            mini, n_kept, ov = self._gather_fn(
                self.state, jnp.int32(self.active_submap_id))
            if int(ov) == 0:
                break
            self.surface_block_cap = exports_ops.pow2_capacity(
                int(n_kept), lo=self.surface_block_cap * 2)
            self._gather_fn = gather_surface_blocks(self.cfg, self.mesh,
                                                    self.surface_block_cap)
        return mini, surface_block_cfg(self.cfg, self.surface_block_cap)

    def cvt_TSDF_surface_to_voxels(self):
        mini, mini_cfg = self._surface_state()
        x, y, z, color, tsdf, nkept = exports_ops.tsdf_surface_export(
            mini_cfg, self.max_disp_particles, self.surface_block_cap,
            mini, jnp.asarray(self.submaps_base_R_np),
            jnp.asarray(self.submaps_base_T_np),
            jnp.int32(self.active_submap_id))
        self.export_TSDF_xyz = np.stack(
            [np.asarray(x), np.asarray(y), np.asarray(z)], axis=1)
        self.export_TSDF = np.asarray(tsdf)
        self.export_color = np.asarray(color)
        self.num_TSDF_particles = int(nkept)

    def get_voxels_TSDF_surface(self):
        self.cvt_TSDF_surface_to_voxels()
        return (self.export_TSDF_xyz, self.export_TSDF,
                self.export_color if self.enable_texture else None)

    def count_active(self):
        return int(exports_ops.count_active(
            self.cfg, self.state, jnp.int32(self.active_submap_id)))

    def extract_mesh(self, incremental=True):
        """Marching-cubes triangles of the surface working set.

        ``incremental=True`` restricts extraction to the 26-dilation of
        the blocks touched since the last call (the per-frame mesh patch a
        planner/viewer consumes; models/mesher.py's span-patch protocol);
        False re-extracts every surface block. Returns the op's output
        dict (vertices/normals/colors/num_triangles/block spans)."""
        mini, mini_cfg = self._surface_state()
        mask = None
        if incremental:
            # full-map dirty bitmap -> mini-state rows (the mini table maps
            # kept linear block ids to mini slots; dirty rows not in the
            # mini state hold no surface and extract nothing anyway)
            from taichislam_tpu.core.grid import lookup_slots
            c4 = mini.block_coords
            spec = self.cfg.grid
            blin = ((c4[:, 1] * spec.bn_xy + c4[:, 2]) * spec.bn_z +
                    c4[:, 3] + c4[:, 0] * spec.blocks_per_submap)
            full_slot = lookup_slots(spec, self.state.table,
                                     jnp.where(mini.block_active, blin, -1))
            nb = spec.max_blocks + 1
            dil = mc_ops.dilate_blocks(self.cfg, self.state,
                                       jnp.int32(self.active_submap_id),
                                       self._mesh_dirty)
            mask = jnp.take(dil, jnp.clip(full_slot, 0, nb - 1)) & \
                mini.block_active
        out = mc_ops.extract_mesh(
            mini_cfg, self.max_triangles, 1, self.surface_block_cap, mini,
            jnp.int32(self.active_submap_id),
            jnp.float32(self.tsdf_surface_thres), block_mask=mask)
        if incremental:
            self._mesh_dirty = jnp.zeros_like(self._mesh_dirty)
        return out

    # -- ESDF consumption ------------------------------------------------------
    def esdf_at_blocks(self, dirty=None):
        """Replicated (esdf, fixed) rows of the surface working set —
        planner-local distance lookups without materializing the sharded
        field on one device."""
        mini, _ = self._surface_state()
        return mini

    def get_esdf_dict(self):
        """Debug/test helper (small maps only): voxel-tuple -> esdf over
        observed voxels. Materializes the full sharded field on the host."""
        from taichislam_tpu.ops.exports import voxel_ijk_all
        blk = self.state.block_active & (
            self.state.block_coords[:, 0] == self.active_submap_id)
        obs = (self.state.channels["TSDF_observed"] > 0) & \
            blk.at[-1].set(False)[:, None]
        ijk = np.asarray(voxel_ijk_all(self.cfg.grid,
                                       self.state)).reshape(-1, 3)
        esdf = np.asarray(self.esdf).reshape(-1)
        mask = np.asarray(obs).reshape(-1)
        return {tuple(i): e for i, e, m in zip(ijk, esdf, mask) if m}
