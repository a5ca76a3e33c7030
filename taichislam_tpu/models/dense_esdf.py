"""DenseESDF: TSDF map with per-frame incremental ESDF.

The working replacement for the reference's legacy DenseSDF
(/root/reference/taichi_slam/mapping/dense_esdf.py) — which is unexported,
cannot instantiate against the current BaseMap (SURVEY.md §2.4), and has a
known memory issue. This class composes DenseTSDF's fusion pipeline with the
Jacobi-sweep ESDF of ``ops.esdf``: after every recast the ESDF is updated
incrementally (warm-started), and ``cvt_ESDF_to_voxels_slice`` /
``get_voxels_ESDF_slice`` expose the reference's export surface
(dense_esdf.py:498-509).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.ops import esdf as esdf_ops


class DenseESDF(DenseTSDF):
    def __init__(self, *args, enable_esdf=True, max_esdf_sweeps=64,
                 esdf_block_cap=None, esdf_incremental=True,
                 esdf_raise_slack_voxels=None, esdf_seed_eps_voxels=None,
                 esdf_dense_max_voxels=2 * 1024 * 1024, **kwargs):
        super().__init__(*args, **kwargs)
        self.esdf_dense_max_voxels = esdf_dense_max_voxels
        import dataclasses
        if esdf_raise_slack_voxels is not None:
            self.cfg = dataclasses.replace(
                self.cfg, esdf_raise_slack_voxels=esdf_raise_slack_voxels)
        if esdf_seed_eps_voxels is not None:
            self.cfg = dataclasses.replace(
                self.cfg, esdf_seed_eps_voxels=esdf_seed_eps_voxels)
        self.enable_esdf = enable_esdf
        self.max_esdf_sweeps = max_esdf_sweeps
        self.esdf_block_cap = esdf_block_cap or min(2048, self.cfg.max_blocks)
        self.esdf_incremental = esdf_incremental
        # blocks whose values changed last update: wavefronts that reached
        # the working-set edge continue propagating from here next frame
        self._esdf_pending = None
        self._esdf_cap_bucket = 64
        spec = self.cfg.grid
        shape = (spec.max_blocks + 1, spec.voxels_per_block)
        # updated-voxel gating snapshots (ops/esdf.py esdf_seed_dirty)
        self._esdf_seen_tsdf = jnp.zeros(shape, jnp.float32)
        self._esdf_seen_obs = jnp.zeros(shape, bool)
        self.esdf = jnp.zeros(shape, jnp.float32)
        self.esdf_fixed = jnp.zeros(shape, jnp.int8)
        self.esdf_observed = jnp.zeros(shape, bool)
        self.last_esdf_sweeps = 0
        self.last_esdf_dirty = -1   # -1: gating not engaged yet
        self.num_export_ESDF_particles = 0
        self.export_ESDF = np.zeros((0,), np.float32)
        self.export_ESDF_xyz = np.zeros((0, 3), np.float32)

    # -- ingestion hooks: update ESDF after every TSDF update ----------------
    def recast_depth_to_map(self, R, T, depthmap, texture):
        super().recast_depth_to_map(R, T, depthmap, texture)
        if self.enable_esdf:
            self.update_esdf()

    def recast_pcl_to_map(self, R, T, xyz_array, rgb_array):
        super().recast_pcl_to_map(R, T, xyz_array, rgb_array)
        if self.enable_esdf:
            self.update_esdf()

    def _dense_window_dims(self):
        """Bucketed (DBX, DBY, DBZ) block dims of the active submap's
        bounding box, or None when the window exceeds the dense-mode
        budget (ops/esdf.py dense-window rationale)."""
        c4 = np.asarray(self.state.block_coords)
        act = np.asarray(self.state.block_active) & \
            (c4[:, 0] == self.active_submap_id)
        act[-1] = False
        if not act.any():
            return None
        spans = c4[act, 1:4].max(axis=0) - c4[act, 1:4].min(axis=0) + 1

        def bucket(n):
            b = 1
            while b < n:
                b *= 2
            return b
        dims = tuple(int(bucket(s)) for s in spans)
        V3 = self.cfg.grid.voxels_per_block
        if dims[0] * dims[1] * dims[2] * V3 > self.esdf_dense_max_voxels:
            return None
        return dims

    def update_esdf(self):
        # updated-voxel gating (ops/esdf.py esdf_seed_dirty): of the frame's
        # touched blocks only those whose TSDF seeds moved materially since
        # the ESDF last consumed them re-enter the working set; a frame with
        # no material change (and no pending wavefront) costs zero sweeps
        dirty = None
        if self.esdf_incremental and self.cfg.esdf_seed_eps_voxels >= 0:
            touched = self.last_stats.get("touched_blocks")
            if touched is not None:
                dirty, self._esdf_seen_tsdf, self._esdf_seen_obs = \
                    esdf_ops.esdf_seed_dirty(
                        self.cfg, self.state, self._esdf_seen_tsdf,
                        self._esdf_seen_obs, touched)
                if self._esdf_pending is not None:
                    dirty = dirty | self._esdf_pending
                self.last_esdf_dirty = int(jnp.sum(dirty))
                if self.last_esdf_dirty == 0:
                    self.last_esdf_sweeps = 0
                    return

        # dense-window mode: when the observed bounding box fits a modest
        # dense grid, sweep it directly — full-length axis scans converge
        # exploration wedges in a few sweeps and there is no halo assembly
        dims = self._dense_window_dims()
        if dims is not None:
            (self.esdf, self.esdf_fixed, self.esdf_observed, sweeps,
             changed, overflow) = esdf_ops.esdf_update_dense(
                self.cfg, self.max_esdf_sweeps, dims, self.state,
                self.esdf, self.esdf_fixed,
                jnp.int32(self.active_submap_id))
            assert int(overflow) == 0, "dense window undersized"
            self._esdf_pending = changed
            self.last_esdf_sweeps = int(sweeps)
            return

        # block-sweep mode (HBM-scale maps): sweep cost scales with the
        # compacted working set; bucket the cap to the allocated block count
        nblocks = int(self.state.num_blocks) + 1
        full_cap = 128
        while full_cap < nblocks:
            full_cap *= 2
        full_cap = min(full_cap, self.esdf_block_cap)

        # incremental mode without gating (esdf_seed_eps_voxels < 0):
        # restrict sweeps to frame-touched blocks plus last update's
        # still-propagating wavefront; anything else keeps its warm value.
        # Falls back to a full update when the last map change didn't
        # report a touched bitmap (e.g. submap fusion).
        if dirty is None and self.esdf_incremental:
            touched = self.last_stats.get("touched_blocks")
            if touched is not None:
                dirty = touched
                if self._esdf_pending is not None:
                    dirty = dirty | self._esdf_pending
        cap = self._esdf_cap_bucket if dirty is not None else full_cap
        while True:
            cap = min(cap, full_cap)
            (self.esdf, self.esdf_fixed, self.esdf_observed, sweeps,
             changed, overflow) = esdf_ops.esdf_update(
                self.cfg, self.max_esdf_sweeps, cap, self.state,
                self.esdf, self.esdf_fixed,
                jnp.int32(self.active_submap_id), dirty)
            if int(overflow) > 0 and cap < full_cap:
                need = cap + int(overflow)
                while cap < need:
                    cap *= 2
                continue
            break
        if dirty is not None:
            self._esdf_cap_bucket = cap
        self._esdf_pending = changed
        self.last_esdf_sweeps = int(sweeps)

    # -- exports -------------------------------------------------------------
    def cvt_ESDF_to_voxels_slice(self, z, dz=0.5):
        x, y, zc, esdf, color, n = esdf_ops.esdf_slice_export(
            self.cfg, self.max_disp_particles, self._export_block_bucket(),
            self.state, self.esdf, self.esdf_observed,
            jnp.asarray(self.submaps_base_R_np),
            jnp.asarray(self.submaps_base_T_np),
            jnp.int32(self.active_submap_id), jnp.float32(z),
            jnp.float32(dz))
        self.export_ESDF_xyz = np.stack(
            [np.array(x), np.array(y), np.array(zc)], axis=1)
        self.export_ESDF = np.array(esdf)
        self.export_color = np.array(color)
        self.num_export_ESDF_particles = int(n)

    def get_voxels_ESDF_slice(self, z):
        self.cvt_ESDF_to_voxels_slice(z)
        return self.export_ESDF_xyz, self.export_ESDF

    def get_esdf_dict(self):
        """Debug/test helper: dict voxel-tuple -> esdf over observed voxels."""
        from taichislam_tpu.ops.exports import voxel_ijk_all
        ijk = np.asarray(voxel_ijk_all(self.cfg.grid, self.state)).reshape(
            -1, 3)
        esdf = np.asarray(self.esdf).reshape(-1)
        mask = np.asarray(self.esdf_observed).reshape(-1)
        return {tuple(i): e for i, e, m in zip(ijk, esdf, mask) if m}
