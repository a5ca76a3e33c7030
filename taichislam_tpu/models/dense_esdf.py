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

from taichislam_tpu.models.dense_tsdf import DenseTSDF, bin_bucket_for
from taichislam_tpu.ops import esdf as esdf_ops


class DenseESDF(DenseTSDF):
    def __init__(self, *args, enable_esdf=True, max_esdf_sweeps=64,
                 esdf_block_cap=None, esdf_incremental=True,
                 esdf_raise_slack_voxels=None, esdf_seed_eps_voxels=None,
                 esdf_dense_max_voxels=2 * 1024 * 1024,
                 esdf_check_interval=1, **kwargs):
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
        # host-sync discipline: capacity verdicts / window refreshes every
        # N frames (1 = per frame, the exact interactive semantics; >1 for
        # high-latency links like the axon relay — overflows are detected
        # up to N frames late and recovered by re-queueing the dirty union)
        self.esdf_check_interval = max(1, int(esdf_check_interval))
        self._esdf_frame = 0
        self._esdf_host_ready = False
        self._esdf_dims_cached = None
        self._esdf_nblocks_cached = 1
        self._esdf_last_mode = "block"
        self._esdf_last_cap = (64, 64)
        self._esdf_pack = None
        self._esdf_dirty_union = None
        # deferred per-frame path (see _recast_depth_frame_deferred)
        self._frame_pack = None
        self._frame_union = None
        self._esdf_obs_stale = False
        # dirty-window mode sizing (grown via verdict span stats)
        self._esdf_win_dims = (4, 4, 4)
        self._esdf_win_ok = True
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
        if (self.enable_esdf and self.esdf_incremental and
                self.cfg.esdf_seed_eps_voxels >= 0 and
                self.esdf_check_interval > 1):
            # deferred mode: ONE composed device dispatch per frame
            # (integrate + gated incremental ESDF chained in-graph,
            # ops/sequence.py with F=1) and ONE packed verdict fetch per
            # check interval — the per-call API stops paying a dispatch +
            # sync RPC pair every frame on remote-attached devices.
            self._recast_depth_frame_deferred(R, T, depthmap, texture)
            return
        super().recast_depth_to_map(R, T, depthmap, texture)
        if self.enable_esdf:
            self.update_esdf()

    def _recast_depth_frame_deferred(self, R, T, depthmap, texture):
        """Single-dispatch frame: semantics of ``recast_depth_to_map`` +
        gated ``update_esdf`` in deferred-check mode. Capacity verdicts
        (bin/touched buckets, ESDF working-set cap) are accumulated
        device-side as running maxima and fetched every
        ``esdf_check_interval`` frames; on a late-detected ESDF overflow
        the touched-block union re-queues (bounded staleness <= interval
        frames, the same discipline as update_esdf's deferred mode).
        Integrate-side drops are corrected at the next check like
        ``_update_bin_bucket``'s documented deferred behavior."""
        import jax.numpy as jnp
        from taichislam_tpu.ops import sequence as seq_ops
        # frames ride as 1-tuples: the sequence op stacks IN-GRAPH, so a
        # device-resident frame (bag replay) costs zero extra dispatches
        # (np.asarray here would fetch; a host [None] expand would pay a
        # dispatch round-trip per frame on the relay)
        depth1 = (jnp.asarray(depthmap),)
        tex1 = ((jnp.asarray(texture),)
                if texture is not None and self.enable_texture else None)
        depths, tex, R_j, T_j, K, Kc = self._sequence_inputs(
            [R], [T], depth1, tex1)
        budget = min(self.max_esdf_sweeps, 6)
        nb = self.cfg.grid.max_blocks + 1
        nbset = (self._esdf_pending if self._esdf_pending is not None
                 else jnp.zeros((nb,), bool))
        (self.state, self.esdf, self.esdf_fixed, self._esdf_pending,
         self._esdf_seen_tsdf, self._esdf_seen_obs,
         stats) = seq_ops.integrate_esdf_sequence(
            self._sequence_cfg(), budget, self._esdf_cap_bucket,
            self.state, self.esdf, self.esdf_fixed, nbset,
            self._esdf_seen_tsdf, self._esdf_seen_obs, depths, tex,
            R_j, T_j, K, Kc, jnp.int32(self.active_submap_id))
        self.last_stats = stats
        self._mark_mesh_dirty(stats.get("touched_blocks"))
        self._esdf_obs_stale = True
        if self._frame_pack is None:
            self._frame_pack = jnp.zeros((4,), jnp.int32)
            self._frame_union = jnp.zeros((nb,), bool)
        self._frame_pack, self._frame_union = \
            seq_ops.accumulate_frame_verdict(self._frame_pack,
                                             self._frame_union, stats)
        self._esdf_frame += 1
        if self._esdf_frame % self.esdf_check_interval == 0:
            self._frame_verdict()

    def _frame_verdict(self):
        """Act on the interval's accumulated capacity maxima (ONE host
        fetch): grow the bin/touched/ESDF-cap buckets and re-queue the
        interval's touched union so late-detected ESDF overflows converge."""
        import jax.numpy as jnp
        bins_total, dropped, _live, esdf_ov = (
            int(x) for x in np.asarray(self._frame_pack))
        union = self._frame_union
        self._frame_pack = None
        self._frame_union = None
        if dropped > 0:
            want = min(bin_bucket_for(bins_total), self.cfg.max_bins)
            if want > self._bin_bucket:
                self._bin_bucket = want
            tb = getattr(self, "_touched_bucket",
                         self.cfg.max_touched_blocks)
            if tb < self.cfg.max_blocks:
                self._touched_bucket = min(tb * 2, self.cfg.max_blocks)
        else:
            self._bin_bucket = min(bin_bucket_for(bins_total),
                                   self.cfg.max_bins)
        if esdf_ov > 0:
            cap = self._esdf_cap_bucket
            grown = cap
            while grown < cap + esdf_ov:
                grown *= 2
            self._esdf_cap_bucket = min(grown, self.esdf_block_cap)
            # re-queue everything the interval touched: dropped blocks'
            # dirtiness recovers on the next frames
            self._esdf_pending = (self._esdf_pending | union
                                  if self._esdf_pending is not None
                                  else union)

    def _refresh_esdf_observed(self):
        """Lazy refresh of the export-facing observed mask — the deferred
        per-frame path doesn't pay its dispatches every frame."""
        if not self._esdf_obs_stale:
            return
        blk = self.state.block_active & (
            self.state.block_coords[:, 0] == jnp.int32(self.active_submap_id))
        self.esdf_observed = ((self.state.channels["TSDF_observed"] > 0) &
                              blk.at[-1].set(False)[:, None])
        self._esdf_obs_stale = False

    def recast_pcl_to_map(self, R, T, xyz_array, rgb_array):
        super().recast_pcl_to_map(R, T, xyz_array, rgb_array)
        if self.enable_esdf:
            self.update_esdf()

    def recast_depth_sequence(self, Rs, Ts, depthmaps, textures=None):
        """Multi-frame ingest with per-frame incremental ESDF chained in
        the same dispatch (ops/sequence.py integrate_esdf_sequence) —
        semantically the per-frame ``recast + update_esdf`` loop in its
        block-incremental gated mode, with ONE capacity verdict per
        window. Falls back to the TSDF-only sequence when the ESDF is
        disabled or not in gated-incremental mode."""
        if not (self.enable_esdf and self.esdf_incremental and
                self.cfg.esdf_seed_eps_voxels >= 0):
            super().recast_depth_sequence(Rs, Ts, depthmaps, textures)
            if self.enable_esdf:
                self.update_esdf()
            return
        from taichislam_tpu.ops import sequence as seq_ops
        depths, tex, R_j, T_j, K, Kc = self._sequence_inputs(
            Rs, Ts, depthmaps, textures)
        budget = min(self.max_esdf_sweeps, 6)
        nbset = (self._esdf_pending if self._esdf_pending is not None
                 else jnp.zeros((self.cfg.grid.max_blocks + 1,), bool))
        snap = (self.state, self.esdf, self.esdf_fixed, nbset,
                self._esdf_seen_tsdf, self._esdf_seen_obs)
        if not self._esdf_host_ready:
            self._esdf_host_refresh()
        for _ in range(8):
            cap = self._esdf_cap_bucket
            (state, esdf, fixed, pending, seen_t, seen_o,
             stats) = seq_ops.integrate_esdf_sequence(
                self._sequence_cfg(), budget, cap, *snap, depths, tex,
                R_j, T_j, K, Kc, jnp.int32(self.active_submap_id))
            redo = self._sequence_verdict(
                stats, extra_keys=("max_esdf_overflow",))
            ov = self._verdict_extra[0]
            if ov > 0:
                grown = cap
                while grown < cap + ov:
                    grown *= 2
                grown = min(grown, self.esdf_block_cap)
                if grown > cap:
                    self._esdf_cap_bucket = grown
                    redo = True
                else:
                    print("[DenseESDF] sequence ESDF working set over "
                          f"esdf_block_cap by {ov}")
            if not redo:
                break
        self.state = state
        self.esdf, self.esdf_fixed = esdf, fixed
        blk = state.block_active & (state.block_coords[:, 0] ==
                                    jnp.int32(self.active_submap_id))
        self.esdf_observed = ((state.channels["TSDF_observed"] > 0) &
                              blk.at[-1].set(False)[:, None])
        self._esdf_pending = pending
        self._esdf_seen_tsdf, self._esdf_seen_obs = seen_t, seen_o
        self.last_stats = stats
        self._esdf_frame += len(depthmaps)

    def _window_info_dev(self):
        """Device-side (8,) int32: active-submap block-coord mins, maxs,
        any-active flag, allocated block count — ONE host fetch covers
        everything the host-side mode/capacity decisions need (fetching
        block_coords + block_active separately cost 2 relay round-trips
        per frame)."""
        c4 = self.state.block_coords
        act = self.state.block_active & \
            (c4[:, 0] == jnp.int32(self.active_submap_id))
        act = act.at[-1].set(False)
        huge = jnp.int32(1 << 20)
        mins = jnp.min(jnp.where(act[:, None], c4[:, 1:4], huge), axis=0)
        maxs = jnp.max(jnp.where(act[:, None], c4[:, 1:4], -huge), axis=0)
        return jnp.concatenate([
            mins, maxs,
            jnp.any(act).astype(jnp.int32)[None],
            jnp.asarray(self.state.num_blocks, jnp.int32).reshape(1)])

    def _dense_window_dims(self, info=None):
        """Bucketed (DBX, DBY, DBZ) block dims of the active submap's
        bounding box, or None when the window exceeds the dense-mode
        budget (ops/esdf.py dense-window rationale)."""
        if info is None:
            info = np.asarray(self._window_info_dev())
        if int(info[6]) == 0:
            return None
        spans = info[3:6] - info[0:3] + 1

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

    @staticmethod
    def _win_bucket(n):
        """Window-dimension bucket (blocks): ~1.5x steps bound recompiles."""
        for b in (2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64):
            if n <= b:
                return b
        return int(n)

    def _esdf_host_refresh(self):
        """Refresh the cached host-side mode/capacity info (1 round-trip)."""
        info = np.asarray(self._window_info_dev())
        self._esdf_dims_cached = self._dense_window_dims(info)
        self._esdf_nblocks_cached = int(info[7]) + 1
        self._esdf_host_ready = True

    def update_esdf(self):
        interactive = self.esdf_check_interval <= 1

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
                if interactive:
                    # skip-on-clean needs a host decision; in deferred mode
                    # the update always runs (a clean set converges in one
                    # cheap sweep) to keep the hot loop sync-free
                    self.last_esdf_dirty = int(jnp.sum(dirty))
                    if self.last_esdf_dirty == 0:
                        self.last_esdf_sweeps = 0
                        return

        # incremental mode without gating (esdf_seed_eps_voxels < 0):
        # frame-touched blocks plus last update's still-propagating
        # wavefront; full update when no touched bitmap (submap fusion).
        if dirty is None and self.esdf_incremental:
            touched = self.last_stats.get("touched_blocks")
            if touched is not None:
                dirty = touched
                if self._esdf_pending is not None:
                    dirty = dirty | self._esdf_pending

        # host-side mode/capacity info: refreshed every check interval (the
        # window only changes as the map grows; a stale window overflows,
        # which the deferred verdict catches and re-queues)
        if not self._esdf_host_ready or \
                self._esdf_frame % self.esdf_check_interval == 0:
            self._esdf_host_refresh()
        dims = self._esdf_dims_cached

        # consume-once snapshot seeds when gating is active (see
        # ops/esdf.py esdf_update): re-queued blocks sweep on the seeds
        # they were gated with, so sub-gate jitter cannot churn the field
        snap = {}
        if dirty is not None and self.cfg.esdf_seed_eps_voxels >= 0:
            snap = dict(tsdf_src=self._esdf_seen_tsdf,
                        obs_src=self._esdf_seen_obs)

        spans = jnp.zeros((3,), jnp.int32)
        if dirty is not None and self._esdf_win_ok and \
                self.esdf_dense_max_voxels:
            # dirty-window dense mode (ops/esdf.py esdf_update_dense with
            # dirty_blocks): full-window scans every sweep converge the
            # working set in ~2-3 sweeps — no halo assembly, no neighbor
            # probes. Window dims bucket from the dirty bbox (grown via
            # the span stats in the verdict pack).
            self._esdf_last_mode = "window"
            wdims = self._esdf_win_dims
            (self.esdf, self.esdf_fixed, self.esdf_observed, sweeps,
             changed, overflow) = esdf_ops.esdf_update_dense(
                self.cfg, self.max_esdf_sweeps, wdims, self.state,
                self.esdf, self.esdf_fixed,
                jnp.int32(self.active_submap_id), dirty_blocks=dirty,
                **snap)
            c4 = self.state.block_coords
            anchor = (dirty & self.state.block_active &
                      (c4[:, 0] == jnp.int32(self.active_submap_id)))
            anchor = anchor.at[-1].set(False)
            huge = jnp.int32(1 << 20)
            mins = jnp.min(jnp.where(anchor[:, None], c4[:, 1:4], huge),
                           axis=0)
            maxs = jnp.max(jnp.where(anchor[:, None], c4[:, 1:4], -huge),
                           axis=0)
            spans = jnp.maximum(maxs - mins + 1, 0)
        elif dims is not None:
            # dense-window mode: the observed bounding box fits a modest
            # dense grid — sweep it directly (full-length axis scans, no
            # halo assembly)
            self._esdf_last_mode = "dense"
            (self.esdf, self.esdf_fixed, self.esdf_observed, sweeps,
             changed, overflow) = esdf_ops.esdf_update_dense(
                self.cfg, self.max_esdf_sweeps, dims, self.state,
                self.esdf, self.esdf_fixed,
                jnp.int32(self.active_submap_id))
        else:
            # block-sweep mode (HBM-scale maps): sweep cost scales with the
            # compacted working set; cap bucketed to the allocated count
            full_cap = 128
            while full_cap < self._esdf_nblocks_cached:
                full_cap *= 2
            full_cap = min(full_cap, self.esdf_block_cap)
            cap = min(self._esdf_cap_bucket if dirty is not None
                      else full_cap, full_cap)
            self._esdf_last_mode = "block"
            self._esdf_last_cap = (cap, full_cap)
            (self.esdf, self.esdf_fixed, self.esdf_observed, sweeps,
             changed, overflow) = esdf_ops.esdf_update(
                self.cfg, self.max_esdf_sweeps, cap, self.state,
                self.esdf, self.esdf_fixed,
                jnp.int32(self.active_submap_id), dirty, **snap)
        self._esdf_pending = changed
        pack = jnp.concatenate([jnp.stack([
            jnp.asarray(sweeps, jnp.int32),
            jnp.asarray(overflow, jnp.int32),
            (jnp.sum(dirty.astype(jnp.int32)) if dirty is not None
             else jnp.int32(-1))]), spans])
        if self._esdf_pack is None:
            self._esdf_pack = pack
        else:
            # accumulate across the check interval (device-side): overflow
            # and the window spans are running maxima so a TRANSIENT
            # mid-interval overflow still reaches the verdict — with only
            # the boundary frame's stats, a mid-interval drop whose blocks
            # stop changing afterwards would never re-queue and leave
            # permanently stale ESDF
            self._esdf_pack = jnp.concatenate([
                pack[:1], jnp.maximum(self._esdf_pack[1:], pack[1:])])
        # device-side union of dirty sets since the last verdict: on a
        # late-detected overflow the dropped blocks' dirtiness re-queues
        # from here (bounded staleness <= check interval frames)
        if dirty is not None:
            self._esdf_dirty_union = dirty if self._esdf_dirty_union is None \
                else (self._esdf_dirty_union | dirty)
        self._esdf_frame += 1
        if interactive or self._esdf_frame % self.esdf_check_interval == 0:
            self._esdf_verdict(dirty)

    def _esdf_verdict(self, dirty):
        """Fetch the packed per-update stats (ONE round-trip) and act on
        capacity overflow: grow the cap bucket / refresh the dense window,
        re-queue the dirty union, and redo immediately in interactive
        mode (when the capacity actually grew — same semantics as the old
        inline grow-and-redo loop)."""
        sweeps, overflow, ndirty, sx, sy, sz = (
            int(x) for x in np.asarray(self._esdf_pack))
        self._esdf_pack = None
        self.last_esdf_sweeps = sweeps
        if ndirty >= 0:
            self.last_esdf_dirty = ndirty
        if overflow > 0:
            grew = False
            if self._esdf_last_mode == "window":
                # grow the dirty-window bucket to the observed span + the
                # one-block ring on each side; fall back to block mode if
                # the bucketed window would exceed the dense-mode budget
                want = tuple(self._win_bucket(s + 2) for s in (sx, sy, sz))
                V3 = self.cfg.grid.voxels_per_block
                if want[0] * want[1] * want[2] * V3 > \
                        self.esdf_dense_max_voxels:
                    self._esdf_win_ok = False
                    grew = True
                elif want != self._esdf_win_dims:
                    self._esdf_win_dims = tuple(
                        max(a, b) for a, b in zip(want, self._esdf_win_dims))
                    grew = True
            elif self._esdf_last_mode == "dense":
                # dense window undersized (stale bbox): refresh from the
                # current bbox; a fresh window that still overflows falls
                # back to block mode on the next call
                old = self._esdf_dims_cached
                self._esdf_host_refresh()
                grew = self._esdf_dims_cached != old
            else:
                cap, full_cap = self._esdf_last_cap
                need = cap + overflow
                grown = cap
                while grown < need:
                    grown *= 2
                grown = min(grown, full_cap)
                grew = grown > cap
                self._esdf_cap_bucket = grown
            if self._esdf_dirty_union is not None:
                self._esdf_pending = self._esdf_pending | \
                    self._esdf_dirty_union
            if self.esdf_check_interval <= 1 and grew:
                # interactive mode keeps the old exact semantics: redo now
                self._esdf_dirty_union = None
                self.update_esdf()
                return
        self._esdf_dirty_union = None

    # -- exports -------------------------------------------------------------
    def cvt_ESDF_to_voxels_slice(self, z, dz=0.5):
        self._refresh_esdf_observed()
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
        self._refresh_esdf_observed()
        from taichislam_tpu.ops.exports import voxel_ijk_all
        ijk = np.asarray(voxel_ijk_all(self.cfg.grid, self.state)).reshape(
            -1, 3)
        esdf = np.asarray(self.esdf).reshape(-1)
        mask = np.asarray(self.esdf_observed).reshape(-1)
        return {tuple(i): e for i, e, m in zip(ijk, esdf, mask) if m}
