"""DenseTSDF: voxblox-style TSDF map with the reference's public API.

Thin stateful shell over the functional ops in ``taichislam_tpu.ops``; the
API (constructor kwargs, recast/export/serialization methods) mirrors
/root/reference/taichi_slam/mapping/dense_tsdf.py so the node, demos, and
SubmapMapping drive it unchanged. The npy/zlib submap wire format is
byte-compatible (same dict schema/dtypes, dense_tsdf.py:456-498).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.models.base_map import BaseMap
from taichislam_tpu.ops import exports as exports_ops
from taichislam_tpu.ops import fusion as fusion_ops
from taichislam_tpu.ops import tsdf as tsdf_ops


def bin_bucket_for(n: int, headroom_num=21, headroom_den=20,
                   lo: int = 2048) -> int:
    """Smallest {1, 1.25, 1.5}·2^k bucket ≥ n·headroom (fusion lane count
    scales with the bucket, so granularity matters)."""
    want = max(n * headroom_num // headroom_den, 1)
    b = lo
    while True:
        for num in (4, 5, 6):
            if want <= b * num // 4:
                return b * num // 4
        b *= 2


class DenseTSDF(BaseMap):
    def __init__(self, map_scale=[10, 10], voxel_scale=0.05,
                 texture_enabled=False, max_disp_particles=1024 * 1024,
                 num_voxel_per_blk_axis=16, max_ray_length=10,
                 min_ray_length=0.3, internal_voxels=10, max_submap_num=1024,
                 is_global_map=False, disp_ceiling=1.8, disp_floor=-0.3,
                 recast_step=2, color_same_proj=True, max_blocks=8192,
                 max_bins=32768, max_fuse_voxels=1 << 20,
                 storage_dtype="float32"):
        super().__init__(voxel_scale)
        self.cfg = TSDFConfig(
            map_scale=tuple(map_scale), voxel_scale=voxel_scale,
            texture_enabled=texture_enabled,
            max_disp_particles=max_disp_particles,
            num_voxel_per_blk_axis=num_voxel_per_blk_axis,
            max_ray_length=max_ray_length, min_ray_length=min_ray_length,
            internal_voxels=internal_voxels, max_submap_num=max_submap_num,
            is_global_map=is_global_map, disp_ceiling=disp_ceiling,
            disp_floor=disp_floor, recast_step=recast_step,
            color_same_proj=color_same_proj, max_blocks=max_blocks,
            max_bins=max_bins, storage_dtype=storage_dtype)
        self.map_size_xy = self.cfg.grid.map_size_xy
        self.map_size_z = self.cfg.grid.map_size_z
        self.N = self.cfg.grid.N
        self.Nz = self.cfg.grid.Nz
        self.block_num_xy = self.cfg.grid.bn_xy
        self.block_num_z = self.cfg.grid.bn_z
        self.num_voxel_per_blk_axis = num_voxel_per_blk_axis
        self.max_disp_particles = max_disp_particles
        self.enable_texture = texture_enabled
        self.max_ray_length = max_ray_length
        self.min_ray_length = min_ray_length
        self.tsdf_surface_thres = self.cfg.tsdf_surface_thres
        self.internal_voxels = internal_voxels
        self.max_submap_num = max_submap_num
        self.is_global_map = is_global_map
        self.disp_ceiling = disp_ceiling
        self.disp_floor = disp_floor
        self.recast_step = recast_step
        self.color_same_proj = color_same_proj
        self.max_fuse_voxels = max_fuse_voxels
        self.mem_per_voxel = (2 + 2 + 1 + 1) + (6 if texture_enabled else 0)

        self.state = tsdf_ops.make_tsdf_state(self.cfg)
        # the pose registry is full-size even for the global map — its copy
        # is the authoritative one used by fuse_submaps (dense_tsdf.py:315)
        self.initialize_submap_fields(max_submap_num)
        # adaptive ray-bin capacity: scatter cost scales with the (bins ×
        # steps) lattice, so the integrate executable is specialized to a
        # power-of-two bucket tracking the observed bin count
        self._bin_bucket = min(4096, self.cfg.max_bins)
        self.last_stats = {}
        self.clear_last_TSDF_exporting = False

        # mesh-dirty protocol (incremental mesher, models/mesher.py):
        # device-side union of touched-block bitmaps since the mesher last
        # consumed them; the full flag covers events that can move
        # arbitrary voxels (reset, fuse, load, submap switch)
        self._mesh_dirty_full = True
        self._mesh_dirty = None

        # deferred incremental-fuse verdict (voxgraph async finalize):
        # stashed entry state + stats until resolve_deferred_fuse
        self._pending_fuse = None

        # host-side export mirrors (the reference's export_* fields)
        self.num_TSDF_particles = 0
        self.export_TSDF_xyz = np.zeros((0, 3), np.float32)
        self.export_color = np.zeros((0, 3), np.float32)
        self.export_TSDF = np.zeros((0,), np.float32)

    # ------------------------------------------------------------------
    # mesh-dirty protocol (consumed by MarchingCubeMesher's incremental
    # re-mesh; see models/mesher.py)
    # ------------------------------------------------------------------
    def _mark_mesh_dirty(self, touched):
        """OR a per-slot touched-block bitmap into the pending dirty set
        (device arrays; the OR is a lazy dispatched op)."""
        if self._mesh_dirty_full or touched is None:
            return
        self._mesh_dirty = touched if self._mesh_dirty is None \
            else (self._mesh_dirty | touched)

    def _mark_mesh_dirty_full(self):
        self._mesh_dirty_full = True
        self._mesh_dirty = None

    def consume_mesh_dirty(self):
        """Returns (needs_full, bitmap) and clears the pending set:
        ``needs_full`` after events that can move arbitrary voxels
        (reset / fuse / load / submap switch / first use); otherwise
        ``bitmap`` is the per-slot union of blocks touched since the last
        consume (None = nothing changed)."""
        if self._mesh_dirty_full:
            self._mesh_dirty_full = False
            self._mesh_dirty = None
            return True, None
        d = self._mesh_dirty
        self._mesh_dirty = None
        return False, d

    def finalization_current_submap(self):
        # the mesher extracts the ACTIVE submap; a switch changes it wholesale
        self._mark_mesh_dirty_full()

    # ------------------------------------------------------------------
    # ingestion
    # ------------------------------------------------------------------
    def _recast_cfg(self):
        import dataclasses
        if self._bin_bucket >= self.cfg.max_bins:
            return self.cfg
        return dataclasses.replace(self.cfg, max_bins=self._bin_bucket)

    def _update_bin_bucket(self, stats):
        """Adapt the bin bucket to the observed load. ONE packed host fetch
        (separate int() reads cost a relay round-trip each), every
        ``capacity_check_interval`` frames (attribute, default 1; raise it
        on high-latency links — an under-bucketed frame records
        bins_dropped and is corrected at the next check)."""
        self._cap_frame = getattr(self, "_cap_frame", -1) + 1
        if self._cap_frame % getattr(self, "capacity_check_interval", 1):
            return
        pack = np.asarray(jnp.stack([stats["num_bins"],
                                     stats["bins_dropped"]]))
        n = int(pack[0]) + int(pack[1])
        self._bin_bucket = min(bin_bucket_for(n), self.cfg.max_bins)

    def recast_depth_to_map(self, R, T, depthmap, texture):
        """dense_tsdf.py:162-165."""
        if getattr(self, "_seq_chain", None):
            self._settle_sequence()   # per-frame ingest may not interleave
        self.set_pose(R, T)
        texture_arr = texture if self.enable_texture else np.zeros((1, 1, 3),
                                                                   np.uint8)
        kc = self.K_cam_color if self.K_cam_color is not None else \
            self.K_cam_dep
        self.state, stats = tsdf_ops.integrate_depth(
            self._recast_cfg(), self.state, jnp.asarray(depthmap),
            jnp.asarray(texture_arr), jnp.asarray(self.input_R),
            jnp.asarray(self.input_T), jnp.asarray(self.K_cam_dep),
            jnp.asarray(kc), jnp.int32(self.active_submap_id))
        self.last_stats = stats
        self._mark_mesh_dirty(stats.get("touched_blocks"))
        self._update_bin_bucket(stats)

    def recast_pcl_to_map(self, R, T, xyz_array, rgb_array):
        """dense_tsdf.py:157-160."""
        self.set_pose(R, T)
        rgb = rgb_array if self.enable_texture else np.zeros(
            (len(xyz_array), 3), np.float32)
        self.state, stats = tsdf_ops.integrate_pcl(
            self._recast_cfg(), self.state, jnp.asarray(xyz_array, jnp.float32),
            jnp.asarray(rgb, jnp.float32), jnp.asarray(self.input_R),
            jnp.asarray(self.input_T), jnp.int32(self.active_submap_id))
        self.last_stats = stats
        self._mark_mesh_dirty(stats.get("touched_blocks"))
        self._update_bin_bucket(stats)

    # -- multi-frame ingest (ops/sequence.py) --------------------------------
    def _sequence_inputs(self, Rs, Ts, depthmaps, textures):
        """Convert world-frame poses into the active submap frame (same
        math as per-frame ``set_pose``) and stack the window arrays."""
        F = len(depthmaps)
        R_c = np.zeros((F, 3, 3), np.float32)
        T_c = np.zeros((F, 3), np.float32)
        for f in range(F):
            R_, T_ = self.convert_by_base(np.asarray(Rs[f]),
                                          np.asarray(Ts[f]))
            R_c[f] = R_
            T_c[f] = T_
        self.input_R, self.input_T = R_c[-1].copy(), T_c[-1].copy()
        if self.enable_texture and textures is not None:
            tex = (tuple(textures) if isinstance(textures, (list, tuple))
                   and isinstance(textures[0], jax.Array)
                   else jnp.asarray(textures))
        else:
            tex = jnp.zeros((F, 1, 1, 3), jnp.uint8)
        kc = self.K_cam_color if self.K_cam_color is not None else \
            self.K_cam_dep
        # device-resident frame lists stay tuples: the sequence ops stack
        # them IN-GRAPH, saving a stack dispatch per window on the relay
        if isinstance(depthmaps, (list, tuple)) and \
                isinstance(depthmaps[0], jax.Array):
            depths = tuple(depthmaps)
        else:
            depths = jnp.asarray(depthmaps)
        return (depths, tex, jnp.asarray(R_c),
                jnp.asarray(T_c), jnp.asarray(self.K_cam_dep),
                jnp.asarray(kc))

    def _sequence_cfg(self):
        import dataclasses
        cfg = self._recast_cfg()
        tb = getattr(self, "_touched_bucket", 0)
        if tb and tb != cfg.max_touched_blocks:
            cfg = dataclasses.replace(cfg, max_touched_blocks=tb)
        return cfg

    def _sequence_verdict(self, stats, extra_keys=()):
        """ONE host readback for the window; grow buckets on any capacity
        miss. Returns True when the window must be redone. ``extra_keys``
        ride the same packed fetch (each separate int(stat) is a full RPC
        on remote-attached devices); their values land in
        ``self._verdict_extra`` in order."""
        pack = np.asarray(jnp.stack(
            [stats["max_bins_total"], stats["max_dropped"],
             stats["max_live_lanes"]] +
            [stats[k] for k in extra_keys]))
        bins_total, dropped, _live = (int(x) for x in pack[:3])
        self._verdict_extra = [int(x) for x in pack[3:]]
        redo = False
        if dropped > 0:
            # any capacity miss (bins / touched tiles / lanes / alloc):
            # grow the adaptive buckets and redo the window from its entry
            # state — identical end state to correctly-sized buckets
            want = min(bin_bucket_for(bins_total), self.cfg.max_bins)
            if want > self._bin_bucket:
                self._bin_bucket = want
                redo = True
            tb = getattr(self, "_touched_bucket",
                         self.cfg.max_touched_blocks)
            if tb < self.cfg.max_blocks:
                self._touched_bucket = min(tb * 2, self.cfg.max_blocks)
                redo = True
            if not redo:
                print("[DenseTSDF] sequence capacity miss at max buckets: "
                      f"dropped {dropped}")
        else:
            self._bin_bucket = min(bin_bucket_for(bins_total),
                                   self.cfg.max_bins)
        return redo

    def recast_depth_sequence(self, Rs, Ts, depthmaps, textures=None):
        """Fuse a window of depth frames in ONE device dispatch.

        Semantically identical to F sequential ``recast_depth_to_map``
        calls (same per-frame poses and integration math; see
        ops/sequence.py), amortizing the per-call dispatch cost for bag
        replay. The active submap must not change inside the window —
        ``SubmapMapping.recast_depth_sequence`` splits at keyframes.

        With ``self.sequence_verdict_async = True`` the window's capacity
        verdict (one packed device->host fetch, a full RPC round-trip on
        remote-attached devices) moves to a worker thread: the call
        returns after the dispatch, completed verdicts are drained
        non-blocking before the next window, and any map reader settles
        the chain via :meth:`_settle_sequence` (hooked into
        ``resolve_deferred_fuse``, which every export path calls). On a
        late-detected capacity miss the pending windows REPLAY in order
        from their stashed entry states with grown buckets — exact,
        because window inputs are immutable device arrays and the chain
        touches only the active submap. Identical end state to the
        synchronous path; only the blocking point moves.
        """
        inputs = self._sequence_inputs(Rs, Ts, depthmaps, textures)
        if getattr(self, "sequence_verdict_async", False):
            self._recast_window_async(inputs)
            return
        self._settle_sequence()
        self._recast_window_sync(inputs)

    def _recast_window_sync(self, inputs):
        from taichislam_tpu.ops import sequence as seq_ops
        depths, tex, R_j, T_j, K, Kc = inputs
        state0 = self.state
        for _ in range(8):
            state, stats = seq_ops.integrate_depth_sequence(
                self._sequence_cfg(), state0, depths, tex, R_j, T_j, K, Kc,
                jnp.int32(self.active_submap_id))
            if not self._sequence_verdict(stats):
                break
        self.state = state
        self.last_stats = stats
        self._mark_mesh_dirty(stats.get("touched_blocks"))

    # -- async window-verdict chain (sequence_verdict_async) -------------
    def _seq_exec(self):
        if getattr(self, "_seq_pool", None) is None:
            from concurrent.futures import ThreadPoolExecutor
            self._seq_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="seq-verdict")
        return self._seq_pool

    def _recast_window_async(self, inputs):
        from taichislam_tpu.ops import sequence as seq_ops
        self._drain_seq_chain(block=False)
        depths, tex, R_j, T_j, K, Kc = inputs
        entry = self.state
        sid = self.active_submap_id
        state, stats = seq_ops.integrate_depth_sequence(
            self._sequence_cfg(), entry, depths, tex, R_j, T_j, K, Kc,
            jnp.int32(sid))
        self.state = state
        self.last_stats = stats
        self._mark_mesh_dirty(stats.get("touched_blocks"))
        pack = jnp.stack([stats["max_bins_total"], stats["max_dropped"],
                          stats["max_live_lanes"]])
        if not getattr(self, "_seq_chain", None):
            self._seq_chain = []
        self._seq_chain.append(dict(
            inputs=inputs, submap_id=sid, entry=entry,
            bucket=self._bin_bucket,
            fut=self._seq_exec().submit(np.asarray, pack)))

    def _drain_seq_chain(self, block):
        """Consume resolved window verdicts (oldest first). ``block=True``
        waits for all (map readers); ``block=False`` only pops futures
        already done (per-window housekeeping — never blocks ingest). A
        miss anywhere replays the whole remaining chain synchronously
        from its entry state with grown buckets."""
        chain = getattr(self, "_seq_chain", None)
        if not chain:
            return
        from taichislam_tpu.models.dense_tsdf import bin_bucket_for
        while chain:
            fut = chain[0]["fut"]
            if not block and not fut.done():
                return
            pack = fut.result()
            bins_total, dropped = int(pack[0]), int(pack[1])
            want = min(bin_bucket_for(bins_total), self.cfg.max_bins)
            # a window is clean only if nothing dropped AND its dispatch
            # bucket covered the observed bins (bins_dropped folds into
            # bins_total, not the dropped counter — same check as the
            # synchronous _sequence_verdict)
            if dropped > 0 or want > chain[0]["bucket"]:
                break
            self._bin_bucket = want   # same follow-the-load as the sync path
            chain.pop(0)
        if not chain:
            return
        # late-detected miss: grow from the worst pending window, then
        # replay the chain in order (entry states stashed per window; the
        # replay is the exact synchronous grow-and-redo discipline)
        packs = [np.asarray(c["fut"].result()) for c in chain]
        worst_bins = max(int(p[0]) for p in packs)
        print(f"[DenseTSDF] async sequence verdict miss: replaying "
              f"{len(chain)} window(s) (worst bins {worst_bins})")
        self._bin_bucket = min(bin_bucket_for(worst_bins),
                               self.cfg.max_bins)
        tb = getattr(self, "_touched_bucket", self.cfg.max_touched_blocks)
        if tb < self.cfg.max_blocks:
            self._touched_bucket = min(tb * 2, self.cfg.max_blocks)
        todo, self._seq_chain = list(chain), []
        self.state = todo[0]["entry"]
        saved = self.active_submap_id
        try:
            for c in todo:
                self.active_submap_id = c["submap_id"]
                self._recast_window_sync(c["inputs"])
        finally:
            self.active_submap_id = saved

    def _settle_sequence(self):
        self._drain_seq_chain(block=True)

    def cvt_occupy_to_voxels(self):
        self.cvt_TSDF_surface_to_voxels()

    def _export_block_bucket(self):
        """Static block cap for export jits: pow2-bucketed allocated block
        count (op cost scales with the static cap, not runtime sparsity)."""
        self.resolve_deferred_fuse()
        return min(exports_ops.pow2_capacity(
            int(self.state.num_blocks) + 1, lo=64), self.cfg.max_blocks)

    def _surface_export(self, capacity):
        x, y, z, color, tsdf, n = exports_ops.tsdf_surface_export(
            self.cfg, capacity, self._export_block_bucket(), self.state,
            jnp.asarray(self.submaps_base_R_np),
            jnp.asarray(self.submaps_base_T_np),
            jnp.int32(self.active_submap_id))
        xyz = np.stack([np.array(x), np.array(y), np.array(z)], axis=1)
        return xyz, np.array(color), np.array(tsdf), int(n)

    def cvt_TSDF_surface_to_voxels(self):
        (self.export_TSDF_xyz, self.export_color, self.export_TSDF,
         self.num_TSDF_particles) = self._surface_export(
            self.max_disp_particles)

    def cvt_TSDF_surface_to_voxels_to(self, num_particles, max_disp_particles,
                                      export_TSDF_xyz, export_color):
        """Append-variant for combined global+local display
        (dense_tsdf.py:327-329). Host buffers are numpy arrays; survivors
        are compacted to the front, so appending is a slice copy."""
        xyz, color, tsdf, kept = self._surface_export(max_disp_particles)
        room = max(0, max_disp_particles - num_particles)
        copy = min(kept, room)
        if copy > 0:
            sl = slice(num_particles, num_particles + copy)
            export_TSDF_xyz[sl] = xyz[:copy]
            export_color[sl] = color[:copy]
        return num_particles + copy

    def cvt_TSDF_to_voxels_slice(self, z, dz=0.5, clear_last=True):
        x, y, zc, tsdf, color, n = exports_ops.tsdf_slice_export(
            self.cfg, self.max_disp_particles, self._export_block_bucket(),
            self.state, jnp.asarray(self.submaps_base_R_np),
            jnp.asarray(self.submaps_base_T_np),
            jnp.int32(self.active_submap_id), jnp.float32(z), jnp.float32(dz))
        self.export_TSDF_xyz = np.stack(
            [np.array(x), np.array(y), np.array(zc)], axis=1)
        self.export_TSDF = np.array(tsdf)
        self.export_color = np.array(color)
        self.num_TSDF_particles = int(n)

    def get_voxels_TSDF_surface(self):
        self.cvt_TSDF_surface_to_voxels()
        if self.enable_texture:
            return self.export_TSDF_xyz, self.export_TSDF, self.export_color
        return self.export_TSDF_xyz, self.export_TSDF, None

    def get_voxels_TSDF_slice(self, z):
        self.cvt_TSDF_to_voxels_slice(z)
        return self.export_TSDF_xyz, self.export_TSDF

    def get_voxels_occupy(self):
        self.cvt_TSDF_surface_to_voxels()
        return self.export_TSDF_xyz, self.export_color

    # ------------------------------------------------------------------
    # occupancy predicates (for raycast / topo graph)
    # ------------------------------------------------------------------
    def is_occupy_fn(self):
        """Returns a jit-safe predicate xyz -> bool over the active submap,
        matching is_occupy: TSDF < tsdf_surface_thres (dense_tsdf.py:152-155).
        """
        from taichislam_tpu.ops.raycast import make_tsdf_occupancy_fn
        return make_tsdf_occupancy_fn(self.cfg, self.state,
                                      self.active_submap_id)

    # ------------------------------------------------------------------
    # serialization (dense_tsdf.py:412-515)
    # ------------------------------------------------------------------
    def count_active(self):
        self.resolve_deferred_fuse()
        return int(exports_ops.count_active(self.cfg, self.state,
                                            jnp.int32(self.active_submap_id)))

    def to_numpy(self):
        num = self.count_active()
        cap = exports_ops.pow2_capacity(max(num, 1))
        idx, tsdf, w, occ, col, kept, _ = exports_ops.sparse_gather(
            self.cfg, cap, self._export_block_bucket(), self.state,
            jnp.int32(self.active_submap_id))
        k = int(kept)
        col_np = np.asarray(col)[:k] if self.enable_texture else np.array([])
        return (np.asarray(idx)[:k], np.asarray(tsdf)[:k],
                np.asarray(w)[:k], np.asarray(occ)[:k], col_np)

    def export_submap_async(self, lane_bucket, block_bucket,
                            submap_id=None, state=None):
        """Dispatch the bitmap-compact packed submap gather WITHOUT
        fetching it.

        ``lane_bucket`` / ``block_bucket`` are host-known upper bounds on
        the submap's observed voxel / block counts (the voxgraph async
        finalize predicts them from wire history, so the boundary costs no
        device sync; truncation is detectable in the buffer header and the
        wire worker re-gathers with grown caps). Returns the device
        buffer; decode it later — typically on a wire worker thread, where
        the fetch blocks only that thread while the main thread keeps
        dispatching the next frame window — with
        :meth:`finish_export_submap`. ``submap_id``/``state`` allow
        re-gathering an already-finalized submap (its channels are
        immutable once the collection switches past it)."""
        sid = self.active_submap_id if submap_id is None else submap_id
        return exports_ops.bitmap_gather_packed(
            self.cfg, lane_bucket, block_bucket,
            self.state if state is None else state, jnp.int32(sid))

    def finish_export_submap(self, buf, lane_bucket, block_bucket):
        """Fetch + decode an :meth:`export_submap_async` buffer into the
        same submap dict :meth:`export_submap` returns (wire schema of
        dense_tsdf.py:462-476) plus an info dict with the header counts
        (``kept_blocks/total_blocks/kept_vox/total_vox`` — ``total_* >``
        the cap means the gather truncated and must be redone bigger)."""
        indices, tsdf, w_tsdf, occupy, color, kept_b, total_b, kept_v, \
            total_v = exports_ops.unpack_bitmap_packed(
                buf, lane_bucket, block_bucket, self.cfg.grid.V,
                self.enable_texture)
        obj = {
            "indices": indices,
            "TSDF": tsdf,
            "W_TSDF": w_tsdf,
            "color": color if color.size else np.array([]),
            "occupy": occupy,
            "map_scale": [self.map_size_xy, self.map_size_z],
            "voxel_scale": self.voxel_scale,
            "texture_enabled": self.enable_texture,
            "num_voxel_per_blk_axis": self.num_voxel_per_blk_axis,
        }
        info = {"kept_blocks": kept_b, "total_blocks": total_b,
                "kept_vox": kept_v, "total_vox": total_v}
        return obj, info

    def export_submap(self):
        s = time.time()
        # packed single-fetch delivery: the five separate f32 fetches cost
        # 5 RPCs and 2-3x the bytes on a remote-attached device; the wire
        # dtypes (i16/f16/i8 — the same casts the reference applies host-
        # side, dense_tsdf.py:462-476) are applied on-device instead
        num = self.count_active()
        cap = exports_ops.pow2_capacity(max(num, 1))
        buf = exports_ops.sparse_gather_packed(
            self.cfg, cap, self._export_block_bucket(), self.state,
            jnp.int32(self.active_submap_id))
        indices, tsdf, w_tsdf, occupy, color, _, _ = \
            exports_ops.unpack_sparse_delivery(buf, cap,
                                               self.enable_texture)
        obj = {
            "indices": indices,
            "TSDF": tsdf,
            "W_TSDF": w_tsdf,
            "color": color if color.size else np.array([]),
            "occupy": occupy,
            "map_scale": [self.map_size_xy, self.map_size_z],
            "voxel_scale": self.voxel_scale,
            "texture_enabled": self.enable_texture,
            "num_voxel_per_blk_axis": self.num_voxel_per_blk_axis,
        }
        print(f"Export submap {self.active_submap_id} to numpy, voxels "
              f"{len(tsdf)/1024:.1f}k, time: {1000*(time.time()-s):.1f}ms")
        return obj

    def load_numpy(self, submap_id, indices, tsdf, w_tsdf, occ, color):
        # a pending async-window replay would reset the grid to a stashed
        # entry state and erase this load — settle first
        self._settle_sequence()
        n = len(tsdf)
        cap = exports_ops.pow2_capacity(max(n, 1))

        def pad(a, shape_tail=()):
            a = np.asarray(a, np.float32)
            out = np.zeros((cap,) + shape_tail, np.float32)
            out[:n] = a.reshape((n,) + shape_tail) if n else out[:n]
            return out

        idx_p = np.zeros((cap, 3), np.int32)
        idx_p[:n] = np.asarray(indices, np.int32)
        col = pad(color, (3,)) if (self.enable_texture and
                                   np.asarray(color).size) else \
            np.zeros((cap, 3), np.float32)
        self.state = exports_ops.sparse_scatter(
            self.cfg, self.state, jnp.int32(submap_id), jnp.asarray(idx_p),
            jnp.asarray(pad(tsdf)), jnp.asarray(pad(w_tsdf)),
            jnp.asarray(pad(occ)), jnp.asarray(col), jnp.int32(n))
        self._mark_mesh_dirty_full()

    def saveMap(self, filename):
        np.save(filename, self.export_submap())

    @staticmethod
    def loadMap(filename):
        obj = np.load(filename, allow_pickle=True).item()
        mapping = DenseTSDF(
            map_scale=obj["map_scale"], voxel_scale=obj["voxel_scale"],
            texture_enabled=obj["texture_enabled"],
            num_voxel_per_blk_axis=obj["num_voxel_per_blk_axis"],
            is_global_map=True)
        mapping.load_numpy(0, obj["indices"], obj["TSDF"], obj["W_TSDF"],
                           obj["occupy"], obj["color"])
        print(f"[SubmapMapping] Loaded {len(obj['TSDF'])} voxels from "
              f"{filename}")
        return mapping

    def input_remote_submap(self, submap):
        """dense_tsdf.py:500-515: remote submaps occupy descending slots."""
        self.remote_submap_num += 1
        idx = self.max_submap_num - self.remote_submap_num
        color = submap.get("color", np.array([]))
        self.load_numpy(idx, submap["indices"], submap["TSDF"],
                        submap["W_TSDF"], submap["occupy"], color)
        R, T = submap["pose"]
        self.set_base_pose_submap(idx, R, T)
        return idx

    # ------------------------------------------------------------------
    # submap fusion + reset
    # ------------------------------------------------------------------
    def fuse_submaps(self, submaps: "DenseTSDF"):
        """Fuse all of ``submaps``'s submaps into this (global) map
        (dense_tsdf.py:312-318). Resets first like the reference.

        Sources are block-granular: the splat lane count is
        ``source_block_cap × V³ × 7``, with the cap bucketed to the
        submap collection's allocated block count (known exactly on the
        host, so source overflow cannot happen). The global-side
        touched-tile cap still grows and redoes on overflow."""
        import dataclasses
        if hasattr(submaps, "_settle_sequence"):
            submaps._settle_sequence()   # fusion reads the source grid
        self._pending_fuse = None   # full refuse supersedes a deferred splat
        t = time.time()
        need = int(submaps.state.num_blocks) + 1
        bcap = 64
        while bcap < need:
            bcap *= 2
        # bounded by the submap grid itself — num_blocks <= max_blocks, so
        # no sources can drop (the legacy max_fuse_voxels bound was voxel-
        # granular and silently clipped sparse submap collections)
        bcap = min(bcap, submaps.cfg.max_blocks)
        touched_cap = getattr(self, "_fuse_touched_bucket",
                              self.cfg.max_touched_blocks)
        while True:
            self.reset()
            glob_cfg = dataclasses.replace(self.cfg,
                                           max_touched_blocks=touched_cap)
            # NOTE: like the reference (dense_tsdf.py:315-317), the base
            # poses used for fusion are THIS (global) map's registry, which
            # is the one PGO updates (submap_mapping.py:119).
            self.state, stats = fusion_ops.fuse_submaps(
                submaps.cfg, glob_cfg, bcap, self.state,
                submaps.state, jnp.asarray(self.submaps_base_R_np),
                jnp.asarray(self.submaps_base_T_np))
            tiles_over = int(stats.get("fuse_tiles_dropped", 0))
            if tiles_over > 0 and touched_cap < self.cfg.max_blocks:
                # target computed ONCE: recomputing it per doubling never
                # terminates ((cap + over) * 1.1 > cap for all cap)
                target = (touched_cap + tiles_over) * 11 // 10
                while touched_cap < target:
                    touched_cap *= 2
                touched_cap = min(touched_cap, self.cfg.max_blocks)
                continue
            break
        self._fuse_touched_bucket = touched_cap
        self._mark_mesh_dirty_full()
        if int(stats["fuse_dropped"]) > 0:
            print(f"[DenseTSDF] fuse sources dropped: "
                  f"{int(stats['fuse_dropped'])} (block cap)")
        self.last_stats = stats
        print(f"[DenseTSDF] Fuse submaps {(time.time()-t)*1000:.1f}ms, "
              f"active local: {submaps.active_submap_id} "
              f"remote: {submaps.remote_submap_num}")

    def fuse_submaps_incremental(self, submaps: "DenseTSDF", submap_id: int,
                                 sub_bcap=None, defer_verdict=False):
        """Splat ONE (newly finished) submap into this global map without
        resetting it. Because the trilinear weighted merge is associative
        (ops/fusion.py), fusing each submap exactly once incrementally
        yields the same global map as the reference's reset + refuse-all —
        until a PGO update moves base poses, when the caller must fall
        back to the full :meth:`fuse_submaps`. Used by
        ``SubmapMapping(incremental_fuse=True)``.

        ``sub_bcap``: host-known upper bound on the submap's OWN block
        count. The default sizes source lanes to the whole collection's
        allocated blocks (a device sync + ~Nx wasted masked lanes once N
        submaps accumulate); the voxgraph finalize passes a predicted
        per-submap bound instead. ``defer_verdict=True`` skips BOTH
        overflow readbacks (touched tiles and dropped source blocks): the
        dispatch returns immediately and the verdicts of the whole pending
        chain are fetched in one pack at :meth:`resolve_deferred_fuse`
        (called by :meth:`SubmapMapping.sync` and by every map-reading
        API), replaying the chain from the single stashed entry state on
        the (bucket-warmed, rare) overflow — same grow-and-redo discipline
        as the windowed ingest verdicts. Chaining is sound because
        finalized submaps are immutable in the collection's grid, so the
        replay re-reads them from the CURRENT collection state."""
        import dataclasses
        if hasattr(submaps, "_settle_sequence"):
            submaps._settle_sequence()   # fusion reads the source grid
        if not defer_verdict:
            # a synchronous splat on top of pending deferred ones must
            # land in order — settle the chain first
            self.resolve_deferred_fuse()
        t = time.time()
        if sub_bcap is not None:
            # caller-predicted bound is already a bucket (SubmapMapping
            # uses {1,1.25,1.5}·2^k granularity — the splat lane count is
            # bcap × V³ × 7, so re-pow2ing it here wasted up to 33%)
            bcap = min(int(sub_bcap), submaps.cfg.max_blocks)
        else:
            need = int(submaps.state.num_blocks) + 1
            bcap = 64
            while bcap < need:
                bcap *= 2
            bcap = min(bcap, submaps.cfg.max_blocks)
        touched_cap = getattr(self, "_fuse_touched_bucket",
                              self.cfg.max_touched_blocks)
        state0 = self.state
        if defer_verdict:
            glob_cfg = dataclasses.replace(self.cfg,
                                           max_touched_blocks=touched_cap)
            self.state, stats = fusion_ops.fuse_submaps(
                submaps.cfg, glob_cfg, bcap, state0,
                submaps.state, jnp.asarray(self.submaps_base_R_np),
                jnp.asarray(self.submaps_base_T_np),
                only_submap=jnp.int32(submap_id))
            if self._pending_fuse is None:
                self._pending_fuse = {"state0": state0, "fuses": []}
            self._pending_fuse["fuses"].append({
                "submap_id": submap_id, "bcap": bcap,
                "sub_cfg": submaps.cfg,
                # current-state getter, NOT a state ref: stashing each
                # boundary's collection state would pin one full grid copy
                # per pending fuse; the replay path re-reads the immutable
                # finished submap from whatever the collection holds then
                "sub_state_fn": (lambda s=submaps: s.state),
                "base_R": self.submaps_base_R_np.copy(),
                "base_T": self.submaps_base_T_np.copy(),
                "stats": stats,
            })
            self.last_stats = stats
            self._mark_mesh_dirty_full()
            return
        while True:
            glob_cfg = dataclasses.replace(self.cfg,
                                           max_touched_blocks=touched_cap)
            self.state, stats = fusion_ops.fuse_submaps(
                submaps.cfg, glob_cfg, bcap, state0,
                submaps.state, jnp.asarray(self.submaps_base_R_np),
                jnp.asarray(self.submaps_base_T_np),
                only_submap=jnp.int32(submap_id))
            tiles_over = int(stats.get("fuse_tiles_dropped", 0))
            if tiles_over > 0 and touched_cap < self.cfg.max_blocks:
                # target computed ONCE: recomputing it per doubling never
                # terminates ((cap + over) * 1.1 > cap for all cap)
                target = (touched_cap + tiles_over) * 11 // 10
                while touched_cap < target:
                    touched_cap *= 2
                touched_cap = min(touched_cap, self.cfg.max_blocks)
                continue
            break
        self._fuse_touched_bucket = touched_cap
        self.last_stats = stats
        self._mark_mesh_dirty_full()
        print(f"[DenseTSDF] Fuse submap {submap_id} incrementally "
              f"{(time.time()-t)*1000:.1f}ms")

    def resolve_deferred_fuse(self):
        """Settle the deferred incremental-fuse chain: ONE packed fetch
        reads every pending fuse's capacity verdicts (touched-tile
        overflow + dropped source blocks). If any fuse overflowed, grow
        the offending bucket(s) and replay the WHOLE chain from the single
        stashed entry state (nothing else mutates the global map between
        boundaries in incremental mode, and finished submaps are immutable
        in the collection grid, so the replay is exact)."""
        import dataclasses
        # async window-verdict chain first: every map reader routes here,
        # and a pending sequence replay must land before fuses re-read
        self._settle_sequence()
        pend = self._pending_fuse
        if pend is None:
            return
        self._pending_fuse = None
        fuses = pend["fuses"]
        pack = np.asarray(jnp.stack(
            [f["stats"]["fuse_tiles_dropped"] for f in fuses] +
            [f["stats"]["fuse_dropped"] for f in fuses]).astype(jnp.int32))
        tiles_over = pack[:len(fuses)]
        src_over = pack[len(fuses):]
        touched_cap = getattr(self, "_fuse_touched_bucket",
                              self.cfg.max_touched_blocks)
        if int(tiles_over.max(initial=0)) <= 0 and \
                int(src_over.max(initial=0)) <= 0:
            return
        worst = int(tiles_over.max(initial=0))
        target = (touched_cap + worst) * 11 // 10
        while touched_cap < target:
            touched_cap *= 2
        touched_cap = min(touched_cap, self.cfg.max_blocks)
        print(f"[DenseTSDF] deferred fuse chain replay: "
              f"{len(fuses)} fuses, tiles_over={tiles_over.tolist()} "
              f"src_over={src_over.tolist()} touched_cap={touched_cap}")
        self.state = pend["state0"]
        stats = self.last_stats
        for f, s_over in zip(fuses, src_over.tolist()):
            bcap = f["bcap"]
            target = min(bcap + s_over, f["sub_cfg"].max_blocks)
            while bcap < target:
                bcap *= 2
            bcap = min(bcap, f["sub_cfg"].max_blocks)
            # weighted TSDF fusion is not idempotent: every retry must
            # start from this fuse's entry state, never from the result a
            # failed attempt already wrote into self.state
            entry = self.state
            while True:
                glob_cfg = dataclasses.replace(
                    self.cfg, max_touched_blocks=touched_cap)
                self.state, stats = fusion_ops.fuse_submaps(
                    f["sub_cfg"], glob_cfg, bcap, entry,
                    f["sub_state_fn"](), jnp.asarray(f["base_R"]),
                    jnp.asarray(f["base_T"]),
                    only_submap=jnp.int32(f["submap_id"]))
                t_over = int(stats["fuse_tiles_dropped"])
                s2 = int(stats["fuse_dropped"])
                if t_over > 0 and touched_cap < self.cfg.max_blocks:
                    target = (touched_cap + t_over) * 11 // 10
                    while touched_cap < target:
                        touched_cap *= 2
                    touched_cap = min(touched_cap, self.cfg.max_blocks)
                    continue
                if s2 > 0 and bcap < f["sub_cfg"].max_blocks:
                    target = min(bcap + s2, f["sub_cfg"].max_blocks)
                    while bcap < target:
                        bcap *= 2
                    continue
                break
        self._fuse_touched_bucket = touched_cap
        self.last_stats = stats
        self._mark_mesh_dirty_full()

    def reset(self):
        from taichislam_tpu.core.grid import reset_grid
        # a pending deferred fuse targets the state being discarded
        self._pending_fuse = None
        self.state = reset_grid(self.state)
        self._mark_mesh_dirty_full()

    # ------------------------------------------------------------------
    # fixtures
    # ------------------------------------------------------------------
    def init_sphere(self):
        self.state = tsdf_ops.init_sphere(self.cfg, self.state,
                                          self.active_submap_id)
        self._mark_mesh_dirty_full()
