"""SubmapMapping: voxgraph-style submap collection + global map.

Pure-Python orchestration mirroring
/root/reference/taichi_slam/mapping/submap_mapping.py: keyframe-driven submap
creation, PGO pose chaining (``convert_by_pgo``), local→global fusion, and
zlib/npy submap + trajectory wire exchange. Differences from the reference:

- the hard-coded debug auto-save to ``/home/xuhao/output/test_map.npy``
  (submap_mapping.py:144-145) is replaced by an optional ``autosave_path``;
- default capacities are knobs of the TPU block grid.

SECURITY / trust boundary: the reference wire format is a zlib-compressed
pickled ``np.save`` blob decoded with ``np.load(allow_pickle=True)``
(submap_mapping.py:247-259) — deserializing it executes arbitrary code, so
it must ONLY be used on a trusted network segment (the fleet's own multicast
group behind its own radio link, the reference's deployment model). This
class defaults to ``wire_format="npz"`` — plain-array ``np.savez`` decoded
with ``allow_pickle=False`` (no code execution) — and auto-detects the
format on receive: pickle-npy inbound frames are accepted only when
``wire_format="pickle"`` is explicitly selected for interop with reference
peers; otherwise they are dropped with a warning.
"""

from __future__ import annotations

import io
import threading
import time
import zlib

import numpy as np

from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.octomap import Octomap

# submap-dict scalar keys restored from 0-d arrays by the safe npz codec
_WIRE_SCALARS = {"voxel_scale": float, "texture_enabled": bool,
                 "num_voxel_per_blk_axis": int, "frame_id": int}


def _encode_submap_npz(obj) -> bytes:
    """Safe wire encoding: plain arrays only (np.savez, no pickle)."""
    flat = {}
    for k, v in obj.items():
        if k == "pose":
            flat["pose_R"] = np.asarray(v[0], np.float64)
            flat["pose_T"] = np.asarray(v[1], np.float64)
        else:
            flat[k] = np.asarray(v)
    f = io.BytesIO()
    np.savez(f, **flat)
    return f.getvalue()


def _decode_submap_npz(data: bytes) -> dict:
    with np.load(io.BytesIO(data), allow_pickle=False) as z:
        obj = {k: z[k] for k in z.files}
    if "pose_R" in obj:
        obj["pose"] = (obj.pop("pose_R"), obj.pop("pose_T"))
    for k, typ in _WIRE_SCALARS.items():
        if k in obj and obj[k].ndim == 0:
            obj[k] = typ(obj[k].item())
    if "map_scale" in obj:
        obj["map_scale"] = np.asarray(obj["map_scale"]).tolist()
    if "packed_bitmap" in obj:
        # compact wire schema (async finalize): expand the bitmap-packed
        # buffer into the standard per-voxel submap dict
        from taichislam_tpu.ops.exports import unpack_bitmap_packed
        buf = obj.pop("packed_bitmap")
        lane_cap = int(obj.pop("lane_cap"))
        blk_cap = int(obj.pop("block_cap"))
        idx, tsdf, w, occ, col, *_ = unpack_bitmap_packed(
            buf, lane_cap, blk_cap, obj["num_voxel_per_blk_axis"],
            obj["texture_enabled"])
        obj.update(indices=idx, TSDF=tsdf, W_TSDF=w, occupy=occ,
                   color=col if np.asarray(col).size else np.array([]))
    return obj


def _encode_traj_npz(traj: dict) -> bytes:
    ids = np.asarray(sorted(traj), np.int64)
    Rs = np.stack([np.asarray(traj[i][0], np.float64) for i in ids]) \
        if len(ids) else np.zeros((0, 3, 3))
    Ts = np.stack([np.asarray(traj[i][1], np.float64) for i in ids]) \
        if len(ids) else np.zeros((0, 3))
    f = io.BytesIO()
    np.savez(f, ids=ids, Rs=Rs, Ts=Ts)
    return f.getvalue()


def _decode_traj_npz(data: bytes) -> dict:
    with np.load(io.BytesIO(data), allow_pickle=False) as z:
        ids, Rs, Ts = z["ids"], z["Rs"], z["Ts"]
    return {int(i): (R, T) for i, R, T in zip(ids, Rs, Ts)}


class SubmapMapping:
    def __init__(self, submap_type=DenseTSDF, keyframe_step=20, sub_opts={},
                 global_opts={}, autosave_path=None, wire_format="npz",
                 incremental_fuse=False, async_finalize=False):
        assert wire_format in ("npz", "pickle"), wire_format
        # async_finalize (implies incremental_fuse): the keyframe finalize
        # becomes non-blocking — the submap gather and the incremental
        # global fuse are dispatched with NO host sync (DenseTSDF: gather
        # capacities are predicted from wire history, truncation is
        # re-gathered on the worker; fuse capacity verdicts chain and
        # settle in one packed fetch at :meth:`sync`. Octomap: the wire
        # submap is the reference's empty dict and the hit-count splat has
        # no verdicts, so the boundary is zero-sync by construction), and
        # the wire fetch + compress + send run on a worker thread,
        # overlapping the next frame window's device work. Call
        # :meth:`sync` before reading the global map externally or
        # asserting on sent wire traffic. Peers see identical submaps in
        # identical order (single FIFO worker); DenseTSDF ships the compact
        # ``packed_bitmap`` wire schema (~5.1 B/voxel vs 11).
        self.async_finalize = bool(async_finalize) and \
            submap_type in (DenseTSDF, Octomap)
        incremental_fuse = incremental_fuse or self.async_finalize
        self._wire_caps = None        # (lane_cap, block_cap) prediction
        self._wire_caps_lock = threading.Lock()
        self._wire_q = None
        self._wire_thread = None
        self._wire_errors = []        # failed async sends, raised at join
        # incremental local->global: splat only each newly finished submap
        # into the (non-reset) global map; a PGO base-pose update marks the
        # fusion dirty and forces the next fusion to the reference's full
        # reset + refuse-all (dense_tsdf.py:309-318, taichi_octomap.py:195).
        # Equivalence-tested in tests/test_submap.py.
        self.incremental_fuse = incremental_fuse and \
            submap_type in (DenseTSDF, Octomap)
        self._fusion_dirty = False
        self._active_in_global = False
        if submap_type == DenseTSDF:
            sdf_default_opts = {
                "map_scale": [10, 10],
                "voxel_scale": 0.05,
                "texture_enabled": False,
                "min_ray_length": 0.3,
                "max_ray_length": 3.0,
                "max_disp_particles": 1024 * 1024,
                "num_voxel_per_blk_axis": 10,
                "max_submap_num": 1000,
            }
        elif submap_type == Octomap:
            sdf_default_opts = {
                "map_scale": [10, 10],
                "voxel_scale": 0.05,
                "texture_enabled": False,
                "min_ray_length": 0.3,
                "max_ray_length": 3.0,
                "max_disp_particles": 1024 * 1024,
                "K": 2,
                "max_submap_num": 1000,
            }
        else:
            sdf_default_opts = {}
        sdf_default_opts.update(sub_opts)
        self.sub_opts = sdf_default_opts
        self.submaps = {}
        self.frame_count = 0
        self.keyframe_step = keyframe_step
        self.submap_type = submap_type
        self.exporting_global = False
        self.autosave_path = autosave_path
        self.wire_format = wire_format
        self.submap_collection = self.submap_type(**self.sub_opts)
        self.global_map = self.create_globalmap(global_opts)
        if self.async_finalize and submap_type == DenseTSDF:
            # windowed bag-replay ingest defers its per-window capacity
            # verdict to a worker thread too (models/dense_tsdf.py
            # recast_depth_sequence) — the boundary settle above keeps
            # wire exactness
            self.submap_collection.sequence_verdict_async = True
        self.first_init = True
        self.set_exporting_global()
        self.ego_motion_poses = {}
        self.pgo_poses = {}
        self.last_frame_id = None
        self.active_submap_frame_id = 0
        self.enable_texture = self.global_map.enable_texture
        self.post_local_to_global_callback = None
        self.map_send_handle = lambda buf: None
        self.traj_send_handle = lambda buf: None

    def create_globalmap(self, global_opts={}):
        if self.submap_type == DenseTSDF:
            opts = {
                "map_scale": [100, 100],
                "voxel_scale": 0.05,
                "texture_enabled": False,
                "min_ray_length": 0.3,
                "max_ray_length": 3.0,
                "max_disp_particles": 1024 * 1024,
                "num_voxel_per_blk_axis": 10,
                "max_submap_num": 1024,
                "is_global_map": True,
            }
        else:
            opts = {
                "map_scale": [100, 100],
                "voxel_scale": 0.05,
                "texture_enabled": False,
                "min_ray_length": 0.3,
                "max_ray_length": 3.0,
                "max_disp_particles": 1024 * 1024,
                "K": 2,
                "max_submap_num": 1000,
                "is_global_map": True,
            }
        opts.update(global_opts)
        return self.submap_type(**opts)

    # -- camera passthrough -------------------------------------------------
    def set_dep_camera_intrinsic(self, K):
        self.submap_collection.set_dep_camera_intrinsic(K)

    def set_color_camera_intrinsic(self, K):
        self.submap_collection.set_color_camera_intrinsic(K)

    # -- export switching (submap_mapping.py:92-107) --------------------------
    def set_exporting_global(self):
        self.exporting_global = True
        self.set_export_submap(self.global_map)

    def set_exporting_local(self):
        self.exporting_global = False
        self.set_export_submap(self.submap_collection)

    def set_export_submap(self, new_submap):
        self.export_map = new_submap

    @property
    def export_color(self):
        return self.export_map.export_color

    @property
    def export_TSDF_xyz(self):
        return self.export_map.export_TSDF_xyz

    @property
    def num_TSDF_particles(self):
        return self.export_map.num_TSDF_particles

    @property
    def export_x(self):
        return self.export_map.export_x

    @property
    def num_export_particles(self):
        return self.export_map.num_export_particles

    # -- PGO integration (submap_mapping.py:109-169) ---------------------------
    def set_frame_poses(self, frame_poses, from_remote=False):
        self.pgo_poses.update(frame_poses)
        used_poses = {}
        for frame_id in frame_poses:
            if (self.last_frame_id is None or frame_id > self.last_frame_id) \
                    and frame_id in self.ego_motion_poses:
                self.last_frame_id = frame_id
            if frame_id in self.submaps:
                R, T = frame_poses[frame_id]
                # only the global map's base pose moves with PGO, matching
                # submap_mapping.py:119 (the collection keeps its frame)
                self.global_map.set_base_pose_submap(self.submaps[frame_id],
                                                     R, T)
                used_poses[frame_id] = frame_poses[frame_id]
                # already-fused submaps moved: the incremental global map
                # is stale until the next FULL refuse
                self._fusion_dirty = True
        if not from_remote:
            self.send_traj(used_poses)

    def convert_by_pgo(self, frame_id, R, T):
        self.ego_motion_poses[frame_id] = (R, T)
        if self.last_frame_id is not None:
            last_ego_R, last_ego_T = self.ego_motion_poses[self.last_frame_id]
            last_pgo_R, last_pgo_T = self.pgo_poses[self.last_frame_id]
            R = last_pgo_R @ last_ego_R.T @ R
            T = last_pgo_R @ last_ego_R.T @ (T - last_ego_T) + last_pgo_T
        return R, T

    # -- submap lifecycle (submap_mapping.py:126-160) --------------------------
    def need_create_new_submap(self, is_keyframe, R, T):
        if self.frame_count == 0:
            return True
        if not is_keyframe:
            return False
        return self.frame_count % self.keyframe_step == 0

    def _finalize_active_submap(self):
        """Ship the finished submap to peers, advance the collection to a
        fresh slot, and refresh the fused global map."""
        finished_sid = self.submap_collection.get_active_submap_id()
        if self.async_finalize and not self._fusion_dirty and \
                not self._active_in_global:
            self._finalize_active_submap_async(finished_sid)
            return
        finished = self.submap_collection.export_submap()
        if self.async_finalize:
            # FIFO: peers must receive submaps in boundary order — drain
            # any queued async sends before this direct (fallback) one
            self.wire_join()
        self.send_submap(finished)
        self.submap_collection.switch_to_next_submap()
        self.submap_collection.clear_last_TSDF_exporting = True
        if self.incremental_fuse and not self._fusion_dirty and \
                not self._active_in_global:
            self.global_map.fuse_submaps_incremental(self.submap_collection,
                                                     finished_sid)
            if self.post_local_to_global_callback is not None:
                self.post_local_to_global_callback(self.global_map)
        else:
            # full reset + refuse-all; since the active slot is now fresh,
            # the snapshot contains exactly the finished submaps
            self.local_to_global()
            self._fusion_dirty = False
            self._active_in_global = False

    def _finalize_active_submap_async(self, finished_sid):
        """Non-blocking keyframe finalize (see ``async_finalize``).

        Steady-state boundaries pay ZERO host syncs: the bitmap-packed
        gather is dispatched with capacities predicted from the previous
        submaps' wire headers (the worker re-gathers bigger on the rare
        truncation — finished submaps stay immutable in the collection
        grid, so a late re-gather is exact), and the incremental fuse
        defers its capacity verdict into the chain settled at
        :meth:`sync`. Only the FIRST boundary fetches one packed scalar
        pair (block + voxel count) to seed the predictions."""
        import jax.numpy as jnp
        from taichislam_tpu.ops import exports as exports_ops
        col = self.submap_collection
        gm = self.global_map
        if self.submap_type == DenseTSDF:
            # pending async window verdicts must land before the finished
            # submap is snapshotted for the wire (a late replay after the
            # gather would diverge peers); steady state this is a no-op —
            # the fetches had the whole window's wall time to finish
            col._settle_sequence()
        if self.submap_type == Octomap:
            # the octomap wire submap is the reference's empty dict
            # (taichi_octomap.py:204-205) + frame_id/pose — nothing to
            # gather from the device, but the payload still rides the FIFO
            # sender so peers see boundaries in order with any queued
            # DenseTSDF-style sends
            obj = {"frame_id": self.active_submap_frame_id,
                   "pose": self.pgo_poses[self.active_submap_frame_id]}
            self._enqueue_wire_payload(obj)
            col.switch_to_next_submap()
            gm.fuse_submaps_incremental(col, finished_sid)
            if self.post_local_to_global_callback is not None:
                self.post_local_to_global_callback(gm)
            return
        if self._wire_caps is None:
            pack = np.asarray(jnp.stack([
                jnp.asarray(col.state.num_blocks, jnp.int32) + 1,
                exports_ops.count_active(
                    col.cfg, col.state, jnp.int32(col.active_submap_id))
                .astype(jnp.int32)]))
            self._wire_caps = self._predict_caps(int(pack[0]), int(pack[1]))
        lane_cap, blk_cap = self._wire_caps
        state_ref = col.state
        buf = col.export_submap_async(lane_cap, blk_cap)
        self._enqueue_wire(buf, lane_cap, blk_cap, finished_sid, state_ref,
                           self.active_submap_frame_id,
                           self.pgo_poses[self.active_submap_frame_id])
        col.switch_to_next_submap()
        col.clear_last_TSDF_exporting = True
        gm.fuse_submaps_incremental(col, finished_sid, sub_bcap=blk_cap,
                                    defer_verdict=True)
        if self.post_local_to_global_callback is not None:
            # the fused state is dispatched (eventually consistent up to
            # the rare deferred-verdict replay)
            self.post_local_to_global_callback(gm)

    def _predict_caps(self, blocks, vox):
        """Gather capacities with headroom over an observed (block, voxel)
        count, both on {1, 1.25, 1.5}·2^k buckets: the fetched wire bytes
        scale with the voxel-lane bucket (pow2's up-to-2x overshoot is
        real relay milliseconds), and the incremental-fuse splat lane
        count scales with the BLOCK bucket (block_cap × V³ × 7 lanes at
        ~10 ns/lane — a pow2 block bucket's overshoot is real fuse
        milliseconds at every keyframe boundary)."""
        from taichislam_tpu.models.dense_tsdf import bin_bucket_for
        col = self.submap_collection
        blk = min(bin_bucket_for(blocks + 1, 9, 8, lo=64), col.cfg.max_blocks)
        lane = min(max(bin_bucket_for(vox + 1, 5, 4), 8192),
                   col.cfg.max_blocks * col.cfg.grid.voxels_per_block)
        return lane, blk

    # -- wire workers (async_finalize) ----------------------------------------
    # A small thread pool overlaps the per-submap fetch + compress of
    # consecutive boundaries (each fetch is relay-latency-bound, so two
    # in flight nearly halve the pipeline); a dedicated sender thread
    # replays the finished payloads in boundary order so peers see the
    # same sequence as the synchronous path.
    def _ensure_wire_workers(self):
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor
        if self._wire_thread is None:
            self._wire_pool = ThreadPoolExecutor(
                max_workers=3, thread_name_prefix="submap-wire")
            self._wire_q = queue.Queue()
            self._wire_thread = threading.Thread(
                target=self._wire_sender, name="submap-wire-send",
                daemon=True)
            self._wire_thread.start()

    def _enqueue_wire(self, buf, lane_cap, blk_cap, sid, state_ref,
                      frame_id, pose):
        self._ensure_wire_workers()
        fut = self._wire_pool.submit(self._wire_prepare, buf, lane_cap,
                                     blk_cap, sid, state_ref, frame_id,
                                     pose)
        self._wire_q.put(fut)

    def _enqueue_wire_payload(self, obj):
        """FIFO-enqueue an already-assembled submap dict (no device fetch
        needed — the octomap boundary); encoding + compression still run
        off-thread and the bytes match the synchronous path's exactly."""
        self._ensure_wire_workers()

        def prep():
            if self.wire_format == "pickle":
                f = io.BytesIO()
                np.save(f, obj)
                raw = f.getvalue()
            else:
                raw = _encode_submap_npz(obj)
            return raw, zlib.compress(raw, 1)
        fut = self._wire_pool.submit(prep)
        self._wire_q.put(fut)

    def _wire_prepare(self, buf, lane_cap, blk_cap, sid, state_ref,
                      frame_id, pose):
        """Pool task: fetch the packed buffer (re-gathering bigger on the
        rare truncation), update the capacity predictions, and return the
        compressed wire payload."""
        col = self.submap_collection
        while True:
            buf_np = np.asarray(buf)   # ONE fetch, off-thread
            head = buf_np[:16].view(np.int32)
            total_b, total_v = int(head[1]), int(head[3])
            if total_b <= blk_cap and total_v <= lane_cap:
                break
            # truncated: re-gather the (immutable) submap bigger
            lane_cap, blk_cap = self._predict_caps(total_b, total_v)
            print(f"[SubmapMapping] wire re-gather submap {sid}: "
                  f"{total_b} blocks / {total_v} voxels")
            buf = col.export_submap_async(lane_cap, blk_cap,
                                          submap_id=sid, state=state_ref)
        # grow-only prediction update for the next boundary (locked:
        # up to 3 pool threads race this read-modify-write, and a lost
        # update could shrink the grow-only prediction)
        cand = self._predict_caps(total_b, total_v)
        with self._wire_caps_lock:
            cur = self._wire_caps or (0, 0)
            self._wire_caps = (max(cand[0], cur[0]), max(cand[1], cur[1]))
        if self.wire_format == "pickle":
            # interop mode keeps the expanded per-voxel pickle schema
            obj, _ = col.finish_export_submap(buf_np, lane_cap, blk_cap)
            obj["frame_id"] = frame_id
            obj["pose"] = pose
            f = io.BytesIO()
            np.save(f, obj)
            raw = f.getvalue()
        else:
            obj = {
                "packed_bitmap": buf_np,
                "lane_cap": np.int64(lane_cap),
                "block_cap": np.int64(blk_cap),
                "map_scale": [col.map_size_xy, col.map_size_z],
                "voxel_scale": col.voxel_scale,
                "texture_enabled": col.enable_texture,
                "num_voxel_per_blk_axis": col.num_voxel_per_blk_axis,
                "frame_id": frame_id,
                "pose": pose,
            }
            raw = _encode_submap_npz(obj)
        return raw, zlib.compress(raw, 1)

    def _wire_sender(self):
        while True:
            fut = self._wire_q.get()
            try:
                raw, compressed = fut.result()
                self.map_send_handle(compressed)
                print(f"[SubmapMapping] Send submap with "
                      f"{len(raw)/1024:.1f} kB, compressed "
                      f"{len(compressed)/1024:.1f}kB (async wire)")
            except Exception as e:   # keep the sender alive; surface the
                # failure at wire_join()/sync() — a silently dropped send
                # would diverge peers from the local global map
                print(f"[SubmapMapping] wire worker error: {e!r}")
                self._wire_errors.append(e)
            finally:
                self._wire_q.task_done()

    def wire_join(self):
        """Block until every enqueued submap has been fetched + sent.

        Raises if any async send failed: peers would otherwise silently
        never receive a submap the local global map already contains."""
        if self._wire_q is not None:
            self._wire_q.join()
        if self._wire_errors:
            errs, self._wire_errors = self._wire_errors, []
            raise RuntimeError(
                f"{len(errs)} async submap send(s) failed; peers are "
                f"missing those submaps: {errs[0]!r}") from errs[0]

    def sync(self):
        """Quiesce the async finalize machinery: drain the wire worker and
        settle the deferred fuse-verdict chain. Call before reading the
        global map from outside or asserting on sent wire traffic."""
        self.wire_join()
        self.global_map.resolve_deferred_fuse()

    def create_new_submap(self, frame_id, R, T):
        if not self.first_init:
            self._finalize_active_submap()
        self.first_init = False

        sid = self.submap_collection.get_active_submap_id()
        for m in (self.global_map, self.submap_collection):
            m.set_base_pose_submap(sid, R, T)
        self.pgo_poses[frame_id] = (R, T)
        self.submaps[frame_id] = sid
        self.active_submap_frame_id = frame_id
        print(f"[SubmapMapping] Created new submap on frame {frame_id}, "
              f"now have {sid+1} submaps")
        if self.autosave_path is not None and sid % 2 == 0:
            self.saveMap(self.autosave_path)
        return self.submap_collection

    def local_to_global(self):
        self.global_map.fuse_submaps(self.submap_collection)
        # the fused snapshot may include the (partial) active submap; an
        # incremental splat of that submap at its finalize would then
        # double-count — record it so finalize falls back to a full refuse
        self._active_in_global = True
        if self.post_local_to_global_callback is not None:
            self.post_local_to_global_callback(self.global_map)

    # -- frame ingestion (submap_mapping.py:171-200) ---------------------------
    def recast_depth_to_map_by_frame(self, frame_id, is_keyframe, pose, ext,
                                     depthmap, texture):
        R, T = pose
        R_ext, T_ext = ext
        R, T = self.convert_by_pgo(frame_id, R, T)
        if self.need_create_new_submap(is_keyframe, R, T):
            self.create_new_submap(frame_id, R, T)
        Rcam = R @ R_ext
        Tcam = T + R @ T_ext
        self.submap_collection.recast_depth_to_map(Rcam, Tcam, depthmap,
                                                   texture)
        self.frame_count += 1

    def recast_depth_sequence(self, frames):
        """Batch ingest for bag replay: ``frames`` is an iterable of the
        per-frame call tuples ``(frame_id, is_keyframe, (R, T),
        (R_ext, T_ext), depthmap, texture)``. Frames between keyframe
        boundaries are fused through the map's single-dispatch
        ``recast_depth_sequence`` window (ops/sequence.py); the submap
        lifecycle (create/finalize/global fusion) runs at the split
        points exactly as in the per-frame path."""
        run = {"R": [], "T": [], "depth": [], "tex": []}

        def _stack(frames):
            # device-resident frames stay on device AND unstacked: the
            # sequence ops stack tuples IN-GRAPH, so the window costs one
            # dispatch instead of stack + dispatch (np.stack would fetch
            # each frame through the link and re-upload the stack)
            import jax
            if isinstance(frames[0], jax.Array):
                return tuple(frames)
            return np.stack(frames)

        def flush():
            if not run["R"]:
                return
            tex = (_stack(run["tex"])
                   if run["tex"] and run["tex"][0] is not None else None)
            self.submap_collection.recast_depth_sequence(
                run["R"], run["T"], _stack(run["depth"]), tex)
            for v in run.values():
                v.clear()

        for frame_id, is_keyframe, pose, ext, depthmap, texture in frames:
            R, T = self.convert_by_pgo(frame_id, *pose)
            if self.need_create_new_submap(is_keyframe, R, T):
                flush()
                self.create_new_submap(frame_id, R, T)
            R_ext, T_ext = ext
            run["R"].append(R @ R_ext)
            run["T"].append(T + R @ T_ext)
            run["depth"].append(depthmap)
            run["tex"].append(texture)
            self.frame_count += 1
        flush()

    def recast_pcl_to_map_by_frame(self, frame_id, is_keyframe, pose, ext,
                                   pcl, rgb_array):
        R, T = pose
        R, T = self.convert_by_pgo(frame_id, R, T)
        R_ext, T_ext = ext
        if self.need_create_new_submap(is_keyframe, R, T):
            self.create_new_submap(frame_id, R, T)
        Rcam = R @ R_ext
        Tcam = T + R @ T_ext
        if self.submap_type == Octomap:
            self.submap_collection.recast_pcl_to_map(Rcam, Tcam, pcl,
                                                     rgb_array, len(pcl))
        else:
            self.submap_collection.recast_pcl_to_map(Rcam, Tcam, pcl,
                                                     rgb_array)
        self.frame_count += 1

    def recast_depth_to_map(self, R, T, depthmap, texture):
        if self.need_create_new_submap(True, R, T):
            self.create_new_submap(self.frame_count, R, T)
        self.submap_collection.recast_depth_to_map(R, T, depthmap, texture)
        self.frame_count += 1

    # -- display (submap_mapping.py:202-224) ----------------------------------
    def cvt_TSDF_to_voxels_slice(self, z):
        self.export_map.cvt_TSDF_to_voxels_slice(z)

    def cvt_TSDF_surface_to_voxels(self):
        if len(self.submaps) > 0:
            if self.exporting_global:
                self.global_map.cvt_TSDF_surface_to_voxels()
                n = self.submap_collection.cvt_TSDF_surface_to_voxels_to(
                    self.global_map.num_TSDF_particles,
                    self.global_map.max_disp_particles,
                    self.global_map.export_TSDF_xyz,
                    self.global_map.export_color)
                self.global_map.num_TSDF_particles = n
            else:
                self.submap_collection.cvt_TSDF_surface_to_voxels()

    def cvt_occupy_to_voxels(self, level):
        if self.exporting_global:
            self.global_map.cvt_occupy_to_voxels(level)
            n = self.submap_collection.cvt_occupy_voxels_to(
                level, self.global_map.num_export_particles,
                self.global_map.max_disp_particles,
                self.global_map.export_x, self.global_map.export_color)
            self.global_map.num_export_particles = n
        else:
            self.submap_collection.cvt_occupy_to_voxels(level)

    # -- wire exchange (submap_mapping.py:226-261) -----------------------------
    def send_submap(self, submap):
        submap["frame_id"] = self.active_submap_frame_id
        submap["pose"] = self.pgo_poses[self.active_submap_frame_id]
        self._encode_and_send_submap(submap)

    def _encode_and_send_submap(self, submap):
        if self.wire_format == "pickle":
            f = io.BytesIO()
            np.save(f, submap)
            raw = f.getvalue()
        else:
            raw = _encode_submap_npz(submap)
        s = time.time()
        compressed = zlib.compress(raw, 1)
        self.map_send_handle(compressed)
        print(f"[SubmapMapping] Send submap with {len(raw)/1024.0:.1f} kB, "
              f"compressed {len(compressed)/1024:.1f}kB compress cost "
              f"{(time.time()-s)*1000:.1f}ms")

    def send_traj(self, traj):
        if self.wire_format == "pickle":
            f = io.BytesIO()
            np.save(f, traj)
            raw = f.getvalue()
        else:
            raw = _encode_traj_npz(traj)
        compressed = zlib.compress(raw, 1)
        self.traj_send_handle(compressed)

    # Decompression bomb guard: a small hostile datagram may zlib-expand
    # without bound; cap the plaintext at a generous multiple of any real
    # submap (full-capacity f32 channels are ~tens of MB).
    MAX_WIRE_PLAINTEXT = 256 * 1024 * 1024

    def _decode_wire(self, buf, npz_decoder, what):
        """Auto-detect the inbound format; pickle-npy is only deserialized
        when wire_format="pickle" was explicitly chosen (trust boundary —
        see module docstring)."""
        d = zlib.decompressobj()
        raw = d.decompress(buf, self.MAX_WIRE_PLAINTEXT)
        if d.unconsumed_tail:
            raise ValueError(
                f"{what} payload exceeds {self.MAX_WIRE_PLAINTEXT} B "
                "decompressed (bomb guard)")
        if raw[:2] == b"PK":                      # npz zip magic: safe path
            return npz_decoder(raw)
        if raw[:6] == b"\x93NUMPY":
            if self.wire_format != "pickle":
                print(f"[SubmapMapping] DROPPED pickle-npy {what} from the "
                      "wire: wire_format='npz' refuses pickled payloads "
                      "(set wire_format='pickle' for reference-peer interop "
                      "on a trusted network)")
                return None
            return np.load(io.BytesIO(raw), allow_pickle=True).item()
        print(f"[SubmapMapping] DROPPED unrecognized {what} payload")
        return None

    def input_remote_submap(self, buf):
        print(f"[SubmapMapping] Recv submap with {len(buf)/1024:.1f} kB")
        submap = self._decode_wire(buf, _decode_submap_npz, "submap")
        if submap is None:
            return
        idx = self.submap_collection.input_remote_submap(submap)
        self.global_map.set_base_pose_submap(idx, submap["pose"][0],
                                             submap["pose"][1])
        if self.incremental_fuse and not self._fusion_dirty:
            self.global_map.fuse_submaps_incremental(self.submap_collection,
                                                     idx)
            if self.post_local_to_global_callback is not None:
                self.post_local_to_global_callback(self.global_map)
        else:
            self.local_to_global()
            self._fusion_dirty = False
        self.submaps[submap["frame_id"]] = idx

    def input_remote_traj(self, buf):
        traj = self._decode_wire(buf, _decode_traj_npz, "traj")
        if traj is None:
            return
        self.set_frame_poses(traj, True)
        print(f"[SubmapMapping] Recv traj with {len(traj)} poses "
              f"{len(buf)/1024.0:.1f} kB")

    def flush(self):
        """Export + broadcast the still-active submap (shutdown flush).

        The reference leaks the trailing submap when the node ends: a submap
        is only sent when the NEXT one is created (create_new_submap), so
        work since the last keyframe boundary never reaches peers. Call this
        when ingestion ends.
        """
        if self.frame_count == 0 or self.first_init:
            return
        self.sync()   # earlier async sends must precede the trailing one
        self.send_submap(self.submap_collection.export_submap())

    def saveMap(self, filename):
        self.global_map.saveMap(filename)

    def export_submap(self):
        return self.submap_collection.export_submap()
