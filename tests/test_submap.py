import numpy as np
import pytest

from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.submap_mapping import SubmapMapping
from taichislam_tpu.utils.comm import (
    CHANNEL_SUBMAP,
    CHANNEL_TRAJ,
    LoopbackTransport,
    SLAMComm,
)

K_DEP = np.array([40.0, 0, 32.0, 0, 40.0, 24.0, 0, 0, 1], np.float32)

SUB_OPTS = dict(map_scale=[6.4, 6.4], voxel_scale=0.1,
                num_voxel_per_blk_axis=8, max_ray_length=2.0,
                min_ray_length=0.3, max_blocks=512, max_bins=8192,
                max_disp_particles=65536, max_submap_num=16,
                max_fuse_voxels=1 << 15)
GLOB_OPTS = dict(map_scale=[12.8, 6.4], voxel_scale=0.1,
                 num_voxel_per_blk_axis=8, max_blocks=1024,
                 max_disp_particles=65536, is_global_map=True,
                 max_fuse_voxels=1 << 15)


def depth_frame(t=0):
    jj, ii = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    return (1000 + 20 * t + 4.0 * ii + 2.0 * jj).astype(np.uint16)


def make_sm(keyframe_step=2):
    sm = SubmapMapping(DenseTSDF, keyframe_step=keyframe_step,
                       sub_opts=SUB_OPTS, global_opts=GLOB_OPTS)
    sm.set_dep_camera_intrinsic(K_DEP)
    return sm


@pytest.fixture(scope="module")
def driven_sm():
    sm = make_sm()
    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))
    for t in range(5):
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        sm.recast_depth_to_map_by_frame(t, True, pose, ext, depth_frame(t),
                                        None)
    return sm


def test_submap_creation_policy(driven_sm):
    sm = driven_sm
    # keyframe_step=2 -> new submap on frames 0, 2, 4
    assert len(sm.submaps) == 3
    assert sm.submap_collection.active_submap_id == 2


def test_global_fusion_populated(driven_sm):
    sm = driven_sm
    assert sm.global_map.count_active() > 0
    sm.set_exporting_global()
    sm.cvt_TSDF_surface_to_voxels()
    assert sm.num_TSDF_particles > 0


def test_pgo_pose_update_moves_global(driven_sm):
    sm = driven_sm
    before = int(sm.global_map.count_active())
    # shift all keyframe poses; global map is re-fused on next keyframe
    shifted = {fid: (np.eye(3, dtype=np.float32),
                     np.array([1.0, 0, 0], np.float32))
               for fid in sm.submaps}
    sm.set_frame_poses(shifted)
    sm.local_to_global()
    after = int(sm.global_map.count_active())
    assert after > 0
    # base poses actually moved
    for fid, sid in sm.submaps.items():
        np.testing.assert_allclose(sm.global_map.submaps_base_T_np[sid],
                                   [1.0, 0, 0])
    assert abs(after - before) < max(before, after)  # sanity


def test_convert_by_pgo_chains_ego_motion():
    sm = make_sm(keyframe_step=100)
    eye = np.eye(3, dtype=np.float32)
    R0, T0 = eye, np.zeros(3, np.float32)
    sm.ego_motion_poses[0] = (R0, T0)
    sm.pgo_poses[0] = (eye, np.array([5.0, 0, 0], np.float32))
    sm.last_frame_id = 0
    R, T = sm.convert_by_pgo(1, eye, np.array([0.5, 0, 0], np.float32))
    np.testing.assert_allclose(T, [5.5, 0, 0], atol=1e-6)


def test_two_drone_submap_exchange_roundtrip():
    hub = LoopbackTransport.Hub()
    comm_a = SLAMComm(0, transport=LoopbackTransport(hub))
    comm_b = SLAMComm(1, transport=LoopbackTransport(hub))

    sm_a = make_sm()
    sm_b = make_sm()
    sm_a.map_send_handle = lambda buf: comm_a.publishBuffer(buf,
                                                            CHANNEL_SUBMAP)
    sm_a.traj_send_handle = lambda buf: comm_a.publishBuffer(buf,
                                                             CHANNEL_TRAJ)
    comm_b.on_submap = sm_b.input_remote_submap
    comm_b.on_traj = sm_b.input_remote_traj

    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))
    for t in range(3):  # keyframe_step=2 -> submap sent when frame 2 arrives
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        sm_a.recast_depth_to_map_by_frame(t, True, pose, ext, depth_frame(t),
                                          None)
    comm_b.handle()
    assert sm_b.submap_collection.remote_submap_num == 1
    # remote submap landed in the top slot and was fused globally
    top = sm_b.submap_collection.max_submap_num - 1
    assert sm_b.global_map.count_active() > 0
    assert sm_b.submaps  # frame id registered


def test_octomap_submaps():
    """SubmapMapping with the Octomap type (reference supports both)."""
    from taichislam_tpu.models.octomap import Octomap
    sm = SubmapMapping(Octomap, keyframe_step=2,
                       sub_opts=dict(map_scale=[6.4, 3.2], voxel_scale=0.1,
                                     max_blocks=256, max_submap_num=8,
                                     max_disp_particles=65536),
                       global_opts=dict(map_scale=[12.8, 3.2],
                                        voxel_scale=0.1, max_blocks=512,
                                        max_disp_particles=65536,
                                        is_global_map=True))
    sm.set_dep_camera_intrinsic(K_DEP)
    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))
    rng = np.random.default_rng(0)
    for t in range(3):
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        pcl = rng.uniform(0.4, 1.4, size=(400, 3)).astype(np.float32)
        sm.recast_pcl_to_map_by_frame(t, True, pose, ext, pcl,
                                      np.zeros((400, 3), np.float32))
    assert len(sm.submaps) == 2
    sm.set_exporting_global()
    sm.cvt_occupy_to_voxels(0)
    # hit-count threshold is 3 by default; random points rarely hit a voxel
    # 4 times, so lower-level check: the global map has allocated blocks
    assert int(sm.global_map.state.num_blocks) > 0


def test_compat_shim_imports():
    from taichi_slam.mapping import DenseTSDF as D2, SubmapMapping as S2
    from taichi_slam.utils.communication import SLAMComm as C2
    assert D2 is DenseTSDF
    assert S2 is SubmapMapping


def _decode_sent_submaps(bufs):
    import zlib
    from taichislam_tpu.models.submap_mapping import _decode_submap_npz
    return [_decode_submap_npz(zlib.decompress(b)) for b in bufs]


def test_async_finalize_matches_sync():
    """async_finalize=True (non-blocking keyframe finalize: deferred fuse
    verdict + wire worker thread) must produce, after sync(), the same
    global map and the same wire traffic as the synchronous incremental
    path — including when an under-sized touched bucket forces the
    deferred-verdict redo."""
    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))
    sent = {True: [], False: []}

    def build(async_):
        sm = SubmapMapping(DenseTSDF, keyframe_step=2, sub_opts=SUB_OPTS,
                           global_opts=GLOB_OPTS, incremental_fuse=True,
                           async_finalize=async_)
        sm.set_dep_camera_intrinsic(K_DEP)
        sm.map_send_handle = sent[async_].append
        return sm

    sm_a, sm_s = build(True), build(False)
    # force the deferred-verdict grow-and-redo path on the async side
    sm_a.global_map._fuse_touched_bucket = 1
    for t in range(6):
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        for sm in (sm_a, sm_s):
            sm.recast_depth_to_map_by_frame(t, True, pose, ext,
                                            depth_frame(t), None)
    for sm in (sm_a, sm_s):
        sm.flush()     # trailing submap; sync() happens inside for async
    assert sm_a.global_map._pending_fuse is None

    def global_dict(sm):
        idx, tsdf, w, occ, _ = sm.global_map.to_numpy()
        return {tuple(i): (t, ww) for i, t, ww in zip(idx, tsdf, w)}

    a, s = global_dict(sm_a), global_dict(sm_s)
    assert a.keys() == s.keys() and len(a) > 0
    for k in s:
        np.testing.assert_allclose(a[k], s[k], atol=1e-4)

    subs_a = _decode_sent_submaps(sent[True])
    subs_s = _decode_sent_submaps(sent[False])
    assert len(subs_a) == len(subs_s) == 3   # 2 finalized + 1 flush
    for da, ds in zip(subs_a, subs_s):
        assert da["frame_id"] == ds["frame_id"]
        assert da.keys() == ds.keys()
        order_a = np.lexsort(np.asarray(da["indices"], np.int64).T)
        order_s = np.lexsort(np.asarray(ds["indices"], np.int64).T)
        for key in ("indices", "TSDF", "W_TSDF", "occupy"):
            np.testing.assert_allclose(
                np.asarray(da[key], np.float32)[order_a],
                np.asarray(ds[key], np.float32)[order_s], atol=1e-3)


def test_async_finalize_matches_sync_octomap():
    """async_finalize with the Octomap submap type: the non-blocking
    boundary (FIFO-queued empty wire submap, reference parity with
    taichi_octomap.py export_submap -> {}, plus the incremental hit-count
    splat) must produce the same global occupancy and byte-identical wire
    traffic as the synchronous path."""
    from taichislam_tpu.models.octomap import Octomap
    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))
    sent = {True: [], False: []}
    # min_occupy_thres=0: random test clouds rarely hit a voxel 4 times,
    # and the fuse only splats over-threshold voxels
    opts = dict(sub_opts=dict(map_scale=[6.4, 3.2], voxel_scale=0.1,
                              max_blocks=256, max_submap_num=8,
                              min_occupy_thres=0,
                              max_disp_particles=65536),
                global_opts=dict(map_scale=[12.8, 3.2], voxel_scale=0.1,
                                 max_blocks=512, max_disp_particles=65536,
                                 min_occupy_thres=0, is_global_map=True))

    def build(async_):
        sm = SubmapMapping(Octomap, keyframe_step=2, async_finalize=async_,
                           **opts)
        sm.set_dep_camera_intrinsic(K_DEP)
        sm.map_send_handle = sent[async_].append
        return sm

    sm_a, sm_s = build(True), build(False)
    assert sm_a.async_finalize and sm_a.incremental_fuse
    rng = np.random.default_rng(0)
    pcls = [rng.uniform(0.4, 1.4, size=(400, 3)).astype(np.float32)
            for _ in range(6)]
    for t in range(6):
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        for sm in (sm_a, sm_s):
            sm.recast_pcl_to_map_by_frame(t, True, pose, ext, pcls[t],
                                          np.zeros((400, 3), np.float32))
    sm_a.sync()
    # both globals now hold exactly the two finalized submaps: the async
    # side via incremental splats, the sync side via reset + refuse-all
    # at each boundary (the fresh active slot is empty at boundary time)
    occ_a = np.asarray(sm_a.global_map.state.channels["occupy"])
    coords_a = np.asarray(sm_a.global_map.state.block_coords)
    occ_s = np.asarray(sm_s.global_map.state.channels["occupy"])
    coords_s = np.asarray(sm_s.global_map.state.block_coords)

    def occ_dict(occ, coords, active):
        act = np.asarray(active)
        return {tuple(coords[b]): occ[b] for b in range(len(occ) - 1)
                if act[b] and occ[b].any()}

    da = occ_dict(occ_a, coords_a, sm_a.global_map.state.block_active)
    ds = occ_dict(occ_s, coords_s, sm_s.global_map.state.block_active)
    assert da.keys() == ds.keys() and len(da) > 0
    for k in ds:
        np.testing.assert_array_equal(da[k], ds[k])

    # wire traffic: byte-identical, FIFO order (2 finalized boundaries)
    assert len(sent[True]) == len(sent[False]) == 2
    for ba, bs in zip(sent[True], sent[False]):
        assert ba == bs
    subs = _decode_sent_submaps(sent[True])
    assert [s["frame_id"] for s in subs] == [0, 2]


def test_incremental_fuse_matches_full():
    """incremental_fuse=True (splat each finished submap once into the
    non-reset global) must equal the reference's reset + refuse-all at
    every keyframe boundary, and fall back to a full refuse after a PGO
    base-pose update re-poses already-fused submaps."""
    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))

    def build(incremental):
        sm = SubmapMapping(DenseTSDF, keyframe_step=2, sub_opts=SUB_OPTS,
                           global_opts=GLOB_OPTS,
                           incremental_fuse=incremental)
        sm.set_dep_camera_intrinsic(K_DEP)
        return sm

    def global_dict(sm):
        idx, tsdf, w, occ, _ = sm.global_map.to_numpy()
        return {tuple(i): (t, ww) for i, t, ww in zip(idx, tsdf, w)}

    def check_equal():
        a, b = global_dict(sm_i), global_dict(sm_f)
        assert a.keys() == b.keys()
        for k in b:
            np.testing.assert_allclose(a[k], b[k], atol=1e-4)

    sm_i, sm_f = build(True), build(False)
    for t in range(6):
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        for sm in (sm_i, sm_f):
            sm.recast_depth_to_map_by_frame(t, True, pose, ext,
                                            depth_frame(t), None)
    check_equal()

    # PGO moves every keyframe pose: the incremental map is stale until
    # the next keyframe's fusion, which must detect dirtiness and refuse
    shifted = {fid: (eye, np.array([0.5, 0, 0], np.float32))
               for fid in sm_f.submaps}
    for sm in (sm_i, sm_f):
        sm.set_frame_poses(shifted)
    assert sm_i._fusion_dirty
    for t in range(6, 8):
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        for sm in (sm_i, sm_f):
            sm.recast_depth_to_map_by_frame(t, True, pose, ext,
                                            depth_frame(t), None)
    check_equal()


def test_deferred_fuse_in_replay_retry_is_idempotent():
    """An in-replay overflow retry must re-fuse from that fuse's ENTRY
    state, not from the partial result the failed attempt already wrote
    into self.state — weighted TSDF fusion is not idempotent, so the
    buggy form double-counts weights (advisor r4, high). We force the
    in-replay retry by under-reporting the stashed dropped-sources
    verdict so the replay's pre-grown source cap is still too small."""
    import jax.numpy as jnp
    eye = np.eye(3, dtype=np.float32)

    def rotz(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    # small blocks so the submap spans >128 source blocks: the deferred
    # attempt at sub_bcap=64 drops sources, and a pre-grow to 128 (from
    # the tampered verdict) still drops, firing the in-replay retry
    opts = dict(SUB_OPTS, num_voxel_per_blk_axis=4, max_blocks=1024)
    sub = DenseTSDF(**opts)
    sub.set_dep_camera_intrinsic(K_DEP)
    for t in range(6):
        R = rotz(t * np.pi / 3)
        T = np.array([0.2 * (t % 3), 0.2 * (t % 2), 0.1 * t], np.float32)
        sub.recast_depth_to_map(R, T, depth_frame(t), None)
    assert int(sub.state.num_blocks) > 128

    def make_glob():
        g = DenseTSDF(**GLOB_OPTS)
        g.set_base_pose_submap(0, eye, np.zeros(3, np.float32))
        return g

    g_sync = make_glob()
    g_sync.fuse_submaps_incremental(sub, 0)

    g_def = make_glob()
    g_def.fuse_submaps_incremental(sub, 0, sub_bcap=64, defer_verdict=True)
    st = g_def._pending_fuse["fuses"][0]["stats"]
    assert int(st["fuse_dropped"]) > 0, "fixture must drop sources"
    st["fuse_dropped"] = jnp.int32(1)  # pre-grow lands short (64 -> 128)
    g_def.resolve_deferred_fuse()
    assert g_def._pending_fuse is None

    def gdict(g):
        idx, tsdf, w, occ, _ = g.to_numpy()
        return {tuple(i): (t, ww) for i, t, ww in zip(idx, tsdf, w)}

    a, s = gdict(g_def), gdict(g_sync)
    assert a.keys() == s.keys() and len(a) > 0
    for k in s:
        np.testing.assert_allclose(a[k], s[k], rtol=1e-3, atol=0)


def test_async_fallback_send_preserves_fifo_order():
    """A boundary that falls back to the synchronous finalize (PGO set
    _fusion_dirty) must not let its direct send overtake queued async
    sends — peers must see submaps in boundary order (advisor r4)."""
    import time as _time
    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))
    sent = []
    sm = SubmapMapping(DenseTSDF, keyframe_step=2, sub_opts=SUB_OPTS,
                       global_opts=GLOB_OPTS, incremental_fuse=True,
                       async_finalize=True)
    sm.set_dep_camera_intrinsic(K_DEP)
    sm.map_send_handle = sent.append

    # slow the async prepare so a queue-jumping fallback send would win
    orig_prepare = sm._wire_prepare

    def slow_prepare(*a, **kw):
        # must outlast the frames between this boundary and the fallback
        # one, so the async send is still queued when the fallback fires
        _time.sleep(4.0)
        return orig_prepare(*a, **kw)

    sm._wire_prepare = slow_prepare
    for t in range(4):   # boundary at t=2 finalizes submap 0 (async)
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        sm.recast_depth_to_map_by_frame(t, True, pose, ext,
                                        depth_frame(t), None)
        if t == 2:
            # PGO touches fused poses -> next boundary takes the
            # synchronous fallback path while submap 0 is still queued
            sm.set_frame_poses({0: (eye, np.array([0.3, 0, 0],
                                                  np.float32))})
    assert sm._fusion_dirty
    sm.recast_depth_to_map_by_frame(4, True,
                                    (eye, np.array([0.4, 0, 0],
                                                   np.float32)),
                                    ext, depth_frame(4), None)
    sm.flush()
    frame_ids = [int(d["frame_id"]) for d in _decode_sent_submaps(sent)]
    assert frame_ids == sorted(frame_ids), \
        f"wire order violated: {frame_ids}"


def test_async_wire_failure_surfaces_at_sync():
    """A failed async send must raise at wire_join()/sync(), not drop the
    submap silently while the local global map keeps it (advisor r4)."""
    eye = np.eye(3, dtype=np.float32)
    ext = (eye, np.zeros(3, np.float32))
    sm = SubmapMapping(DenseTSDF, keyframe_step=2, sub_opts=SUB_OPTS,
                       global_opts=GLOB_OPTS, incremental_fuse=True,
                       async_finalize=True)
    sm.set_dep_camera_intrinsic(K_DEP)

    def broken_send(buf):
        raise IOError("transport down")

    sm.map_send_handle = broken_send
    for t in range(3):   # boundary at t=2 enqueues an async send
        pose = (eye, np.array([0.1 * t, 0, 0], np.float32))
        sm.recast_depth_to_map_by_frame(t, True, pose, ext,
                                        depth_frame(t), None)
    with pytest.raises(RuntimeError, match="async submap send"):
        sm.sync()
    # errors are consumed: a later sync() does not re-raise
    sm.sync()
