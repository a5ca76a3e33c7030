"""Multi-frame (scan-chained) ingest equivalence: recast_depth_sequence
must produce the same map state as the per-frame recast loop."""

import numpy as np
import pytest

from taichislam_tpu.models.dense_esdf import DenseESDF
from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.submap_mapping import SubmapMapping
from tests.test_tsdf import K_DEP, make_map, synthetic_depth


def _frames(n=4):
    Rs, Ts, depths = [], [], []
    for f in range(n):
        ang = 0.05 * f
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0],
                      [0, 0, 1]], np.float32)
        T = np.array([0.05 * f, -0.017, 0.111], np.float32)
        depths.append(synthetic_depth(base=1000.0 + 30.0 * f))
        Rs.append(R)
        Ts.append(T)
    return Rs, Ts, np.stack(depths)


def test_tsdf_sequence_matches_per_frame():
    Rs, Ts, depths = _frames()
    m_seq = make_map()
    m_seq.recast_depth_sequence(Rs, Ts, depths)
    m_ref = make_map()
    for R, T, d in zip(Rs, Ts, depths):
        m_ref.recast_depth_to_map(R, T, d, None)

    assert m_seq.count_active() == m_ref.count_active()
    idx_s, tsdf_s, w_s, occ_s, _ = m_seq.to_numpy()
    idx_r, tsdf_r, w_r, occ_r, _ = m_ref.to_numpy()
    ds = {tuple(i): (t, w, o) for i, t, w, o in
          zip(idx_s, tsdf_s, w_s, occ_s)}
    dr = {tuple(i): (t, w, o) for i, t, w, o in
          zip(idx_r, tsdf_r, w_r, occ_r)}
    assert ds.keys() == dr.keys()
    for k in dr:
        np.testing.assert_allclose(ds[k], dr[k], atol=1e-5)


def test_tsdf_sequence_grows_bin_bucket():
    """An undersized starting bin bucket must grow-and-redo, ending
    identical to the per-frame path (which sizes the same way)."""
    Rs, Ts, depths = _frames(2)
    m_seq = make_map()
    m_seq._bin_bucket = 2048   # too small for ~3k bins/frame: forces redo
    m_seq.recast_depth_sequence(Rs, Ts, depths)
    m_ref = make_map()
    for R, T, d in zip(Rs, Ts, depths):
        m_ref.recast_depth_to_map(R, T, d, None)
    assert int(m_seq.last_stats["max_dropped"]) == 0
    assert m_seq.count_active() == m_ref.count_active()


def _make_esdf(**kw):
    opts = dict(map_scale=[6.4, 6.4], voxel_scale=0.1,
                num_voxel_per_blk_axis=8, max_ray_length=2.0,
                min_ray_length=0.3, max_blocks=512, max_bins=8192,
                max_disp_particles=65536, max_submap_num=8,
                esdf_dense_max_voxels=0)   # force block-incremental mode
    opts.update(kw)
    m = DenseESDF(**opts)
    m.set_dep_camera_intrinsic(K_DEP)
    return m


@pytest.mark.slow
def test_esdf_sequence_matches_per_frame():
    Rs, Ts, depths = _frames(3)
    m_seq = _make_esdf(max_esdf_sweeps=6)
    m_seq.recast_depth_sequence(Rs, Ts, depths)
    m_ref = _make_esdf(max_esdf_sweeps=6)
    for R, T, d in zip(Rs, Ts, depths):
        m_ref.recast_depth_to_map(R, T, d, None)

    es = np.asarray(m_seq.esdf)
    er = np.asarray(m_ref.esdf)
    obs_s = np.asarray(m_seq.esdf_observed)
    obs_r = np.asarray(m_ref.esdf_observed)
    np.testing.assert_array_equal(obs_s, obs_r)
    np.testing.assert_allclose(es[obs_s], er[obs_r], atol=1e-5)


def test_submap_sequence_matches_per_frame():
    Rs, Ts, depths = _frames(4)
    ext = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    sub_opts = dict(map_scale=[6.4, 6.4], voxel_scale=0.1,
                    num_voxel_per_blk_axis=8, max_ray_length=2.0,
                    min_ray_length=0.3, max_blocks=512, max_bins=8192,
                    max_disp_particles=65536, max_submap_num=8)
    glob_opts = dict(sub_opts, is_global_map=True)

    def build():
        sm = SubmapMapping(submap_type=DenseTSDF, keyframe_step=2,
                           sub_opts=dict(sub_opts), global_opts=dict(glob_opts))
        sm.set_dep_camera_intrinsic(K_DEP)
        return sm

    frames = [(f, True, (Rs[f], Ts[f]), ext, depths[f], None)
              for f in range(len(Rs))]
    sm_seq = build()
    sm_seq.recast_depth_sequence(frames)
    sm_ref = build()
    for fr in frames:
        sm_ref.recast_depth_to_map_by_frame(*fr)

    assert sm_seq.frame_count == sm_ref.frame_count
    assert (sm_seq.submap_collection.get_active_submap_id() ==
            sm_ref.submap_collection.get_active_submap_id())
    assert (sm_seq.submap_collection.count_active() ==
            sm_ref.submap_collection.count_active())
    idx_s, tsdf_s, *_ = sm_seq.submap_collection.to_numpy()
    idx_r, tsdf_r, *_ = sm_ref.submap_collection.to_numpy()
    ds = {tuple(i): t for i, t in zip(idx_s, tsdf_s)}
    dr = {tuple(i): t for i, t in zip(idx_r, tsdf_r)}
    assert ds.keys() == dr.keys()
    for k in dr:
        np.testing.assert_allclose(ds[k], dr[k], atol=1e-5)


def test_async_window_verdict_matches_sync():
    """sequence_verdict_async: windows dispatch with the capacity verdict
    on a worker thread; an undersized starting bucket forces the
    late-detected miss -> whole-chain replay path. End state must equal
    the synchronous windowed path, and map readers must settle the chain
    transparently."""
    import jax.numpy as jnp
    Rs, Ts, depths = _frames(4)
    depths_dev = jnp.asarray(depths)   # device-resident (tuple fast path)

    m_async = make_map()
    m_async.sequence_verdict_async = True
    m_async._bin_bucket = 128          # forces a miss detected late
    m_async.recast_depth_sequence(Rs[:2], Ts[:2],
                                  [depths_dev[0], depths_dev[1]])
    m_async.recast_depth_sequence(Rs[2:], Ts[2:],
                                  [depths_dev[2], depths_dev[3]])

    m_ref = make_map()
    m_ref.recast_depth_sequence(Rs, Ts, depths)

    # count_active routes through resolve_deferred_fuse -> settle
    assert m_async.count_active() == m_ref.count_active()
    assert not m_async._seq_chain
    idx_s, tsdf_s, w_s, occ_s, _ = m_async.to_numpy()
    idx_r, tsdf_r, w_r, occ_r, _ = m_ref.to_numpy()
    ds = {tuple(i): (t, w, o) for i, t, w, o in
          zip(idx_s, tsdf_s, w_s, occ_s)}
    dr = {tuple(i): (t, w, o) for i, t, w, o in
          zip(idx_r, tsdf_r, w_r, occ_r)}
    assert ds.keys() == dr.keys()
    for k in dr:
        np.testing.assert_allclose(ds[k], dr[k], atol=1e-5)
