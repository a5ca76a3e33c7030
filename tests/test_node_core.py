"""Node-core tests: the full param → staging → recast → output pipeline of
the (reference-parity) ROS node, driven WITHOUT ROS via duck-typed fake
messages. The reference's node logic (taichislam_node.py:264-318) had zero
automated coverage because it imports rospy at module level; the rebuild's
core is a plain class behind a get_param seam."""

from types import SimpleNamespace

import numpy as np
import pytest

from taichislam_tpu.node.core import TaichiSLAMNodeCore
from taichislam_tpu.utils.comm import LoopbackTransport, SLAMComm
from taichislam_tpu.utils.visualization import TaichiSLAMRender


def fake_pose(x=0.0, y=0.0, z=0.0, qw=1.0):
    return SimpleNamespace(
        position=SimpleNamespace(x=x, y=y, z=z),
        orientation=SimpleNamespace(x=0.0, y=0.0, z=0.0, w=qw))


def fake_frame(frame_id=0, is_keyframe=True, x=0.0):
    return SimpleNamespace(
        frame_id=frame_id, is_keyframe=is_keyframe,
        odom=SimpleNamespace(pose=SimpleNamespace(pose=fake_pose(x=x))),
        extrinsics=[fake_pose()])


def fake_depth_msg(h=24, w=32, value=1000):
    data = np.full((h, w), value, np.uint16)
    return SimpleNamespace(width=w, height=h, data=data.tobytes())


BASE_PARAMS = {
    "~enable_multi": False,
    "~enable_mesher": False,
    "~texture_enabled": False,
    "~mapping_type": "tsdf",
    "~map_size_xy": 6.4,
    "~map_size_z": 6.4,
    "~voxel_scale": 0.1,
    "~num_voxel_per_blk_axis": 8,
    "~max_ray_length": 1.5,
    "~output_map": True,
    "~disp/max_disp_particles": 65536,
}


def make_core(extra=None, **kw):
    params = dict(BASE_PARAMS)
    params.update(extra or {})
    return TaichiSLAMNodeCore(
        get_param=lambda name, default=None: params.get(name, default), **kw)


@pytest.mark.slow
def test_param_plumbing_builds_mapping():
    core = make_core()
    assert core.mapping_type == "tsdf"
    assert core.mapping.voxel_scale == pytest.approx(0.1)
    assert core.mapping.map_size_xy == pytest.approx(6.4)
    assert core.comm is None  # ~enable_multi False
    # octomap variant
    core2 = make_core({"~mapping_type": "octo", "K": 2})
    from taichislam_tpu.models.octomap import Octomap
    assert isinstance(core2.mapping, Octomap)


def test_stage_and_process_depth_frame():
    """Latest-wins staging + recast + output publish, with fake messages."""
    published = []
    core = make_core(
        extra={"~enable_submap": True, "~keyframe_step": 2,
               "~submap_max_disp_particles": 65536},
        publish_pointcloud=lambda xyz, col, tex: published.append(
            (np.asarray(xyz), tex)))
    # two staged frames: only the LATEST is consumed (taichislam_node:314)
    core.stage_depth(fake_frame(0), fake_depth_msg(value=800))
    core.stage_depth(fake_frame(0), fake_depth_msg(value=1000))
    assert core.updated
    core.process_taichi()
    assert core.count == 1
    assert not core.updated
    core.process_taichi()   # no new frame -> no-op
    assert core.count == 1
    assert core.mapping.submap_collection.count_active() > 0

    # output path published the surface point cloud
    assert len(published) == 1
    xyz, tex = published[0]
    assert len(xyz) > 0 and tex is False
    # surface sits near the 1.0 m wall
    assert 0.7 < np.median(xyz[:, 2]) < 1.3


def test_rendering_stages_particles():
    core = make_core(extra={"~enable_submap": True, "~keyframe_step": 1,
                            "~submap_max_disp_particles": 65536},
                     render=TaichiSLAMRender(160, 120))
    core.stage_depth(fake_frame(0), fake_depth_msg())
    core.process_taichi()
    core.rendering()
    assert core.render.par is not None and len(core.render.par) > 0
    assert core.render.drone_poses  # set_drone_pose ran


def test_rendering_slice_view():
    """enable_slice_z routes the TSDF export through the z-slice path
    (reference taichislam_node.py:303-304): particles cluster at slice_z
    instead of on the surface."""
    core = make_core(extra={"~enable_submap": True, "~keyframe_step": 1,
                            "~submap_max_disp_particles": 65536},
                     render=TaichiSLAMRender(160, 120))
    core.stage_depth(fake_frame(0), fake_depth_msg())
    core.process_taichi()
    core.mapping.set_exporting_local()   # global map is empty pre-fusion
    core.render.enable_slice_z = True
    core.render.slice_z = 1.0
    core.rendering()
    assert core.render.par is not None and len(core.render.par) > 0
    assert np.all(np.abs(core.render.par[:, 2] - 1.0) < 0.1 + 1e-6)


def test_esdf_mapping_type_end_to_end():
    """mapping_type="esdf" runs the working DenseESDF end-to-end — the
    reference silently degrades this type to plain TSDF because its
    DenseSDF bit-rotted (taichislam_node.py:216-218): frames recast, the
    incremental ESDF updates, the slice render path exports distance-field
    particles, and ~esdf/publish_slice_z publishes the slice cloud."""
    from taichislam_tpu.models.dense_esdf import DenseESDF
    published = []
    core = make_core(
        extra={"~mapping_type": "esdf", "~enable_mesher": False,
               "~esdf/publish_slice_z": 1.0},
        publish_pointcloud=lambda xyz, col, tex: published.append(
            (np.asarray(xyz), np.asarray(col), tex)),
        render=TaichiSLAMRender(160, 120))
    assert isinstance(core.mapping, DenseESDF)
    for f in range(2):
        core.stage_depth(fake_frame(f, x=0.05 * f), fake_depth_msg())
        core.process_taichi()
    assert core.mapping.count_active() > 0
    assert np.any(np.asarray(core.mapping.esdf_observed))

    # published slice cloud: output_map + ~esdf/publish_slice_z (surface
    # cloud + slice cloud per frame)
    assert len(published) == 4
    xyz, col, has_rgb = published[-1]
    assert has_rgb is True and len(xyz) > 0
    assert np.all(np.abs(xyz[:, 2] - 1.0) < 0.6 + 1e-6)   # dz=0.5 band

    # render slice path: particles cluster at slice_z, colors jet-coded
    core.render.enable_slice_z = True
    core.render.slice_z = 1.0
    core.rendering()
    assert core.render.par is not None and len(core.render.par) > 0
    assert np.all(np.abs(core.render.par[:, 2] - 1.0) < 0.6 + 1e-6)
    # ESDF slice values are finite and inside the max_ray envelope
    n = core.mapping.num_export_ESDF_particles
    vals = core.mapping.export_ESDF[:n]
    assert n > 0 and np.all(np.abs(vals) <= core.mapping.max_ray_length)


def test_traj_callback_applies_pgo_poses():
    core = make_core(extra={"~enable_submap": True, "~drone_id": 1,
                            "~keyframe_step": 1,
                            "~submap_max_disp_particles": 65536})
    core.stage_depth(fake_frame(0), fake_depth_msg())
    core.process_taichi()

    traj = SimpleNamespace(drone_id=1, frame_ids=[0],
                           poses=[fake_pose(x=0.5)])
    core.traj_callback(traj)
    assert 0 in core.mapping.pgo_poses
    np.testing.assert_allclose(core.mapping.pgo_poses[0][1],
                               [0.5, 0.0, 0.0])
    # wrong drone id is ignored
    traj2 = SimpleNamespace(drone_id=9, frame_ids=[0],
                            poses=[fake_pose(x=9.0)])
    core.traj_callback(traj2)
    np.testing.assert_allclose(core.mapping.pgo_poses[0][1],
                               [0.5, 0.0, 0.0])


@pytest.mark.slow
def test_two_cores_exchange_submaps_over_loopback():
    """Full node-level multi-drone path: core A's submap reaches core B
    through SLAMComm on the loopback transport."""
    hub = LoopbackTransport.Hub()
    comm_a = SLAMComm(0, transport=LoopbackTransport(hub))
    comm_b = SLAMComm(1, transport=LoopbackTransport(hub))
    extra = {"~enable_submap": True, "~enable_multi": True,
             "~keyframe_step": 1, "~submap_max_disp_particles": 65536}
    core_a = make_core(extra=extra, comm=comm_a)
    core_b = make_core(extra=extra, comm=comm_b)

    for f in range(3):
        core_a.stage_depth(fake_frame(f, x=0.05 * f), fake_depth_msg())
        core_a.process_taichi()
    core_b.handle_comm()
    assert core_b.mapping.submap_collection.remote_submap_num > 0
