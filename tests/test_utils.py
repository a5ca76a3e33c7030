import os
import py_compile

import numpy as np
import pytest

from taichislam_tpu.utils.visualization import TaichiSLAMRender
from taichislam_tpu.utils import ros_pcl_transfer as rpt


def test_renderer_headless_frame(tmp_path):
    r = TaichiSLAMRender(320, 240, save_path=str(tmp_path))
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.random((500, 3)).astype(np.float32)
    r.set_particles(pts, cols)
    r.set_drone_pose(0, np.eye(3), np.zeros(3))
    r.set_drone_trajectory(0, np.cumsum(rng.normal(size=(20, 3)), axis=0))
    tris = rng.normal(size=(12, 3)).astype(np.float32)
    r.set_mesh(tris, np.ones((12, 3), np.float32) * 0.5)
    r.set_skeleton_graph_edges(rng.normal(size=(4, 3)).astype(np.float32))
    r.rendering()
    r.close()
    assert os.path.exists(tmp_path / "frame_00000.png")
    assert (tmp_path / "frame_00000.png").stat().st_size > 1000


def test_pointcloud2_codec_roundtrip():
    """Decode our own encoded PointCloud2-like message without ROS."""

    class Field:
        def __init__(self, name, offset, datatype):
            self.name, self.offset, self.datatype = name, offset, datatype
            self.count = 1

    class Msg:
        pass

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    pts[5] = np.nan  # one invalid point

    msg = Msg()
    msg.fields = [Field("x", 0, 7), Field("y", 4, 7), Field("z", 8, 7)]
    msg.point_step = 12
    msg.height, msg.width = 1, 100
    msg.data = pts.tobytes()

    arr = rpt.pointcloud2_to_array(msg)
    xyz, rgb = rpt.get_xyz_rgb_points(arr)
    assert xyz.shape == (99, 3)
    assert rgb is None
    np.testing.assert_allclose(xyz[:5], pts[:5], rtol=1e-6)


def test_packed_rgb_unpack():
    class Field:
        def __init__(self, name, offset, datatype):
            self.name, self.offset, self.datatype = name, offset, datatype

    class Msg:
        pass

    packed = np.zeros(4, np.uint32)
    packed[0] = (255 << 16) | (128 << 8) | 1
    data = np.zeros((4, 4), np.float32)
    data[:, :3] = 1.0
    data_rgb = np.empty(4, dtype=[("x", np.float32), ("y", np.float32),
                                  ("z", np.float32), ("rgb", np.float32)])
    data_rgb["x"] = data_rgb["y"] = data_rgb["z"] = 1.0
    data_rgb["rgb"] = packed.view(np.float32)

    msg = Msg()
    msg.fields = [Field("x", 0, 7), Field("y", 4, 7), Field("z", 8, 7),
                  Field("rgb", 12, 7)]
    msg.point_step = 16
    msg.height, msg.width = 1, 4
    msg.data = data_rgb.tobytes()

    xyz, rgb = rpt.pointcloud2_to_xyz_rgb_array(msg)
    assert rgb is not None
    np.testing.assert_array_equal(rgb[0], [255, 128, 1])


def test_pose_conversion_helpers():
    class Q:
        x, y, z, w = 0.0, 0.0, 0.0, 1.0

    class P:
        x, y, z = 1.0, 2.0, 3.0

    class Pose:
        orientation = Q()
        position = P()

    R, T = rpt.pose_msg_to_numpy(Pose())
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)
    np.testing.assert_allclose(T, [1, 2, 3])


def test_node_scripts_compile():
    """The ROS node can't import without rospy; it must at least compile."""
    py_compile.compile("scripts/taichislam_node.py", doraise=True)
    py_compile.compile("scripts/topo_gen_thread.py", doraise=True)
    py_compile.compile("taichislam_demo.py", doraise=True)
    py_compile.compile("examples/demo_synthetic.py", doraise=True)
    py_compile.compile("examples/gradient_descent_BA.py", doraise=True)
