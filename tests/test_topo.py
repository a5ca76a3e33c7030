import numpy as np
import pytest

from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.topo_graph import (
    TopoGraphGen,
    _moller_trumbore,
    fibonacci_sphere,
)


def test_fibonacci_sphere_uniform():
    d = fibonacci_sphere(128)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # roughly isotropic: mean close to zero
    assert np.linalg.norm(d.mean(axis=0)) < 0.05


def test_moller_trumbore_hit_and_miss():
    v0 = np.array([[0.0, 0, 1]], np.float32)
    e1 = np.array([[1.0, 0, 0]], np.float32)
    e2 = np.array([[0.0, 1, 0]], np.float32)
    # ray through the triangle
    s, t = _moller_trumbore(v0, e1, e2, np.array([0.2, 0.2, 0], np.float32),
                            np.array([0, 0, 1], np.float32))
    assert bool(s[0]) and abs(t[0] - 1.0) < 1e-5
    # ray missing it
    s, t = _moller_trumbore(v0, e1, e2, np.array([2.0, 2.0, 0], np.float32),
                            np.array([0, 0, 1], np.float32))
    assert not bool(s[0])


@pytest.fixture(scope="module")
def room_map():
    """An observed free box with walls: analytic TSDF written directly."""
    m = DenseTSDF(map_scale=[6.4, 6.4], voxel_scale=0.1,
                  num_voxel_per_blk_axis=8, max_blocks=2048,
                  max_submap_num=4, max_ray_length=3.0)
    half = 12  # +-1.2m room
    r = np.arange(-half, half + 1)
    ii, jj, kk = np.meshgrid(r, r, r, indexing="ij")
    ijk = np.stack([ii, jj, kk], -1).reshape(-1, 3)
    p = ijk * 0.1
    # distance to nearest wall of the box (negative outside)
    d_wall = 1.2 - np.max(np.abs(p), axis=-1)
    tsdf = d_wall.astype(np.float32)  # >0 inside free space, 0 at wall
    m.load_numpy(0, ijk, tsdf, np.ones_like(tsdf), np.zeros(len(tsdf)),
                 np.array([]))
    return m


def test_topo_graph_on_box_room(room_map):
    topo = TopoGraphGen(room_map, coll_det_num=64, max_raycast_dist=2.0,
                        thres_size=0.2)
    n = topo.generate_topo_graph([0.0, 0.0, 0.0], max_nodes=10)
    assert n >= 1
    assert topo.num_facelets > 10
    # first node center should be near the seed
    assert np.linalg.norm(topo.nodes[0]["center"]) < 1.0
    # facelet hit distances bounded by the room + raycast range
    verts = topo.tri_vertices
    assert np.all(np.abs(verts) < 2.5)


def test_detect_collisions_black_white(room_map):
    topo = TopoGraphGen(room_map, coll_det_num=64, max_raycast_dist=2.0)
    ok = topo.detect_collisions(np.zeros(3, np.float32))
    assert ok
    # inside a 1.2m box with 2m rays: every ray hits a wall
    assert topo.black_num == 64
    assert topo.white_num == 0


def test_node_expansion_benchmark_runs(room_map, capsys):
    topo = TopoGraphGen(room_map, coll_det_num=64, max_raycast_dist=2.0)
    topo.node_expansion_benchmark([0.0, 0.0, 0.0], run_num=3)
    out = capsys.readouterr().out
    assert "avg detect_collisions" in out


@pytest.mark.slow
def test_is_near_pos_occupy_radius(room_map):
    """Cube-neighborhood occupancy (mapping_common.py:193-204): radius 0
    checks nothing (range(-0, 0) is empty — the reference's quirk,
    preserved), radius > 0 detects occupancy within [-r, r) voxels."""
    import jax.numpy as jnp
    from taichislam_tpu.ops.raycast import (
        is_near_pos_occupy, make_tsdf_occupancy_fn)

    m = room_map
    occ_fn = make_tsdf_occupancy_fn(m.cfg, m.state, jnp.int32(0))
    # find an occupied voxel position from the surface export
    m.cvt_TSDF_surface_to_voxels()
    surf = m.export_TSDF_xyz[:m.num_TSDF_particles]
    p_near = jnp.asarray(surf[0] + 0.5 * m.voxel_scale, jnp.float32)
    p_far = jnp.asarray(np.zeros(3, np.float32))  # room center, free

    assert not bool(is_near_pos_occupy(occ_fn, p_near, m.voxel_scale, 0))
    assert bool(is_near_pos_occupy(occ_fn, p_near, m.voxel_scale, 2))
    assert not bool(is_near_pos_occupy(occ_fn, p_far, m.voxel_scale, 2))
