import numpy as np
import pytest

from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.models.mesher import MarchingCubeMesher
from taichislam_tpu.ops.marching_cubes import tet_tri_tables


def test_tet_tables_shape_and_symmetry():
    ntri, edges = tet_tri_tables()
    ntri = np.asarray(ntri)
    edges = np.asarray(edges)
    assert ntri.shape == (6, 16)
    # empty cases emit nothing; single-corner cases emit 1; two-corner 2
    for t in range(6):
        assert ntri[t, 0] == 0 and ntri[t, 15] == 0
        for case in range(1, 15):
            pop = bin(case).count("1")
            assert ntri[t, case] == (1 if pop in (1, 3) else 2)
    # every used edge entry references valid cube corners
    used = edges[edges >= 0]
    assert used.min() >= 0 and used.max() <= 7


@pytest.fixture(scope="module")
def sphere_mesh():
    m = DenseTSDF(map_scale=[6.4, 6.4], voxel_scale=0.1,
                  num_voxel_per_blk_axis=8, max_blocks=256,
                  max_submap_num=4, texture_enabled=True)
    m.init_sphere()
    mesher = MarchingCubeMesher(m, max_triangles=20000)
    mesher.generate_mesh(1)
    return m, mesher


def test_sphere_mesh_geometry(sphere_mesh):
    m, mesher = sphere_mesh
    n = mesher.num_facelets
    assert n > 50
    verts = mesher.mesh_vertices[:n * 3]
    radius = m.voxel_scale * 3
    dist = np.linalg.norm(verts, axis=-1)
    # all vertices lie near the analytic sphere surface
    assert np.max(np.abs(dist - radius)) < m.voxel_scale * 1.1, (
        np.max(np.abs(dist - radius)))


def test_sphere_mesh_normals_outward(sphere_mesh):
    m, mesher = sphere_mesh
    n = mesher.num_facelets
    verts = mesher.mesh_vertices[:n * 3]
    norms = mesher.mesh_normals[:n * 3]
    radial = verts / np.maximum(np.linalg.norm(verts, axis=-1, keepdims=True),
                                1e-9)
    cos = np.sum(norms * radial, axis=-1)
    # central-difference normals should align with outward radial direction
    assert np.mean(cos > 0.7) > 0.95, np.mean(cos > 0.7)


def test_sphere_mesh_winding_consistent(sphere_mesh):
    m, mesher = sphere_mesh
    n = mesher.num_facelets
    v = mesher.mesh_vertices[:n * 3].reshape(n, 3, 3)
    geom_n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    norm = np.linalg.norm(geom_n, axis=-1)
    ok = norm > 1e-9
    geom_n = geom_n[ok] / norm[ok][:, None]
    center = v[ok].mean(axis=1)
    radial = center / np.maximum(np.linalg.norm(center, axis=-1,
                                                keepdims=True), 1e-9)
    cos = np.sum(geom_n * radial, axis=-1)
    # winding (cross product) agrees with outward direction
    assert np.mean(cos > 0) > 0.97, np.mean(cos > 0)


def test_mesh_cap():
    m = DenseTSDF(map_scale=[6.4, 6.4], voxel_scale=0.1,
                  num_voxel_per_blk_axis=8, max_blocks=256, max_submap_num=4)
    m.init_sphere()
    mesher = MarchingCubeMesher(m, max_triangles=10)
    mesher.generate_mesh(1)
    assert mesher.num_facelets == 10
    assert mesher.total_triangles > 10


def _triangle_rows(mesher):
    """Canonicalized live triangles: (T, 27) rows of vertex|normal|color,
    degenerate pad triangles (all three vertices coincide) dropped,
    lexicographically sorted so buffer layout doesn't matter."""
    n = mesher.num_facelets
    v = mesher.mesh_vertices[:n * 3].reshape(n, 3, 3)
    nr = mesher.mesh_normals[:n * 3].reshape(n, 3, 3)
    c = mesher.mesh_colors[:n * 3].reshape(n, 3, 3)
    live = ~(np.all(v[:, 0] == v[:, 1], axis=-1) &
             np.all(v[:, 0] == v[:, 2], axis=-1))
    rows = np.concatenate([v[live].reshape(-1, 9), nr[live].reshape(-1, 9),
                           c[live].reshape(-1, 9)], axis=1)
    return rows[np.lexsort(rows.T[::-1])]


@pytest.mark.slow
def test_incremental_mesh_matches_full():
    """Patch-meshing over a depth sequence == full re-mesh, bit-exact
    (per-block extraction reads the full map, so patched spans are
    identical triangles; only buffer order differs). The sequence carves
    a receding wall so blocks both gain and LOSE surface (span adds,
    rewrites, and removals all exercised)."""
    m = DenseTSDF(map_scale=[6.4, 6.4], voxel_scale=0.1,
                  num_voxel_per_blk_axis=8, max_blocks=256,
                  max_submap_num=4, max_bins=4096)
    K = np.array([40.0, 0, 32.0, 0, 40.0, 24.0, 0, 0, 1], np.float32)
    m.set_dep_camera_intrinsic(K)
    inc = MarchingCubeMesher(m, max_triangles=60000)
    assert inc.incremental
    eye = np.eye(3, dtype=np.float32)
    rng = np.random.default_rng(5)
    checked = 0
    for f in range(12):
        if f < 6:
            # wall at ~1.2 m with ripple, sensor strafing
            z = 1200 + 40 * rng.integers(-1, 2, size=(48, 64))
        else:
            # wall recedes to ~2.2 m: near blocks carve free
            z = 2200 + 40 * rng.integers(-1, 2, size=(48, 64))
        T = np.array([0.03 * f, 0.0, 0.0], np.float32)
        m.recast_depth_to_map(eye, T, z.astype(np.uint16), None)
        inc.generate_mesh(1)
        if f in (0, 3, 6, 11):
            ref = MarchingCubeMesher(m, max_triangles=60000,
                                     incremental=False)
            ref.generate_mesh(1)
            got, want = _triangle_rows(inc), _triangle_rows(ref)
            assert got.shape == want.shape, (f, got.shape, want.shape)
            np.testing.assert_array_equal(got, want, err_msg=f"frame {f}")
            checked += 1
    assert checked == 4
    # spans bookkeeping consistent with live triangles
    assert inc._live_tris == sum(sp[2] for sp in inc._spans.values())
    assert inc._alloc_end <= inc._buf_tris()


def test_incremental_mesh_noop_when_clean():
    """A generate_mesh call with no intervening map change is a no-op
    (the node calls generate_mesh(1) every consumed frame; clean frames
    must not pay the 17.9 ms full extraction)."""
    m = DenseTSDF(map_scale=[6.4, 6.4], voxel_scale=0.1,
                  num_voxel_per_blk_axis=8, max_blocks=256,
                  max_submap_num=4)
    m.init_sphere()
    mesher = MarchingCubeMesher(m, max_triangles=20000)
    mesher.generate_mesh(1)
    n0 = mesher.num_facelets
    v0 = mesher.mesh_vertices.copy()
    full, bitmap = m._mesh_dirty_full, m._mesh_dirty
    assert not full and bitmap is None     # consumed by the first mesh
    mesher.generate_mesh(1)                # clean: early-out
    assert mesher.num_facelets == n0
    np.testing.assert_array_equal(mesher.mesh_vertices, v0)


def test_quantized_delivery_matches_f32(sphere_mesh):
    # the default "quantized" delivery (one 12-byte/vertex wire buffer)
    # must reproduce the f32 arrays to quantization tolerance: 0.5 mm
    # vertices, 1/127 normal components, 1/255 colors
    m, mesher = sphere_mesh
    assert mesher.delivery == "quantized"
    ref = MarchingCubeMesher(m, max_triangles=20000, delivery="f32")
    ref.generate_mesh(1)
    n = mesher.num_facelets * 3
    assert ref.num_facelets == mesher.num_facelets
    assert np.max(np.abs(mesher.mesh_vertices[:n] -
                         ref.mesh_vertices[:n])) <= 5.1e-4
    assert np.max(np.abs(mesher.mesh_normals[:n] -
                         ref.mesh_normals[:n])) <= 1.0 / 127 + 1e-6
    assert np.max(np.abs(mesher.mesh_colors[:n] -
                         ref.mesh_colors[:n])) <= 1.0 / 255 + 1e-6
    # dead tail keeps the reference's -1e6 fill
    assert np.all(mesher.mesh_vertices[n:] == -1000000.0) or \
        len(mesher.mesh_vertices) == n
