import numpy as np
import pytest

from taichislam_tpu.models.octomap import Octomap

K_DEP = np.array([40.0, 0, 32.0, 0, 40.0, 24.0, 0, 0, 1], np.float32)


def make_map(**kw):
    opts = dict(map_scale=[6.4, 3.2], voxel_scale=0.1, min_occupy_thres=2,
                max_ray_length=2.0, min_ray_length=0.3, max_blocks=256,
                max_submap_num=8, max_disp_particles=65536)
    opts.update(kw)
    m = Octomap(**opts)
    m.set_dep_camera_intrinsic(K_DEP)
    return m


def ref_counts(pts, R, T, voxel):
    """Reference hit-count map (taichi_octomap.py:116-124 semantics):
    count increment at round((R@p + T)/voxel)."""
    counts = {}
    q = pts @ np.asarray(R, np.float32).T + np.asarray(T, np.float32)
    ijk = np.trunc(q / voxel + np.where(q >= 0, 0.5, -0.5)).astype(int)
    for k in map(tuple, ijk):
        counts[k] = counts.get(k, 0) + 1
    return counts


def map_counts(m):
    from taichislam_tpu.ops.exports import voxel_ijk_all
    import numpy as np
    spec = m.cfg.grid
    ijk = np.asarray(voxel_ijk_all(spec, m.state)).reshape(-1, 3)
    occ = np.asarray(m.state.channels["occupy"]).reshape(-1)
    blk = np.asarray(m.state.block_active)
    vox_ok = np.repeat(blk, spec.voxels_per_block)
    return {tuple(i): c for i, c, ok in zip(ijk, occ, vox_ok)
            if ok and c > 0}


def test_octomap_counts_match_reference():
    m = make_map()
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.0, 1.0, size=(2000, 3)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.array([0.13, -0.21, 0.07], np.float32)
    m.recast_pcl_to_map(R, T, pts, None, len(pts))

    want = ref_counts(pts, R, T, m.voxel_scale)
    got = map_counts(m)
    # fp rounding can flip boundary-straddling points between voxels
    sym = set(got) ^ set(want)
    assert len(sym) <= max(2, 0.01 * len(want)), len(sym)
    common = set(got) & set(want)
    mismatches = sum(1 for k in common if got[k] != want[k])
    assert mismatches <= max(2, 0.01 * len(common))


def test_octomap_threshold_and_lod_export():
    m = make_map(min_occupy_thres=2)
    # 5 hits at one voxel center, 1 hit at another
    pts = np.concatenate([
        np.tile([[0.52, 0.0, 0.0]], (5, 1)),
        [[0.0, 0.52, 0.0]],
    ]).astype(np.float32)
    m.recast_pcl_to_map(np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
                        pts, None, len(pts))
    xyz, color = m.get_occupy_voxels(0)
    n = m.num_export_particles
    assert n == 1  # only the 5-hit voxel clears threshold 2
    np.testing.assert_allclose(xyz[0], [0.5, 0.0, 0.0], atol=1e-5)

    # LOD level 1 (stride K=2): the occupied voxel (5,0,0) is off-lattice
    m.cvt_occupy_to_voxels(1)
    assert m.num_export_particles == 0


def test_octomap_depth_integration():
    m = make_map()
    jj, ii = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    depth = (800 + 2 * ii).astype(np.uint16)
    m.recast_depth_to_map(np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32), depth, None)
    got = map_counts(m)
    assert len(got) > 10
    assert sum(got.values()) == 768  # every strided pixel lands in range


def test_octomap_lod_corner_subsample_semantics():
    """LOD export = corner subsample at stride K**level (the analog of the
    reference's SNode .parent(level) traversal, taichi_octomap.py:90-102):
    an occupied voxel ON the coarse lattice exports at every level it
    aligns with; its K^3 siblings are represented by that corner only."""
    m = make_map(min_occupy_thres=0, K=2)
    eye = np.eye(3, dtype=np.float32)
    # voxel (4, 0, 0): on the stride-2 AND stride-4 lattices
    on = np.tile([[0.42, 0.02, 0.02]], (3, 1)).astype(np.float32)
    # voxel (3, 1, 0): off the stride-2 lattice
    off = np.tile([[0.31, 0.11, 0.02]], (3, 1)).astype(np.float32)
    m.recast_pcl_to_map(eye, np.zeros(3, np.float32),
                        np.concatenate([on, off]), None, 6)
    for level, expect in ((0, 2), (1, 1), (2, 1)):
        m.cvt_occupy_to_voxels(level)
        assert m.num_export_particles == expect, (level,
                                                  m.num_export_particles)
    # the level-1 survivor is the on-lattice corner
    m.cvt_occupy_to_voxels(1)
    xyz, _ = m.get_occupy_voxels(1)
    np.testing.assert_allclose(xyz[0], [0.4, 0.0, 0.0], atol=1e-5)


def test_octomap_texture_bgr_to_rgb():
    """Color ingest swaps BGR -> RGB and scales /255
    (taichi_octomap.py:120-124)."""
    m = make_map(texture_enabled=True, min_occupy_thres=0)
    h, w = 48, 64
    depth = np.full((h, w), 800, np.uint16)
    tex = np.zeros((h, w, 3), np.uint8)
    tex[..., 0] = 200   # B
    tex[..., 1] = 100   # G
    tex[..., 2] = 50    # R
    m.recast_depth_to_map(np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32), depth, tex)
    m.cvt_occupy_to_voxels(0)
    n = m.num_export_particles
    assert n > 0
    xyz, color = m.get_occupy_voxels(0)
    # exported colors are RGB: R=50/255, G=100/255, B=200/255
    np.testing.assert_allclose(color[:n, 0], 50 / 255.0, atol=1e-3)
    np.testing.assert_allclose(color[:n, 1], 100 / 255.0, atol=1e-3)
    np.testing.assert_allclose(color[:n, 2], 200 / 255.0, atol=1e-3)


def test_octomap_depth_range_gating():
    """min/max ray-length gating (taichi_octomap.py:150-152): pixels
    outside [min_ray, max_ray] must not land in the map."""
    m = make_map(min_ray_length=0.5, max_ray_length=1.5)
    depth = np.full((48, 64), 200, np.uint16)      # 0.2 m < min
    depth[:, :16] = 1800                            # 1.8 m > max
    depth[:, 16:32] = 1000                          # 1.0 m: in range
    m.recast_depth_to_map(np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32), depth, None)
    got = map_counts(m)
    assert len(got) > 0
    # every landed voxel's range must be within the gate
    for k in got:
        r = np.linalg.norm(np.asarray(k, np.float32) * m.voxel_scale)
        assert 0.4 < r < 1.7, (k, r)


def test_octomap_submap_fusion_count_splat():
    """fuse_submaps adds COUNTS at the nearest global voxel through each
    submap's base pose (taichi_octomap.py:171-189)."""
    m = make_map(min_occupy_thres=0, max_submap_num=4)
    eye = np.eye(3, dtype=np.float32)
    pts = np.tile([[0.52, 0.0, 0.0]], (3, 1)).astype(np.float32)
    m.recast_pcl_to_map(eye, np.zeros(3, np.float32), pts, None, 3)
    m.switch_to_next_submap()
    m.recast_pcl_to_map(eye, np.zeros(3, np.float32), pts, None, 3)

    glob = make_map(min_occupy_thres=0, is_global_map=True,
                    map_scale=[12.8, 3.2], max_blocks=512)
    # submap 1 shifted +0.2 in x: its hits land 2 voxels over
    base_R = np.tile(eye, (m.max_submap_num, 1, 1))
    base_T = np.zeros((m.max_submap_num, 3), np.float32)
    base_T[1, 0] = 0.2
    for sid in range(2):
        glob.set_base_pose_submap(sid, base_R[sid], base_T[sid])
    glob.fuse_submaps(m)
    got = map_counts(glob)
    assert got.get((5, 0, 0)) == 3
    assert got.get((7, 0, 0)) == 3
