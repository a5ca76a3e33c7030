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
