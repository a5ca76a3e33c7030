import jax.numpy as jnp
import numpy as np
import pytest

from taichislam_tpu.models.dense_tsdf import DenseTSDF
from taichislam_tpu.ops import exports as exports_ops
from tests.reference_math import RefTSDF

K_DEP = np.array([40.0, 0, 32.0, 0, 40.0, 24.0, 0, 0, 1], np.float32)


def make_map(**kw):
    opts = dict(map_scale=[6.4, 6.4], voxel_scale=0.1,
                num_voxel_per_blk_axis=8, max_ray_length=2.0,
                min_ray_length=0.3, max_blocks=512, max_bins=8192,
                max_disp_particles=65536, max_submap_num=8)
    opts.update(kw)
    m = DenseTSDF(**opts)
    m.set_dep_camera_intrinsic(K_DEP)
    return m


def synthetic_depth(h=48, w=64, base=1000.0, slope=4.0):
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    depth = base + slope * ii + 2.0 * jj
    return depth.astype(np.uint16)


def mask_boundary_pixels(depth, K, R, voxel=0.1, margin=2e-3):
    """Zero out pixels whose binned voxel coordinate sits within ``margin``
    of a rounding boundary: XLA's FMA fusion vs numpy produces last-bit
    differences that would flip bin membership there, which is fp noise, not
    semantics. With these pixels removed, bin membership must match exactly.
    """
    h, w = depth.shape
    jj, ii = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dep = depth.astype(np.float32) / 1000.0
    fx, cx, fy, cy = K[0], K[2], K[4], K[5]
    pt = np.stack([(ii - cx) * dep / fx, (jj - cy) * dep / fy, dep], -1)
    pt_map = pt @ np.asarray(R, np.float32).T
    frac = np.abs((pt_map / voxel) - np.floor(pt_map / voxel) - 0.5)
    bad = np.any(frac < margin, axis=-1)
    out = depth.copy()
    out[bad] = 0
    return out


def state_to_dicts(m):
    """Pull our sparse state into dicts keyed by voxel tuple."""
    idx, tsdf, w, occ, col = m.to_numpy()
    D = {tuple(i): t for i, t in zip(idx, tsdf)}
    W = {tuple(i): t for i, t in zip(idx, w)}
    O = {tuple(i): o for i, o in zip(idx, occ)}
    return D, W, O


@pytest.fixture(scope="module")
def fused_pair():
    R = np.eye(3, dtype=np.float32)
    T = np.array([0.053, -0.017, 0.111], np.float32)
    depth = mask_boundary_pixels(synthetic_depth(), K_DEP, R)

    m = make_map()
    m.recast_depth_to_map(R, T, depth, None)

    ref = RefTSDF(voxel=0.1, max_ray=2.0, min_ray=0.3, internal=10,
                  recast_step=2)
    ref.integrate_depth(depth, K_DEP, R, T)
    return m, ref


def test_tsdf_matches_reference_single_frame(fused_pair):
    m, ref = fused_pair
    assert int(m.last_stats["bins_dropped"]) == 0
    assert int(m.last_stats["alloc_overflow"]) == 0
    D, W, O = state_to_dicts(m)

    # step counts sit on floor() boundaries, so a tiny symmetric difference
    # from fp rounding is tolerated at ray tails; values must match on the
    # intersection
    sym = set(D.keys()) ^ set(ref.obs)
    assert len(sym) <= 0.01 * len(ref.obs), (
        f"observed sets differ: ours {len(D)} vs ref {len(ref.obs)}, "
        f"sym diff {len(sym)}")
    common = set(D.keys()) & set(ref.obs)
    err_d = max(abs(D[k] - ref.D[k]) for k in common)
    err_w = max(abs(W[k] - ref.W[k]) for k in common)
    assert err_d < 1e-4, f"max TSDF err {err_d}"
    assert err_w < 1e-2, f"max W err {err_w}"

    # endpoint occupancy flags: to_numpy only exports observed voxels (like
    # the reference's to_numpy, dense_tsdf.py:429-431), so compare against
    # the reference's endpoints restricted to its observed set
    ours_occ = {k for k, v in O.items() if v > 0}
    ref_occ = {tuple(int(x) for x in k) for k in (ref.occ & ref.obs)}
    ours_occ = {tuple(int(x) for x in k) for k in ours_occ}
    assert len(ours_occ ^ ref_occ) <= max(2, 0.01 * len(ref_occ)), \
        len(ours_occ ^ ref_occ)


def test_tsdf_two_frames_accumulate():
    R = np.eye(3, dtype=np.float32)
    depth = mask_boundary_pixels(synthetic_depth(), K_DEP, R)
    m = make_map()
    ref = RefTSDF(voxel=0.1, max_ray=2.0, min_ray=0.3, internal=10,
                  recast_step=2)
    for T in [np.zeros(3, np.float32), np.array([0.107, 0.013, -0.046], np.float32)]:
        m.recast_depth_to_map(R, T, depth, None)
        ref.integrate_depth(depth, K_DEP, R, T)
    D, W, _ = state_to_dicts(m)
    sym = set(D.keys()) ^ set(ref.obs)
    assert len(sym) <= 0.01 * len(ref.obs)
    common = set(D.keys()) & set(ref.obs)
    err_d = max(abs(D[k] - ref.D[k]) for k in common)
    assert err_d < 1e-3, f"max TSDF err {err_d}"


def test_surface_export(fused_pair):
    m, ref = fused_pair
    m.cvt_TSDF_surface_to_voxels()
    n = m.num_TSDF_particles
    assert n > 0
    xyz = m.export_TSDF_xyz[:n]
    # every exported voxel must be a surface voxel of the reference
    thres = m.tsdf_surface_thres
    ref_surface = {k for k in ref.obs
                   if abs(ref.D[k]) < thres
                   and m.disp_floor <= k[2] * 0.1 <= m.disp_ceiling}
    got = {tuple(np.round(p / 0.1).astype(int)) for p in xyz}
    sym = got ^ ref_surface
    assert len(sym) <= max(2, 0.01 * len(ref_surface)), f"sym diff {len(sym)}"


def test_export_load_roundtrip(fused_pair):
    m, _ = fused_pair
    obj = m.export_submap()
    n = m.count_active()
    assert len(obj["TSDF"]) == n
    assert obj["indices"].dtype == np.int16
    assert obj["TSDF"].dtype == np.float16

    m2 = make_map(is_global_map=True, max_submap_num=8)
    m2.load_numpy(0, obj["indices"], obj["TSDF"], obj["W_TSDF"],
                  obj["occupy"], obj["color"])
    assert m2.count_active() == n
    D1, _, _ = state_to_dicts(m)
    D2, _, _ = state_to_dicts(m2)
    for k in D1:
        assert abs(D1[k] - np.float16(D2[k])) <= 2e-3 + abs(D1[k]) * 1e-2


def test_pcl_integration_matches_depth_endpoint_binning():
    # point-cloud path: z = |R@p|, no translation applied to bins
    m = make_map()
    rng = np.random.default_rng(3)
    xyz = rng.uniform(0.4, 1.2, size=(500, 3)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.zeros(3, np.float32)
    m.recast_pcl_to_map(R, T, xyz, None)
    assert m.count_active() > 0
    D, W, O = state_to_dicts(m)
    assert any(v > 0 for v in O.values())


def test_slice_export(fused_pair):
    m, ref = fused_pair
    m.cvt_TSDF_to_voxels_slice(0.5)
    n = m.num_TSDF_particles
    kidx = int(np.trunc(0.5 / 0.1))
    ref_slice = {k for k in ref.obs if k[2] == kidx}
    assert n == len(ref_slice)
