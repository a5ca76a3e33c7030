import numpy as np
import jax.numpy as jnp
import pytest

from taichislam_tpu.ops.pallas.seg_accum import (
    SENTINEL_KEY,
    segmented_block_accumulate,
)

V3 = 512  # small tile for tests


def reference(keys, w, wd, V3):
    acc = {}
    for k, wi, wdi in zip(keys, w, wd):
        if k >= SENTINEL_KEY:
            continue
        b, i = divmod(int(k), V3)
        a = acc.setdefault(b, np.zeros((2, V3), np.float32))
        a[0, i] += wi
        a[1, i] += wdi
    return acc


@pytest.mark.parametrize("n_blocks,lanes", [(5, 1024), (37, 2048), (1, 256)])
def test_segmented_accumulate_matches_reference(n_blocks, lanes):
    rng = np.random.default_rng(n_blocks)
    keys = (rng.integers(0, n_blocks, lanes) * V3 +
            rng.integers(0, V3, lanes)).astype(np.int32)
    # sprinkle invalid lanes
    inv = rng.random(lanes) < 0.1
    keys[inv] = SENTINEL_KEY
    w = rng.random(lanes).astype(np.float32)
    wd = rng.standard_normal(lanes).astype(np.float32)

    touched, acc, count = segmented_block_accumulate(
        jnp.asarray(keys), jnp.asarray(w), jnp.asarray(wd), V3,
        max_touched=64, interpret=True)
    touched = np.asarray(touched)
    acc = np.asarray(acc)
    want = reference(keys, w, wd, V3)

    assert int(count) == len(want)
    got_blocks = [int(b) for b in touched if b >= 0]
    assert got_blocks == sorted(want.keys())
    for i, b in enumerate(got_blocks):
        np.testing.assert_allclose(acc[i], want[b], atol=1e-4)


def test_segmented_accumulate_overflow():
    rng = np.random.default_rng(0)
    lanes = 512
    keys = (np.arange(lanes, dtype=np.int32) % 40) * V3  # 40 blocks
    w = np.ones(lanes, np.float32)
    wd = np.ones(lanes, np.float32)
    touched, acc, count = segmented_block_accumulate(
        jnp.asarray(keys), jnp.asarray(w), jnp.asarray(wd), V3,
        max_touched=16, interpret=True)
    assert int(count) == 40  # overflow reported
    assert int(jnp.sum(touched >= 0)) == 16


def test_block_spanning_chunks():
    # one block's lanes span multiple chunks
    lanes = 1024
    keys = np.zeros(lanes, np.int32)  # all in block 0, intra 0
    w = np.ones(lanes, np.float32)
    wd = np.full(lanes, 2.0, np.float32)
    touched, acc, count = segmented_block_accumulate(
        jnp.asarray(keys), jnp.asarray(w), jnp.asarray(wd), V3,
        max_touched=8, interpret=True)
    assert int(count) == 1
    assert int(touched[0]) == 0
    assert float(acc[0, 0, 0]) == lanes
    assert float(acc[0, 1, 0]) == 2.0 * lanes


def test_integrate_pallas_matches_xla():
    """Full integrate: Pallas accumulation (interpret) == XLA scatter path."""
    import dataclasses
    import jax
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops

    base = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                      num_voxel_per_blk_axis=8, max_ray_length=1.5,
                      min_ray_length=0.3, recast_step=2, max_blocks=64,
                      max_bins=1024, max_submap_num=4,
                      max_touched_blocks=64)
    K = jnp.asarray([20.0, 0, 16.0, 0, 20.0, 12.0, 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(7)
    depth = jnp.asarray(rng.integers(400, 1400, (24, 32)).astype(np.uint16))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.asarray([0.03, -0.01, 0.02], jnp.float32)

    outs = {}
    for mode in ("off", "on"):
        cfg = dataclasses.replace(base, pallas_accum=mode)
        st = tsdf_ops.make_tsdf_state(cfg)
        st, stats = tsdf_ops.integrate_depth(cfg, st, depth, texture, R, T,
                                             K, K, jnp.int32(0))
        outs[mode] = st
        assert int(stats["touched_dropped"]) == 0
    a, b = outs["off"], outs["on"]
    assert int(a.num_blocks) == int(b.num_blocks)
    # tolerance covers the OFF path's binning cumsum-differencing
    # cancellation (~cs*eps, up to ~5e-4 relative on bin means); the
    # Pallas path's per-bin MXU sums are exact
    np.testing.assert_allclose(np.asarray(a.channels["TSDF"]),
                               np.asarray(b.channels["TSDF"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(a.channels["W_TSDF"]),
                               np.asarray(b.channels["W_TSDF"]), rtol=2e-3,
                               atol=1e-3)
    np.testing.assert_array_equal(
        np.asarray(a.channels["TSDF_observed"]),
        np.asarray(b.channels["TSDF_observed"]))


def test_pallas_gate_rejects_incompatible_grids():
    import dataclasses
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops.tsdf import _use_pallas_accum

    # V=10 -> V3=1000 not divisible by 128 (the SubmapMapping default)
    cfg = TSDFConfig(num_voxel_per_blk_axis=10, pallas_accum="on")
    assert not _use_pallas_accum(cfg)
    cfg = TSDFConfig(num_voxel_per_blk_axis=16, pallas_accum="on")
    assert _use_pallas_accum(cfg)
    # textured configs run through the kernel too (color as 3 extra values)
    cfg = TSDFConfig(num_voxel_per_blk_axis=16, pallas_accum="on",
                     texture_enabled=True)
    assert _use_pallas_accum(cfg)


def test_fuse_submaps_pallas_matches_xla():
    """Submap fusion: Pallas path (interpret) == XLA scatter path.
    Needs 128-divisible V3 (V=8 -> 512)."""
    import dataclasses
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops, fusion as fusion_ops

    sub_cfg = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                         num_voxel_per_blk_axis=8, max_ray_length=1.5,
                         min_ray_length=0.3, recast_step=2, max_blocks=64,
                         max_bins=1024, max_submap_num=4, pallas_accum="off")
    K = jnp.asarray([20.0, 0, 16.0, 0, 20.0, 12.0, 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(3)
    depth = jnp.asarray(rng.integers(400, 1400, (24, 32)).astype(np.uint16))
    st = tsdf_ops.make_tsdf_state(sub_cfg)
    st, _ = tsdf_ops.integrate_depth(
        sub_cfg, st, depth, jnp.zeros((1, 1, 3), jnp.uint8),
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
        K, K, jnp.int32(0))

    base_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    base_T = jnp.zeros((4, 3), jnp.float32)
    outs = {}
    for mode in ("off", "on"):
        glob_cfg = TSDFConfig(map_scale=(6.4, 6.4), voxel_scale=0.1,
                              num_voxel_per_blk_axis=8, max_blocks=128,
                              max_submap_num=1, is_global_map=True,
                              pallas_accum=mode, max_touched_blocks=128)
        g = tsdf_ops.make_tsdf_state(glob_cfg)
        g, stats = fusion_ops.fuse_submaps(sub_cfg, glob_cfg, 4096, g, st,
                                           base_R, base_T)
        assert int(stats.get("fuse_tiles_dropped", 0)) == 0
        outs[mode] = g
    a, b = outs["off"], outs["on"]
    assert int(a.num_blocks) == int(b.num_blocks)
    # tolerance covers the OFF path's binning cumsum-differencing
    # cancellation (~cs*eps, up to ~5e-4 relative on bin means); the
    # Pallas path's per-bin MXU sums are exact
    np.testing.assert_allclose(np.asarray(a.channels["TSDF"]),
                               np.asarray(b.channels["TSDF"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(a.channels["W_TSDF"]),
                               np.asarray(b.channels["W_TSDF"]), rtol=2e-3,
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(a.channels["occupy"]),
                                  np.asarray(b.channels["occupy"]))


@pytest.mark.slow
def test_textured_integrate_pallas_matches_xla():
    """Textured integrate: with a CONSTANT texture, the kernel's per-frame
    weighted-mean color equals the XLA path's last-writer scatter exactly
    (every contributing lane carries the same color)."""
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops

    K = jnp.asarray([20.0, 0, 16.0, 0, 20.0, 12.0, 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(5)
    depth = jnp.asarray(rng.integers(400, 1400, (24, 32)).astype(np.uint16))
    texture = jnp.full((24, 32, 3), 120, jnp.uint8)
    outs = {}
    for mode in ("off", "on"):
        cfg = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                         num_voxel_per_blk_axis=8, max_ray_length=1.5,
                         min_ray_length=0.3, recast_step=2, max_blocks=64,
                         max_bins=1024, max_submap_num=4, pallas_accum=mode,
                         texture_enabled=True, max_touched_blocks=64)
        st = tsdf_ops.make_tsdf_state(cfg)
        st, _ = tsdf_ops.integrate_depth(
            cfg, st, depth, texture, jnp.eye(3, dtype=jnp.float32),
            jnp.zeros(3, jnp.float32), K, K, jnp.int32(0))
        outs[mode] = st
    a, b = outs["off"], outs["on"]
    # tolerance covers the OFF path's binning cancellation plus the ON
    # path's f16 sort-lane packing (see test_integrate_pallas_matches_xla)
    np.testing.assert_allclose(np.asarray(a.channels["TSDF"]),
                               np.asarray(b.channels["TSDF"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(a.channels["color"]),
                               np.asarray(b.channels["color"]), atol=2e-3)
    obs = np.asarray(a.channels["TSDF_observed"]) > 0
    col = np.asarray(a.channels["color"])
    # every observed voxel carries the constant color 120/255
    for c in range(3):
        comp = col[:, c, :][obs]
        assert np.allclose(comp, 120.0 / 255.0, atol=1e-3), comp


def test_textured_fusion_pallas_matches_xla():
    """Textured submap fusion: both paths use the identical weighted color
    merge, so results agree to fp tolerance even with varying colors."""
    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops, fusion as fusion_ops

    sub_cfg = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                         num_voxel_per_blk_axis=8, max_ray_length=1.5,
                         min_ray_length=0.3, recast_step=2, max_blocks=64,
                         max_bins=1024, max_submap_num=4, pallas_accum="off",
                         texture_enabled=True)
    K = jnp.asarray([20.0, 0, 16.0, 0, 20.0, 12.0, 0, 0, 1], jnp.float32)
    rng = np.random.default_rng(7)
    depth = jnp.asarray(rng.integers(400, 1400, (24, 32)).astype(np.uint16))
    texture = jnp.asarray(rng.integers(0, 255, (24, 32, 3)).astype(np.uint8))
    st = tsdf_ops.make_tsdf_state(sub_cfg)
    st, _ = tsdf_ops.integrate_depth(
        sub_cfg, st, depth, texture, jnp.eye(3, dtype=jnp.float32),
        jnp.zeros(3, jnp.float32), K, K, jnp.int32(0))

    base_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    base_T = jnp.zeros((4, 3), jnp.float32)
    outs = {}
    for mode in ("off", "on"):
        glob_cfg = TSDFConfig(map_scale=(6.4, 6.4), voxel_scale=0.1,
                              num_voxel_per_blk_axis=8, max_blocks=128,
                              max_submap_num=1, is_global_map=True,
                              pallas_accum=mode, max_touched_blocks=128,
                              texture_enabled=True)
        g = tsdf_ops.make_tsdf_state(glob_cfg)
        g, stats = fusion_ops.fuse_submaps(sub_cfg, glob_cfg, 64, g, st,
                                           base_R, base_T)
        assert int(stats.get("fuse_tiles_dropped", 0)) == 0
        outs[mode] = g
    a, b = outs["off"], outs["on"]
    np.testing.assert_allclose(np.asarray(a.channels["color"]),
                               np.asarray(b.channels["color"]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.channels["TSDF"]),
                               np.asarray(b.channels["TSDF"]), atol=1e-5)


@pytest.mark.slow
def test_pallas_bins_match_xla():
    """bin_points_c's Pallas per-bin segmented sums (ONE block, intra =
    bin rank, presorted) must match the XLA cumsum-differencing path;
    tolerance covers the XLA path's ~cs*eps cancellation error (the MXU
    kernel's per-segment sums are exact)."""
    import dataclasses

    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops

    cfg = TSDFConfig(map_scale=(6.4, 6.4), voxel_scale=0.1,
                     num_voxel_per_blk_axis=8, max_ray_length=2.0,
                     min_ray_length=0.3, max_blocks=256, max_bins=2048,
                     max_submap_num=4, texture_enabled=True)
    rng = np.random.default_rng(0)
    P = 3000
    pts = rng.uniform(-1.5, 1.5, (P, 3)).astype(np.float32)
    z = np.linalg.norm(pts, axis=1).astype(np.float32)
    rgb = rng.uniform(0, 255, (P, 3)).astype(np.float32)
    valid = (z > 0.3) & (z < 2.0)
    args = ([jnp.asarray(pts[:, a]) for a in range(3)] +
            [jnp.asarray(z), jnp.asarray(rgb), jnp.asarray(valid)])
    on = tsdf_ops.bin_points_c(
        dataclasses.replace(cfg, pallas_accum="on"), *args)
    off = tsdf_ops.bin_points_c(
        dataclasses.replace(cfg, pallas_accum="off"), *args)
    np.testing.assert_allclose(np.asarray(on.count), np.asarray(off.count),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(on.sum_pos),
                               np.asarray(off.sum_pos), atol=2e-3)
    np.testing.assert_allclose(np.asarray(on.sum_z), np.asarray(off.sum_z),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(on.sum_color),
                               np.asarray(off.sum_color), rtol=1e-3,
                               atol=0.3)
    assert int(on.dropped) == int(off.dropped)


def test_pallas_bins_overflow_counts():
    """Over-cap bins must be dropped (counted), never silently merged."""
    import dataclasses

    import jax.numpy as jnp

    from taichislam_tpu.core.config import TSDFConfig
    from taichislam_tpu.ops import tsdf as tsdf_ops

    cfg = TSDFConfig(map_scale=(6.4, 6.4), voxel_scale=0.1,
                     num_voxel_per_blk_axis=8, max_ray_length=2.0,
                     min_ray_length=0.05, max_blocks=256, max_bins=128,
                     max_submap_num=4, pallas_accum="on")
    rng = np.random.default_rng(1)
    P = 2000
    pts = rng.uniform(-1.0, 1.0, (P, 3)).astype(np.float32)  # ~ >128 bins
    z = np.linalg.norm(pts, axis=1).astype(np.float32)
    valid = z > 0.05
    b = tsdf_ops.bin_points_c(cfg, *[jnp.asarray(pts[:, a]) for a in
                                     range(3)],
                              jnp.asarray(z), None, jnp.asarray(valid))
    assert int(b.dropped) > 0
    assert int((np.asarray(b.count) > 0).sum()) == 128
