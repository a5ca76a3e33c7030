import jax
import jax.numpy as jnp
import numpy as np
import pytest

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.ops import tsdf as tsdf_ops
from taichislam_tpu.ops import fusion as fusion_ops
from taichislam_tpu.core.grid import allocate_from_touched
from taichislam_tpu.parallel.mesh import make_mesh
from taichislam_tpu.parallel.multi_drone import (
    make_drone_states,
    multi_drone_step,
)

SUB_CFG = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                     num_voxel_per_blk_axis=8, max_ray_length=1.5,
                     min_ray_length=0.3, recast_step=2, max_blocks=64,
                     max_bins=1024, max_submap_num=4)
GLOB_CFG = TSDFConfig(map_scale=(6.4, 6.4), voxel_scale=0.1,
                      num_voxel_per_blk_axis=8, max_ray_length=1.5,
                      max_blocks=128, max_submap_num=1, is_global_map=True)

K = jnp.asarray([20.0, 0, 16.0, 0, 20.0, 12.0, 0, 0, 1], jnp.float32)


def drone_inputs(n):
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.integers(400, 1400, size=(n, 24, 32))
                        .astype(np.uint16))
    R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    T = jnp.asarray(np.linspace(0, 0.5, 3 * n, dtype=np.float32).reshape(n, 3))
    return depth, R, T


def test_multi_drone_step_8_devices():
    mesh = make_mesh(8, "drone")
    dstates = make_drone_states(SUB_CFG, 8)
    gstate = tsdf_ops.make_tsdf_state(GLOB_CFG)
    depth, R, T = drone_inputs(8)
    base_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    base_T = jnp.zeros((4, 3), jnp.float32)
    step = multi_drone_step(SUB_CFG, GLOB_CFG, 64, mesh)
    dstates, gstate = step(dstates, gstate, depth, R, T, K, base_R, base_T)
    assert int(gstate.num_blocks) > 0
    # each drone's own collection allocated blocks
    nb = np.asarray(dstates.num_blocks)
    assert nb.shape == (8,)
    assert np.all(nb > 0)


def test_multi_drone_matches_sequential_fusion():
    """psum-allreduced fusion == sequentially fusing each drone's submaps
    into one global map."""
    n = 4
    mesh = make_mesh(n, "drone")
    dstates = make_drone_states(SUB_CFG, n)
    gstate = tsdf_ops.make_tsdf_state(GLOB_CFG)
    depth, R, T = drone_inputs(n)
    base_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    base_T = jnp.zeros((4, 3), jnp.float32)
    step = multi_drone_step(SUB_CFG, GLOB_CFG, 64, mesh)
    dstates, gstate = step(dstates, gstate, depth, R, T, K, base_R, base_T)

    # sequential reference: integrate each drone separately, splat-accumulate
    # all contributions, then combine once
    g2 = tsdf_ops.make_tsdf_state(GLOB_CFG)
    contribs = []
    for d in range(n):
        st = tsdf_ops.make_tsdf_state(SUB_CFG)
        st, _ = tsdf_ops.integrate_depth(
            SUB_CFG, st, depth[d], jnp.zeros((1, 1, 3), jnp.uint8),
            R[d], T[d], K, K, jnp.int32(0))
        contribs.append(fusion_ops.splat_contributions(
            SUB_CFG, GLOB_CFG, 64, st, base_R, base_T))
    touched = jnp.zeros((GLOB_CFG.grid.table_size,), jnp.int32)
    for c in contribs:
        touched = touched + fusion_ops.accumulate_dense(GLOB_CFG, g2, c)
    g2 = allocate_from_touched(GLOB_CFG.grid, g2, touched > 0, jnp.int32(0))
    acc = None
    for c in contribs:
        a = fusion_ops.scatter_accumulators(GLOB_CFG, g2, c)
        acc = a if acc is None else tuple(x + y for x, y in zip(acc, a))
    g2 = fusion_ops.combine_accumulators(GLOB_CFG, g2, *acc)

    np.testing.assert_allclose(
        np.asarray(gstate.channels["TSDF"]),
        np.asarray(g2.channels["TSDF"]), atol=1e-5)
    assert int(gstate.num_blocks) == int(g2.num_blocks)


def test_block_sharded_integrate_matches_single_device():
    """Slot-axis sharded integration == single-device integration."""
    from taichislam_tpu.parallel.block_sharded import (
        shard_state, sharded_integrate_depth)

    cfg = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                     num_voxel_per_blk_axis=8, max_ray_length=1.5,
                     min_ray_length=0.3, recast_step=2, max_blocks=63,
                     max_bins=1024, max_submap_num=4)
    mesh = make_mesh(8, "block")
    state = tsdf_ops.make_tsdf_state(cfg)
    rng = np.random.default_rng(1)
    depth = jnp.asarray(rng.integers(400, 1400, size=(24, 32))
                        .astype(np.uint16))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.zeros(3, jnp.float32)

    ref_state, _ = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                            K, K, jnp.int32(0))

    sstate = shard_state(state, mesh, "block")
    step = sharded_integrate_depth(cfg, mesh, "block")
    out = step(sstate, depth, texture, R, T, K, K, jnp.int32(0))

    assert int(out.num_blocks) == int(ref_state.num_blocks)
    for k in ("TSDF", "W_TSDF"):
        np.testing.assert_allclose(np.asarray(out.channels[k]),
                                   np.asarray(ref_state.channels[k]),
                                   atol=1e-5, err_msg=k)
    for k in ("TSDF_observed", "occupy"):
        np.testing.assert_array_equal(np.asarray(out.channels[k]),
                                      np.asarray(ref_state.channels[k]),
                                      err_msg=k)


def test_block_sharded_textured_integrate_matches_single_device():
    """All channels including color match the single-device XLA path."""
    import dataclasses
    from taichislam_tpu.parallel.block_sharded import (
        shard_state, sharded_integrate_depth)

    cfg = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                     num_voxel_per_blk_axis=8, max_ray_length=1.5,
                     min_ray_length=0.3, recast_step=2, max_blocks=63,
                     max_bins=1024, max_submap_num=4, texture_enabled=True,
                     pallas_accum="off")
    mesh = make_mesh(8, "block")
    state = tsdf_ops.make_tsdf_state(cfg)
    rng = np.random.default_rng(1)
    depth = jnp.asarray(rng.integers(400, 1400, size=(24, 32))
                        .astype(np.uint16))
    texture = jnp.asarray(rng.integers(0, 255, size=(24, 32, 3))
                          .astype(np.uint8))
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.zeros(3, jnp.float32)

    ref_state, _ = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                            K, K, jnp.int32(0))
    sstate = shard_state(state, mesh, "block")
    step = sharded_integrate_depth(cfg, mesh, "block")
    out = step(sstate, depth, texture, R, T, K, K, jnp.int32(0))
    for k in ref_state.channels:
        np.testing.assert_allclose(
            np.asarray(out.channels[k], np.float32),
            np.asarray(ref_state.channels[k], np.float32),
            atol=1e-5, err_msg=k)


def test_gather_surface_blocks_export_and_mesh():
    """Surface working set gathered off a sharded map == single-device map
    for surface export and marching cubes."""
    from taichislam_tpu.parallel.block_sharded import (
        gather_surface_blocks, shard_state, sharded_integrate_depth,
        surface_block_cfg)
    from taichislam_tpu.ops import exports as exports_ops
    from taichislam_tpu.ops import marching_cubes as mc_ops

    cfg = TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                     num_voxel_per_blk_axis=8, max_ray_length=1.5,
                     min_ray_length=0.3, recast_step=2, max_blocks=63,
                     max_bins=1024, max_submap_num=4)
    mesh = make_mesh(8, "block")
    state = tsdf_ops.make_tsdf_state(cfg)
    rng = np.random.default_rng(1)
    depth = jnp.asarray(rng.integers(400, 1400, size=(24, 32))
                        .astype(np.uint16))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.zeros(3, jnp.float32)

    ref_state, _ = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                            K, K, jnp.int32(0))
    sstate = shard_state(state, mesh, "block")
    out = sharded_integrate_depth(cfg, mesh, "block")(
        sstate, depth, texture, R, T, K, K, jnp.int32(0))

    cap = 32
    mini, n_kept, overflow = gather_surface_blocks(cfg, mesh, cap)(
        out, jnp.int32(0))
    assert int(overflow) == 0
    assert 0 < int(n_kept) <= cap
    mini_cfg = surface_block_cfg(cfg, cap)

    base_R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (4, 3, 3))
    base_T = jnp.zeros((4, 3), jnp.float32)
    xg, yg, zg, _, tsdfg, kept_g = exports_ops.tsdf_surface_export(
        mini_cfg, 4096, cap, mini, base_R, base_T, jnp.int32(0))
    xr, yr, zr, _, tsdfr, kept_r = exports_ops.tsdf_surface_export(
        cfg, 4096, 64, ref_state, base_R, base_T, jnp.int32(0))
    assert int(kept_g) == int(kept_r) > 0
    k = int(kept_g)

    def keyed(x, y, z, t):
        rows = np.stack([np.asarray(x)[:k], np.asarray(y)[:k],
                         np.asarray(z)[:k], np.asarray(t)[:k]], axis=1)
        return rows[np.lexsort(rows.T)]

    np.testing.assert_allclose(keyed(xg, yg, zg, tsdfg),
                               keyed(xr, yr, zr, tsdfr), atol=1e-5)

    # marching cubes on the gathered working set == on the full map
    thres = jnp.float32(cfg.tsdf_surface_thres)
    mg = mc_ops.extract_mesh(mini_cfg, 4096, 1, cap, mini, jnp.int32(0),
                             thres)
    mr = mc_ops.extract_mesh(cfg, 4096, 1, 64, ref_state, jnp.int32(0),
                             thres)
    nt_g, nt_r = int(mg["num_triangles"]), int(mr["num_triangles"])
    assert nt_g == nt_r > 0
    np.testing.assert_allclose(
        np.sort(np.asarray(mg["vertices"])[:nt_g * 3], axis=0),
        np.sort(np.asarray(mr["vertices"])[:nt_r * 3], axis=0), atol=1e-5)
