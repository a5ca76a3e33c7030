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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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
    out, touched = step(sstate, depth, texture, R, T, K, K, jnp.int32(0))

    assert int(out.num_blocks) == int(ref_state.num_blocks)
    # touched bitmap == single-device integrate stat
    _, ref_stats = tsdf_ops.integrate_depth(cfg, state, depth, texture, R, T,
                                            K, K, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(touched),
                                  np.asarray(ref_stats["touched_blocks"]))
    for k in ("TSDF", "W_TSDF"):
        np.testing.assert_allclose(np.asarray(out.channels[k]),
                                   np.asarray(ref_state.channels[k]),
                                   atol=1e-5, err_msg=k)
    for k in ("TSDF_observed", "occupy"):
        np.testing.assert_array_equal(np.asarray(out.channels[k]),
                                      np.asarray(ref_state.channels[k]),
                                      err_msg=k)


@pytest.mark.slow
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
    out, _ = step(sstate, depth, texture, R, T, K, K, jnp.int32(0))
    for k in ref_state.channels:
        np.testing.assert_allclose(
            np.asarray(out.channels[k], np.float32),
            np.asarray(ref_state.channels[k], np.float32),
            atol=1e-5, err_msg=k)


@pytest.mark.slow
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
    out, _ = sharded_integrate_depth(cfg, mesh, "block")(
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


def _esdf_scene_cfg():
    return TSDFConfig(map_scale=(3.2, 3.2), voxel_scale=0.1,
                      num_voxel_per_blk_axis=8, max_ray_length=1.5,
                      min_ray_length=0.3, recast_step=2, max_blocks=63,
                      max_bins=1024, max_submap_num=4)


@pytest.mark.slow
def test_sharded_esdf_incremental_matches_single_device():
    """Sharded incremental ESDF (cross-shard halo exchange via collectives)
    == single-device ``esdf_update`` BIT FOR BIT over a 2-frame sequence
    whose dirty set spans shard boundaries, including sweep counts,
    re-queue bitmaps, and pending-wavefront chaining."""
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.parallel.block_sharded import (
        shard_state, sharded_integrate_depth)
    from taichislam_tpu.parallel.sharded_esdf import (
        esdf_sharding, sharded_esdf_update)

    cfg = _esdf_scene_cfg()
    n = 8
    mesh = make_mesh(n, "block")
    nb = cfg.grid.max_blocks + 1
    shard_rows = nb // n
    V3 = cfg.grid.voxels_per_block
    cap, sweeps = 64, 16

    rng = np.random.default_rng(1)
    depths = [jnp.asarray(rng.integers(400, 1400, size=(24, 32))
                          .astype(np.uint16)) for _ in range(2)]
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    Ts = [jnp.zeros(3, jnp.float32),
          jnp.asarray([0.15, 0.1, 0.0], jnp.float32)]

    # single-device reference, incremental with pending chaining
    ref_state = tsdf_ops.make_tsdf_state(cfg)
    ref_e = jnp.zeros((nb, V3), jnp.float32)
    ref_f = jnp.zeros((nb, V3), jnp.int8)
    ref_pending = jnp.zeros((nb,), bool)

    # sharded: same chaining, state + ESDF fields sharded on slots
    sh = esdf_sharding(mesh, "block")
    sstate = shard_state(tsdf_ops.make_tsdf_state(cfg), mesh, "block")
    se = jax.device_put(jnp.zeros((nb, V3), jnp.float32), sh)
    sf = jax.device_put(jnp.zeros((nb, V3), jnp.int8), sh)
    spending = jnp.zeros((nb,), bool)
    istep = sharded_integrate_depth(cfg, mesh, "block")
    estep = sharded_esdf_update(cfg, sweeps, cap, mesh, incremental=True)

    for f in range(2):
        ref_state, stats = tsdf_ops.integrate_depth(
            cfg, ref_state, depths[f], texture, R, Ts[f], K, K, jnp.int32(0))
        dirty = stats["touched_blocks"] | ref_pending
        (ref_e, ref_f, ref_obs, ref_sw, ref_changed,
         ref_ovf) = esdf_ops.esdf_update(
            cfg, sweeps, cap, ref_state, ref_e, ref_f, jnp.int32(0), dirty)
        ref_pending = ref_changed

        sstate, touched = istep(sstate, depths[f], texture, R, Ts[f], K, K,
                                jnp.int32(0))
        np.testing.assert_array_equal(np.asarray(touched),
                                      np.asarray(stats["touched_blocks"]))
        sdirty = touched | spending
        se, sf, sobs, ssw, schanged, sovf = estep(
            sstate, se, sf, jnp.int32(0), sdirty)
        spending = schanged

        # the dirty working set must span shard boundaries for the halo
        # exchange to be exercised cross-shard
        slots = np.nonzero(np.asarray(sdirty))[0]
        assert len(set(slots // shard_rows)) >= 2, slots

        assert int(ssw) == int(ref_sw) > 0
        assert int(sovf) == int(ref_ovf) == 0
        np.testing.assert_array_equal(np.asarray(se), np.asarray(ref_e))
        np.testing.assert_array_equal(np.asarray(sf), np.asarray(ref_f))
        np.testing.assert_array_equal(np.asarray(sobs), np.asarray(ref_obs))
        np.testing.assert_array_equal(np.asarray(schanged),
                                      np.asarray(ref_changed))


@pytest.mark.slow
def test_sharded_esdf_full_matches_single_device():
    """Full-map (non-incremental) sharded ESDF == single-device."""
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.parallel.block_sharded import (
        shard_state, sharded_integrate_depth)
    from taichislam_tpu.parallel.sharded_esdf import (
        esdf_sharding, sharded_esdf_update)

    cfg = _esdf_scene_cfg()
    mesh = make_mesh(8, "block")
    nb = cfg.grid.max_blocks + 1
    V3 = cfg.grid.voxels_per_block
    rng = np.random.default_rng(2)
    depth = jnp.asarray(rng.integers(400, 1400, size=(24, 32))
                        .astype(np.uint16))
    texture = jnp.zeros((1, 1, 3), jnp.uint8)
    R = jnp.eye(3, dtype=jnp.float32)
    T = jnp.zeros(3, jnp.float32)

    ref_state, _ = tsdf_ops.integrate_depth(cfg, tsdf_ops.make_tsdf_state(cfg),
                                            depth, texture, R, T, K, K,
                                            jnp.int32(0))
    ref_e, ref_f, _, ref_sw, ref_changed, ref_ovf = esdf_ops.esdf_update(
        cfg, 16, 64, ref_state, jnp.zeros((nb, V3), jnp.float32),
        jnp.zeros((nb, V3), jnp.int8), jnp.int32(0), None)

    sstate = shard_state(tsdf_ops.make_tsdf_state(cfg), mesh, "block")
    sstate, _ = sharded_integrate_depth(cfg, mesh, "block")(
        sstate, depth, texture, R, T, K, K, jnp.int32(0))
    sh = esdf_sharding(mesh, "block")
    se = jax.device_put(jnp.zeros((nb, V3), jnp.float32), sh)
    sf = jax.device_put(jnp.zeros((nb, V3), jnp.int8), sh)
    se, sf, _, ssw, schanged, sovf = sharded_esdf_update(
        cfg, 16, 64, mesh, incremental=False)(sstate, se, sf, jnp.int32(0))

    assert int(ssw) == int(ref_sw) > 0
    assert int(sovf) == int(ref_ovf) == 0
    np.testing.assert_array_equal(np.asarray(se), np.asarray(ref_e))
    np.testing.assert_array_equal(np.asarray(sf), np.asarray(ref_f))
    np.testing.assert_array_equal(np.asarray(schanged),
                                  np.asarray(ref_changed))


@pytest.mark.slow
def test_lifecycle_esdf_matches_host_chain():
    """The ESDF-composed SPMD lifecycle step (multi_drone_lifecycle_step
    with esdf_sweeps set) gives every drone a planner-ready distance field
    in the SAME dispatch as integration — the per-drone analog of the
    reference node's ``esdf`` mapping type
    (/root/reference/scripts/taichislam_node.py:216-218). Each drone's
    esdf/fixed/pending must equal the host single-device
    integrate+esdf_update chain BIT-EXACT (the per-device compute is
    purely local)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.parallel.multi_drone import (
        make_lifecycle_states, multi_drone_lifecycle_step)

    n, F, sweeps, cap = 4, 3, 6, 64
    kstep = 10  # > F: all frames stay in submap 0
    mesh = make_mesh(n, "drone")
    rng = np.random.default_rng(7)
    depths = rng.integers(500, 1300, size=(F, n, 24, 32)).astype(np.uint16)
    Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (F, n, 3, 3)).copy()
    Ts = np.zeros((F, n, 3), np.float32)
    for f in range(F):
        for d in range(n):
            Ts[f, d] = [0.08 * f, 0.05 * d, 0.0]
    kf = np.ones((F, n), bool)

    life = make_lifecycle_states(SUB_CFG, n, with_esdf=True)
    sh = NamedSharding(mesh, P("drone"))
    life = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), life)
    step = multi_drone_lifecycle_step(SUB_CFG, kstep, mesh,
                                      esdf_sweeps=sweeps,
                                      esdf_block_cap=cap)
    for f in range(F):
        life = step(life, jnp.asarray(depths[f]), jnp.asarray(Rs[f]),
                    jnp.asarray(Ts[f]), jnp.asarray(kf[f]), K)
    stats = np.asarray(life["esdf_stats"])
    assert np.all(stats[:, 0] > 0)         # sweeps ran on every drone
    assert np.all(stats[:, 1] == 0)        # no working-set overflow

    nb = SUB_CFG.grid.max_blocks + 1
    V3 = SUB_CFG.grid.voxels_per_block
    tex = jnp.zeros((1, 1, 3), jnp.uint8)
    for d in range(n):
        st = tsdf_ops.make_tsdf_state(SUB_CFG)
        e = jnp.zeros((nb, V3), jnp.float32)
        fx = jnp.zeros((nb, V3), jnp.int8)
        pending = jnp.zeros((nb,), bool)
        bR, bT = Rs[0, d], Ts[0, d]        # frame-0 pose = submap-0 base
        for f in range(F):
            R_in = jnp.asarray(bR.T @ Rs[f, d])
            T_in = jnp.asarray(bR.T @ (Ts[f, d] - bT))
            st, istats = tsdf_ops.integrate_depth(
                SUB_CFG, st, jnp.asarray(depths[f, d]), tex, R_in, T_in,
                K, K, jnp.int32(0))
            dirty = istats["touched_blocks"] | pending
            e, fx, _, sw, changed, ovf = esdf_ops.esdf_update(
                SUB_CFG, sweeps, cap, st, e, fx, jnp.int32(0), dirty)
            pending = jnp.where(ovf > 0, changed | dirty, changed)
        np.testing.assert_array_equal(np.asarray(life["esdf"])[d],
                                      np.asarray(e))
        np.testing.assert_array_equal(np.asarray(life["fixed"])[d],
                                      np.asarray(fx))
        np.testing.assert_array_equal(np.asarray(life["pending"])[d],
                                      np.asarray(pending))
        # the distance field is non-trivial: some observed voxel beyond
        # the fixed band carries a propagated distance
        prop = np.asarray(e)[np.asarray(fx) == 0]
        assert np.any(np.abs(prop) > SUB_CFG.voxel_scale)


@pytest.mark.slow
def test_lifecycle_step_matches_host_submap_mapping():
    """The in-graph submap lifecycle (multi_drone_lifecycle_step: keyframe
    switching, per-drone base-pose registries, world->submap conversion)
    must reproduce N independent host SubmapMapping runs exactly, and the
    psum'd all-drone fusion must equal sequentially splatting each host
    collection into one global map (reference lifecycle:
    submap_mapping.py:126-193)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from taichislam_tpu.models.dense_tsdf import DenseTSDF
    from taichislam_tpu.models.submap_mapping import SubmapMapping
    from taichislam_tpu.parallel.multi_drone import (
        make_lifecycle_states, multi_drone_fuse, multi_drone_lifecycle_step)

    n, F, kstep = 8, 5, 2
    mesh = make_mesh(n, "drone")
    rng = np.random.default_rng(3)
    depths = rng.integers(500, 1300, size=(F, n, 24, 32)).astype(np.uint16)
    # distinct per-frame poses: drones translate and yaw slightly
    Rs = np.zeros((F, n, 3, 3), np.float32)
    Ts = np.zeros((F, n, 3), np.float32)
    for f in range(F):
        for d in range(n):
            a = 0.05 * f + 0.02 * d
            Rs[f, d] = [[np.cos(a), -np.sin(a), 0],
                        [np.sin(a), np.cos(a), 0], [0, 0, 1]]
            Ts[f, d] = [0.1 * f, 0.05 * d, 0.0]
    kf = np.ones((F, n), bool)

    life = make_lifecycle_states(SUB_CFG, n)
    sh = NamedSharding(mesh, P("drone"))
    life = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), life)
    step = multi_drone_lifecycle_step(SUB_CFG, kstep, mesh)
    for f in range(F):
        life = step(life, jnp.asarray(depths[f]), jnp.asarray(Rs[f]),
                    jnp.asarray(Ts[f]), jnp.asarray(kf[f]), K)

    # host mirror: N independent SubmapMapping runs with the same frames
    opts = dict(map_scale=[3.2, 3.2], voxel_scale=0.1,
                num_voxel_per_blk_axis=8, max_ray_length=1.5,
                min_ray_length=0.3, recast_step=2, max_blocks=64,
                max_bins=1024, max_submap_num=4)
    gopts = dict(map_scale=[6.4, 6.4], voxel_scale=0.1,
                 num_voxel_per_blk_axis=8, max_ray_length=1.5,
                 max_blocks=128, max_submap_num=4, is_global_map=True)
    eye_ext = (np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
    sms = []
    for d in range(n):
        sm = SubmapMapping(DenseTSDF, keyframe_step=kstep, sub_opts=opts,
                           global_opts=gopts)
        sm.set_dep_camera_intrinsic(np.asarray(K))
        for f in range(F):
            sm.recast_depth_to_map_by_frame(
                f, True, (Rs[f, d], Ts[f, d]), eye_ext, depths[f, d], None)
        sms.append(sm)

    # per-drone lifecycle state equality
    active = np.asarray(life["active"])
    for d, sm in enumerate(sms):
        assert active[d] == sm.submap_collection.active_submap_id
        for sid in range(active[d] + 1):
            np.testing.assert_allclose(
                np.asarray(life["base_R"])[d, sid],
                sm.submap_collection.submaps_base_R_np[sid], atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(life["base_T"])[d, sid],
                sm.submap_collection.submaps_base_T_np[sid], atol=1e-6)

    # per-drone map equality: compare channel sums per submap via to_numpy
    for d, sm in enumerate(sms):
        st_d = jax.tree_util.tree_map(lambda x: np.asarray(x)[d],
                                      life["state"])
        host = np.asarray(sm.submap_collection.state.channels["TSDF"],
                          np.float32)
        dev = np.asarray(st_d.channels["TSDF"], np.float32)
        # same active voxel content (slot order may differ; compare sums
        # and counts which are permutation-invariant)
        np.testing.assert_allclose(dev.sum(), host.sum(), rtol=1e-4)
        nb_host = int(sm.submap_collection.state.num_blocks)
        assert int(st_d.num_blocks) == nb_host

    # all-drone global fusion == sequentially splatting each host
    # collection (associative merge) through its registries
    gstate = tsdf_ops.make_tsdf_state(GLOB_CFG)
    fuse = multi_drone_fuse(SUB_CFG, GLOB_CFG, 64, mesh)
    gdev = fuse(life, gstate)
    gref = tsdf_ops.make_tsdf_state(GLOB_CFG)
    for sm in sms:
        gref, _ = fusion_ops.fuse_submaps(
            SUB_CFG, GLOB_CFG, 64, gref, sm.submap_collection.state,
            jnp.asarray(sm.global_map.submaps_base_R_np, jnp.float32),
            jnp.asarray(sm.global_map.submaps_base_T_np, jnp.float32))
    got = np.asarray(gdev.channels["TSDF"], np.float32)
    want = np.asarray(gref.channels["TSDF"], np.float32)
    np.testing.assert_allclose(got.sum(), want.sum(), rtol=1e-4)
    assert int(gdev.num_blocks) == int(gref.num_blocks)
    obs_got = np.asarray(gdev.channels["TSDF_observed"]).sum()
    obs_want = np.asarray(gref.channels["TSDF_observed"]).sum()
    assert obs_got == obs_want


@pytest.mark.slow
def test_sharded_model_matches_single_device():
    """ShardedDenseTSDF (the user-facing §5.7 model) runs the FULL frame
    loop — integrate → dirty union → sharded incremental ESDF → surface
    gather → incremental mesh patch — on an 8-device mesh, bit-exact
    against the same loop built from single-device ops."""
    from taichislam_tpu.models.sharded_dense_tsdf import ShardedDenseTSDF
    from taichislam_tpu.ops import esdf as esdf_ops
    from taichislam_tpu.ops import marching_cubes as mc_ops

    mesh = make_mesh(8, "block")
    opts = dict(map_scale=[3.2, 3.2], voxel_scale=0.1,
                num_voxel_per_blk_axis=8, max_ray_length=1.5,
                min_ray_length=0.3, max_blocks=63, max_bins=1024,
                max_submap_num=4)
    m = ShardedDenseTSDF(mesh=mesh, enable_esdf=True, max_esdf_sweeps=16,
                         esdf_block_cap=64, surface_block_cap=64,
                         max_triangles=1 << 14, **opts)
    m._esdf_cap_bucket = 64
    Knp = np.asarray(K)
    m.set_dep_camera_intrinsic(Knp)

    # single-device mirror built from the raw ops (identical policy)
    cfg = m.cfg
    nb = cfg.grid.max_blocks + 1
    V3 = cfg.grid.voxels_per_block
    ref_state = tsdf_ops.make_tsdf_state(cfg)
    ref_e = jnp.zeros((nb, V3), jnp.float32)
    ref_f = jnp.zeros((nb, V3), jnp.int8)
    ref_pending = jnp.zeros((nb,), bool)
    ref_dirty_mesh = jnp.zeros((nb,), bool)

    rng = np.random.default_rng(2)
    eye = np.eye(3, dtype=np.float32)
    tex = jnp.zeros((1, 1, 3), jnp.uint8)
    for f in range(3):
        depth = jnp.asarray(rng.integers(400, 1400, size=(24, 32))
                            .astype(np.uint16))
        T = np.asarray([0.1 * f, 0.05 * f, 0.0], np.float32)
        m.recast_depth_to_map(eye, T, depth)

        ref_state, stats = tsdf_ops.integrate_depth(
            cfg, ref_state, depth, tex, jnp.asarray(eye), jnp.asarray(T),
            K, K, jnp.int32(0))
        dirty = stats["touched_blocks"] | ref_pending
        ref_e, ref_f, _, ref_sw, ref_changed, _ = esdf_ops.esdf_update(
            cfg, 16, 64, ref_state, ref_e, ref_f, jnp.int32(0), dirty)
        ref_pending = ref_changed
        ref_dirty_mesh = ref_dirty_mesh | stats["touched_blocks"]

        np.testing.assert_array_equal(
            np.asarray(ref_state.channels["TSDF"]),
            np.asarray(m.state.channels["TSDF"]))
        np.testing.assert_array_equal(np.asarray(ref_e), np.asarray(m.esdf))
        assert int(ref_sw) == m.last_esdf_sweeps

    # surface export off the gathered mini state == single-device export
    m.cvt_TSDF_surface_to_voxels()
    x, y, z, color, tsdf_v, nkept = __import__(
        "taichislam_tpu.ops.exports", fromlist=["x"]).tsdf_surface_export(
        cfg, m.max_disp_particles, 64, ref_state,
        jnp.asarray(m.submaps_base_R_np), jnp.asarray(m.submaps_base_T_np),
        jnp.int32(0))
    assert m.num_TSDF_particles == int(nkept) > 0
    ref_xyz = np.stack([np.asarray(x), np.asarray(y), np.asarray(z)], 1)
    np.testing.assert_array_equal(
        np.sort(m.export_TSDF_xyz[:m.num_TSDF_particles], axis=0),
        np.sort(ref_xyz[:int(nkept)], axis=0))

    # incremental mesh patch: triangles == single-device dirty-masked
    # extraction (same dilation policy)
    out = m.extract_mesh(incremental=True)
    dil = mc_ops.dilate_blocks(cfg, ref_state, jnp.int32(0), ref_dirty_mesh)
    ref_out = mc_ops.extract_mesh(
        cfg, 1 << 14, 1, 64, ref_state, jnp.int32(0),
        jnp.float32(cfg.tsdf_surface_thres), block_mask=dil)
    assert int(out["num_triangles"]) == int(ref_out["num_triangles"]) > 0
    va = np.asarray(out["vertices"])[:int(out["num_triangles"]) * 3]
    vb = np.asarray(ref_out["vertices"])[:int(ref_out["num_triangles"]) * 3]
    np.testing.assert_array_equal(
        np.sort(va.round(5), axis=0), np.sort(vb.round(5), axis=0))
    # clean frame: dirty set consumed, next incremental patch is empty
    out2 = m.extract_mesh(incremental=True)
    assert int(out2["num_triangles"]) == 0


@pytest.mark.slow
def test_lifecycle_mesh_matches_host_mesher():
    """Per-drone in-graph incremental meshing (multi_drone_lifecycle_step
    with mesh_triangles set): every drone's per-frame mesh patch —
    marching cubes on the 26-dilation of its touched blocks — must equal
    the host mesher mirror bit-exact (the per-device extraction is purely
    local), giving each drone planner/viz triangles without host
    round-trips (reference node's per-drone output path,
    taichislam_node.py:324)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from taichislam_tpu.ops import marching_cubes as mc_ops
    from taichislam_tpu.parallel.multi_drone import (
        make_lifecycle_states, multi_drone_lifecycle_step)

    n, F, MT, BCAP = 4, 2, 4096, 32
    mesh = make_mesh(n, "drone")
    rng = np.random.default_rng(9)
    depths = rng.integers(500, 1300, size=(F, n, 24, 32)).astype(np.uint16)
    Rs = np.broadcast_to(np.eye(3, dtype=np.float32), (F, n, 3, 3)).copy()
    Ts = np.zeros((F, n, 3), np.float32)
    for f in range(F):
        for d in range(n):
            Ts[f, d] = [0.08 * f, 0.05 * d, 0.0]
    kf = np.ones((F, n), bool)

    life = make_lifecycle_states(SUB_CFG, n, with_esdf=True)
    sh = NamedSharding(mesh, P("drone"))
    life = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), life)
    step = multi_drone_lifecycle_step(SUB_CFG, 10, mesh, esdf_sweeps=6,
                                      esdf_block_cap=64, mesh_triangles=MT,
                                      mesh_block_cap=BCAP)
    for f in range(F):
        life, mesh_out = step(life, jnp.asarray(depths[f]),
                              jnp.asarray(Rs[f]), jnp.asarray(Ts[f]),
                              jnp.asarray(kf[f]), K)
    counts = np.asarray(mesh_out["counts"])
    assert np.all(counts[:, 0] > 0)    # triangles on every drone
    assert np.all(counts[:, 1:] == 0)  # no cap drops

    # host mirror per drone: same integrate chain, then the same
    # dirty-dilated extraction on the LAST frame
    tex = jnp.zeros((1, 1, 3), jnp.uint8)
    for d in range(n):
        st = tsdf_ops.make_tsdf_state(SUB_CFG)
        bR, bT = Rs[0, d], Ts[0, d]
        for f in range(F):
            R_in = jnp.asarray(bR.T @ Rs[f, d])
            T_in = jnp.asarray(bR.T @ (Ts[f, d] - bT))
            st, istats = tsdf_ops.integrate_depth(
                SUB_CFG, st, jnp.asarray(depths[f, d]), tex, R_in, T_in,
                K, K, jnp.int32(0))
        dil = mc_ops.dilate_blocks(SUB_CFG, st, jnp.int32(0),
                                   istats["touched_blocks"])
        m = mc_ops.extract_mesh(
            SUB_CFG, MT, 1, BCAP, st, jnp.int32(0),
            jnp.float32(SUB_CFG.tsdf_surface_thres), block_mask=dil)
        nt = int(m["num_triangles"])
        assert counts[d, 0] == nt > 0
        np.testing.assert_array_equal(
            np.asarray(mesh_out["vertices"])[d][:nt * 3],
            np.asarray(m["vertices"])[:nt * 3])
