"""Block-axis sharding: maps larger than one chip's HBM.

SURVEY.md §5.7: the reference's scale axis is spatial — sparse allocation
bounds memory to the observed surface, but a single Taichi device still holds
the whole map. Here the voxel-channel arrays (the dominant memory,
``(max_blocks+1, V^3)``) are sharded over the **slot axis** of a device
mesh while the block table / coords / counters stay replicated:

- allocation is a deterministic prefix sum over the (replicated) touched
  bitmap, so every device assigns identical slots without communication;
- integration computes the (cheap) lane stream replicated, and each device
  scatters only the lanes whose slot falls in its shard — the expensive
  per-lane scatter work is divided by the mesh size. ALL channels update:
  TSDF / W_TSDF / TSDF_observed (ray march), occupy (bin endpoints), and
  color (per-lane componentwise scatter-set) when texture is enabled;
- consumption (exports, meshing, serialization) runs on the **surface
  working set**: :func:`gather_surface_blocks` compacts the blocks that
  contain surface voxels (plus their 26-neighborhood, for mesher halos)
  into a small replicated ``GridState`` via one psum over ICI — the full
  map never has to fit on one chip, only the surface shell does. The
  existing single-device export / marching-cubes ops then run unchanged
  on the mini-state.

Exercised on the 8-device CPU mesh in tests and the driver dryrun.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core.grid import GridState
from taichislam_tpu.ops import tsdf as tsdf_ops


def state_sharding(mesh: Mesh, axis: str = "block"):
    """NamedSharding pytree for a GridState: channels sharded on the slot
    axis, bookkeeping replicated."""
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return GridState(
        table=rep, block_coords=rep, block_active=rep, num_blocks=rep,
        alloc_overflow=rep,
        channels={},  # filled by shard_state
    )


def shard_state(state: GridState, mesh: Mesh, axis: str = "block"):
    """Place a GridState with channels sharded over slots.

    Requires (max_blocks + 1) % mesh_size == 0 (choose max_blocks = k*n - 1).
    """
    n = mesh.devices.size
    nb = state.block_coords.shape[0]
    assert nb % n == 0, (
        f"max_blocks+1 ({nb}) must divide the mesh size {n}: "
        f"use max_blocks = k*{n} - 1")
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    return GridState(
        table=jax.device_put(state.table, rep),
        block_coords=jax.device_put(state.block_coords, rep),
        block_active=jax.device_put(state.block_active, rep),
        num_blocks=jax.device_put(state.num_blocks, rep),
        alloc_overflow=jax.device_put(state.alloc_overflow, rep),
        channels={k: jax.device_put(v, shard)
                  for k, v in state.channels.items()},
    )


def _channel_specs(cfg: TSDFConfig, axis: str):
    specs = {"TSDF": P(axis), "W_TSDF": P(axis),
             "TSDF_observed": P(axis), "occupy": P(axis)}
    if cfg.texture_enabled:
        specs["color"] = P(axis)
    return specs


def _state_spec(cfg: TSDFConfig, axis: str):
    return GridState(table=P(), block_coords=P(), block_active=P(),
                     num_blocks=P(), alloc_overflow=P(),
                     channels=_channel_specs(cfg, axis))


def sharded_integrate_depth(cfg: TSDFConfig, mesh: Mesh, axis: str = "block"):
    """Build a jitted sharded integrate step with the same signature as
    ``ops.tsdf.integrate_depth`` (minus stats). Updates every channel the
    single-device path does: TSDF/W/observed from the ray march, occupy at
    bin endpoints, color (weighted per-lane set) when texture is enabled.

    Returns ``fn(...) -> (state, touched)`` where ``touched`` is the
    replicated (max_blocks+1,) bool bitmap of blocks whose TSDF changed
    this frame (identical to single-device ``integrate_depth``'s
    ``touched_blocks`` stat) — it feeds the sharded incremental ESDF's
    dirty working set (parallel.sharded_esdf)."""

    spec = cfg.grid
    nb = spec.max_blocks + 1
    n = mesh.devices.size
    shard_rows = nb // n
    V3 = spec.voxels_per_block
    nvox_local = shard_rows * V3

    def step(state, depth, texture, R, T, K, Kc, active_submap):
        # channels arrive as local shards (shard_rows, ...); bookkeeping
        # replicated. Lane streams are computed replicated (cheap relative
        # to scatters) and every scatter is masked to the local shard.
        me = jax.lax.axis_index(axis)
        lo_slot = me * shard_rows

        from taichislam_tpu.core import geometry
        from taichislam_tpu.core.grid import (
            allocate_blocks, lookup_slots, voxel_to_block_c)

        (px, py, pz), dep, color, valid = tsdf_ops.depth_to_points_c(
            cfg, depth, texture, K, Kc)
        m0 = R[0, 0] * px + R[0, 1] * py + R[0, 2] * pz
        m1 = R[1, 0] * px + R[1, 1] * py + R[1, 2] * pz
        m2 = R[2, 0] * px + R[2, 1] * py + R[2, 2] * pz
        bins = tsdf_ops.bin_points_c(cfg, m0, m1, m2, dep, color, valid)
        (x0, x1, x2), live, ds, wv, (e0, e1, e2), zb = \
            tsdf_ops._march_lattice_c(cfg, bins, T)
        rha = geometry.round_half_away
        inv_v = 1.0 / cfg.voxel_scale
        blin_m, intra_m, inb_m = voxel_to_block_c(
            spec, active_submap, rha(x0 * inv_v).astype(jnp.int32),
            rha(x1 * inv_v).astype(jnp.int32),
            rha(x2 * inv_v).astype(jnp.int32))
        blin_e, intra_e, inb_e = voxel_to_block_c(
            spec, active_submap, rha(e0 * inv_v).astype(jnp.int32),
            rha(e1 * inv_v).astype(jnp.int32),
            rha(e2 * inv_v).astype(jnp.int32))
        mask = (live & inb_m).reshape(-1)
        mask_e = bins.valid & inb_e

        # deterministic replicated allocation (same candidates everywhere)
        books = state._replace(channels={})
        cand = jnp.concatenate([blin_m.reshape(-1), blin_e])
        cand_ok = jnp.concatenate([mask, mask_e])
        books = allocate_blocks(spec, books, cand, cand_ok, active_submap)

        slots = lookup_slots(spec, books.table, blin_m.reshape(-1))
        intra_f = intra_m.reshape(-1)
        # route march lanes to the owning shard
        mine = mask & (slots >= lo_slot) & (slots < lo_slot + shard_rows)
        local_flat = (slots - lo_slot) * V3 + intra_f
        local_flat = jnp.where(mine, local_flat, nvox_local)

        wf = jnp.where(mine, wv.reshape(-1), 0.0)
        wdf = wf * ds.reshape(-1)
        w_sum = jnp.zeros((nvox_local,), jnp.float32).at[local_flat].add(
            wf, mode="drop")
        wd_sum = jnp.zeros((nvox_local,), jnp.float32).at[local_flat].add(
            wdf, mode="drop")

        ch = dict(state.channels)
        D = ch["TSDF"].reshape(-1).astype(jnp.float32)
        W = ch["W_TSDF"].reshape(-1).astype(jnp.float32)
        touched = w_sum > 0
        # replicated per-slot touched bitmap == single-device stat
        # (each shard owns disjoint rows; tiled all_gather re-orders them)
        touched_rows = jnp.any(touched.reshape(shard_rows, V3), axis=1)
        touched_full = jax.lax.all_gather(
            touched_rows, axis, axis=0, tiled=True).at[-1].set(False)
        new_D = jnp.where(touched, (D * W + wd_sum) / (W + w_sum), D)
        new_W = jnp.where(touched, jnp.minimum(W + w_sum, cfg.w_max), W)
        shape = (shard_rows, V3)
        ch["TSDF"] = new_D.astype(cfg.dtype).reshape(shape)
        ch["W_TSDF"] = new_W.astype(cfg.dtype).reshape(shape)
        obs = ch["TSDF_observed"].reshape(-1)
        ch["TSDF_observed"] = jnp.maximum(
            obs, touched.astype(jnp.int8)).reshape(shape)

        # endpoint occupancy (dense_tsdf.py:248), shard-routed
        slots_e = lookup_slots(spec, books.table, blin_e)
        mine_e = mask_e & (slots_e >= lo_slot) & \
            (slots_e < lo_slot + shard_rows)
        flat_e = (slots_e - lo_slot) * V3 + intra_e
        flat_e = jnp.where(mine_e, flat_e, nvox_local)
        ch["occupy"] = ch["occupy"].reshape(-1).at[flat_e].max(
            jnp.ones(flat_e.shape, jnp.int8), mode="drop").reshape(shape)

        if cfg.texture_enabled:
            # per-lane componentwise color set (dense_tsdf.py:268), matching
            # the single-device XLA path's lane-order tie-breaking
            c = jnp.maximum(bins.count, 1.0)
            bin_rgb = bins.sum_color / c[:, None] / 255.0
            colf = ch["color"].reshape(-1)   # (shard_rows * 3 * V3,)
            loc_slot = slots - lo_slot
            for a in range(3):
                # lattice is step-major (S, B): broadcast over steps
                rgb_a = jnp.where(mine, jnp.broadcast_to(
                    bin_rgb[None, :, a], live.shape).reshape(-1), 0.0)
                idx = (loc_slot * 3 + a) * V3 + intra_f
                idx = jnp.where(mine, idx, colf.shape[0])
                colf = colf.at[idx].set(rgb_a.astype(cfg.dtype), mode="drop")
            ch["color"] = colf.reshape(ch["color"].shape)

        # keep the garbage row (global slot nb-1, owned by the last shard)
        # clean so exports never see absorbed writes
        glob_rows = lo_slot + jnp.arange(shard_rows)
        not_garbage = (glob_rows != nb - 1)
        for k in ch:
            keep = not_garbage.reshape((shard_rows,) + (1,) * (ch[k].ndim - 1))
            ch[k] = jnp.where(keep, ch[k], jnp.zeros_like(ch[k]))
        return books._replace(channels=ch), touched_full

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(_state_spec(cfg, axis), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(_state_spec(cfg, axis), P()),
        check_vma=False)
    return jax.jit(fn)


def surface_block_cfg(cfg: TSDFConfig, cap: int) -> TSDFConfig:
    """Config of the replicated surface-working-set mini map (same grid
    geometry / table, smaller slot capacity)."""
    return dataclasses.replace(cfg, max_blocks=cap)


def gather_surface_blocks(cfg: TSDFConfig, mesh: Mesh, cap: int,
                          axis: str = "block", dilate: bool = True):
    """Build a jitted collective that compacts the blocks containing surface
    voxels (|TSDF| < surface_thres, observed) — dilated by their
    26-neighborhood when ``dilate`` (mesher halos sample neighbor blocks) —
    out of a slot-sharded map into a small REPLICATED GridState with
    capacity ``cap``.

    This is the consumption path for sharded maps: surface exports,
    marching cubes, and serialization all run on the returned mini-state
    with the existing single-device ops and ``surface_block_cfg(cfg, cap)``.
    Cost: one psum of (cap+1) × V^3 rows per channel over ICI.

    Returns fn(state, active_submap) -> (mini_state, n_kept, overflow).
    """
    spec = cfg.grid
    nb = spec.max_blocks + 1
    n = mesh.devices.size
    shard_rows = nb // n
    V3 = spec.voxels_per_block

    def local(state, active_submap):
        me = jax.lax.axis_index(axis)
        lo = me * shard_rows

        tsdf_l = state.channels["TSDF"].astype(jnp.float32)
        obs_l = state.channels["TSDF_observed"] > 0
        act = jax.lax.dynamic_slice(state.block_active, (lo,), (shard_rows,))
        coords_l = jax.lax.dynamic_slice(state.block_coords, (lo, 0),
                                         (shard_rows, 4))
        act = act & (coords_l[:, 0] == active_submap)
        has_l = act & jnp.any(
            obs_l & (jnp.abs(tsdf_l) < cfg.tsdf_surface_thres), axis=1)
        # full surface-block bitmap, replicated
        has = jax.lax.all_gather(has_l, axis).reshape(nb)
        has = has.at[-1].set(False)

        if dilate:
            # keep surface blocks AND their 26-neighbors (mesher halos
            # sample into neighbor blocks): scatter each surface block's
            # flag onto its neighborhood slots
            from taichislam_tpu.ops.esdf import neighbor_slot_table
            nsl = neighbor_slot_table(spec, state, active_submap)
            nbr = nsl.reshape(nb, 27)
            src = jnp.broadcast_to(has[:, None], (nb, 27))
            keep = has.at[nbr.reshape(-1)].max(src.reshape(-1), mode="drop")
            keep = keep.at[-1].set(False) & state.block_active & \
                (state.block_coords[:, 0] == active_submap)
        else:
            keep = has

        # global compaction: kept block -> mini slot (prefix sum, identical
        # on every device)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        n_kept = jnp.maximum(pos[-1] + 1, 0)
        ok = keep & (pos < cap)
        tgt = jnp.where(ok, pos, cap)                       # cap = dropped

        # mini channels: every device scatters its local rows, one psum
        ch_mini = {}
        tgt_l = jax.lax.dynamic_slice(tgt, (lo,), (shard_rows,))
        ok_l = jax.lax.dynamic_slice(ok, (lo,), (shard_rows,))
        tgt_l = jnp.where(ok_l, tgt_l, cap + 1)
        for k, v in state.channels.items():
            mini = jnp.zeros((cap + 2,) + v.shape[1:], v.dtype)
            mini = mini.at[tgt_l].set(v, mode="drop")[:cap + 1]
            ch_mini[k] = jax.lax.psum(mini, axis)

        # mini bookkeeping from the replicated originals
        inv = jnp.full((cap + 2,), nb - 1, jnp.int32).at[tgt].set(
            jnp.arange(nb, dtype=jnp.int32), mode="drop")[:cap + 1]
        coords_mini = jnp.take(state.block_coords, inv, axis=0)
        coords_mini = jnp.where((jnp.arange(cap + 1) < n_kept)[:, None],
                                coords_mini, -1)
        active_mini = (jnp.arange(cap + 1, dtype=jnp.int32) < n_kept)
        active_mini = active_mini.at[-1].set(False)
        # mini table: kept linear block id -> mini slot
        c4 = state.block_coords
        blin = ((c4[:, 1] * spec.bn_xy + c4[:, 2]) * spec.bn_z + c4[:, 3] +
                c4[:, 0] * spec.blocks_per_submap)
        blin = jnp.where(ok, blin, spec.table_size)
        table_mini = jnp.full((spec.table_size,), -1, jnp.int32).at[blin].set(
            jnp.where(ok, pos, -1), mode="drop")

        mini = GridState(
            table=table_mini, block_coords=coords_mini,
            block_active=active_mini,
            num_blocks=jnp.minimum(n_kept, cap),
            alloc_overflow=jnp.maximum(n_kept - cap, 0),
            channels=ch_mini)
        return mini, n_kept, jnp.maximum(n_kept - cap, 0)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(_state_spec(cfg, axis), P()),
        out_specs=(GridState(table=P(), block_coords=P(), block_active=P(),
                             num_blocks=P(), alloc_overflow=P(),
                             channels={k: P() for k in
                                       _channel_specs(cfg, axis)}),
                   P(), P()),
        check_vma=False)
    return jax.jit(fn)
