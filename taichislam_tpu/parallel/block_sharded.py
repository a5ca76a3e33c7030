"""Block-axis sharding: maps larger than one chip's HBM.

SURVEY.md §5.7: the reference's scale axis is spatial — sparse allocation
bounds memory to the observed surface, but a single Taichi device still holds
the whole map. Here the voxel-channel arrays (the dominant memory,
``(max_blocks+1, V, V, V)``) are sharded over the **slot axis** of a device
mesh while the block table / coords / counters stay replicated:

- allocation is a deterministic prefix sum over the (replicated) touched
  bitmap, so every device assigns identical slots without communication;
- integration computes the (cheap) lane stream replicated, and each device
  scatters only the lanes whose slot falls in its shard — the expensive
  per-lane scatter work is divided by the mesh size;
- exports/queries gather from the shard that owns each slot via the same
  masking + psum.

This module provides the sharding specs and a sharded integrate step; it is
exercised on the 8-device CPU mesh in tests and the driver dryrun.
(The sharded step updates the TSDF/W/observed channels; endpoint occupancy
and texture are single-device features for now.)
"""

from __future__ import annotations

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


def sharded_integrate_depth(cfg: TSDFConfig, mesh: Mesh, axis: str = "block"):
    """Build a jitted sharded integrate step with the same signature as
    ``ops.tsdf.integrate_depth`` (minus stats)."""

    spec = cfg.grid
    nb = spec.max_blocks + 1
    n = mesh.devices.size
    shard_rows = nb // n

    def local(state, depth, texture, R, T, K, Kc, active_submap):
        # channels arrive as local shards (shard_rows, V, V, V); bookkeeping
        # replicated. Reconstruct a *virtual* full-state view by computing
        # lane streams replicated and masking scatters to the local shard.
        me = jax.lax.axis_index(axis)
        lo_slot = me * shard_rows

        pts, dep, color, valid = tsdf_ops.depth_to_points(cfg, depth, texture,
                                                          K, Kc)
        from taichislam_tpu.core import geometry
        from taichislam_tpu.core.grid import (
            allocate_blocks, flat_voxel_index, lookup_slots, voxel_to_block)
        pm = geometry.rotate_points(R, pts)
        bins = tsdf_ops.bin_points(cfg, pm, dep, color, valid)
        x, live, ds, wv, pos_p, zb = tsdf_ops._march_lattice(cfg, bins, T)
        xi = geometry.xyz_to_ijk(x, cfg.voxel_scale)
        s_m = jnp.broadcast_to(active_submap, xi.shape[:-1])
        blin, intra, inb = voxel_to_block(spec, s_m, xi)
        mask = (live & inb).reshape(-1)

        # deterministic replicated allocation (same touched bitmap everywhere)
        state = state._replace(channels={})
        full_state_books = state
        new_books = allocate_blocks(spec, full_state_books, blin.reshape(-1),
                                    mask, active_submap)

        slots = lookup_slots(spec, new_books.table, blin.reshape(-1))
        intra_f = intra.reshape(-1)
        # route lanes to the owning shard
        mine = mask & (slots >= lo_slot) & (slots < lo_slot + shard_rows)
        local_flat = (slots - lo_slot) * spec.voxels_per_block + intra_f
        nvox_local = shard_rows * spec.voxels_per_block
        local_flat = jnp.where(mine, local_flat, nvox_local)

        wf = jnp.where(mine, wv.reshape(-1), 0.0)
        wdf = wf * ds.reshape(-1)
        w_sum = jnp.zeros((nvox_local + 1,), jnp.float32).at[local_flat].add(
            wf, mode="drop")[:nvox_local]
        wd_sum = jnp.zeros((nvox_local + 1,), jnp.float32).at[local_flat].add(
            wdf, mode="drop")[:nvox_local]
        return new_books, w_sum, wd_sum

    def step(state, depth, texture, R, T, K, Kc, active_submap):
        books, w_sum, wd_sum = local(state, depth, texture, R, T, K, Kc,
                                     active_submap)
        # combine on the local shard
        V = spec.V
        ch = dict(state.channels)
        D = ch["TSDF"].reshape(-1).astype(jnp.float32)
        W = ch["W_TSDF"].reshape(-1).astype(jnp.float32)
        touched = w_sum > 0
        new_D = jnp.where(touched, (D * W + wd_sum) / (W + w_sum), D)
        new_W = jnp.where(touched, jnp.minimum(W + w_sum, cfg.w_max), W)
        shape = (w_sum.shape[0] // (V ** 3), V ** 3)
        ch["TSDF"] = new_D.astype(cfg.dtype).reshape(shape)
        ch["W_TSDF"] = new_W.astype(cfg.dtype).reshape(shape)
        obs = ch["TSDF_observed"].reshape(-1)
        ch["TSDF_observed"] = jnp.maximum(
            obs, touched.astype(jnp.int8)).reshape(shape)
        return books._replace(channels=ch)

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(GridState(table=P(), block_coords=P(), block_active=P(),
                            num_blocks=P(), alloc_overflow=P(),
                            channels={"TSDF": P(axis), "W_TSDF": P(axis),
                                      "TSDF_observed": P(axis),
                                      "occupy": P(axis)}),
                  P(), P(), P(), P(), P(), P(), P()),
        out_specs=GridState(table=P(), block_coords=P(), block_active=P(),
                            num_blocks=P(), alloc_overflow=P(),
                            channels={"TSDF": P(axis), "W_TSDF": P(axis),
                                      "TSDF_observed": P(axis),
                                      "occupy": P(axis)}),
        check_vma=False)
    return jax.jit(fn)
