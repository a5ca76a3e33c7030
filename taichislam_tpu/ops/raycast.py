"""Batched fixed-step raycasting against map occupancy.

The reference marches rays serially one voxel_scale per step
(``BaseMap.raycast``, /root/reference/taichi_slam/mapping/mapping_common.py:165-178)
with per-subclass ``is_occupy`` predicates. Here a whole fan of rays is
evaluated as one dense (rays × steps) lattice — ideal for the topo-graph's
64–128-direction collision fans (topo_graph.py:444-470).

Occupancy predicates replicate the reference semantics exactly, including
the quirk that **unallocated TSDF voxels read 0 and therefore count as
occupied** (``TSDF < tsdf_surface_thres`` with TSDF=0, dense_tsdf.py:152-155)
— which is what confines the skeleton graph to observed free space.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from taichislam_tpu.core import geometry
from taichislam_tpu.core.grid import (
    flat_voxel_index,
    gather_channel,
    lookup_slots,
    voxel_to_block,
)


def _lookup_channel(spec, state, channel, s, ijk):
    blin, intra, _ = voxel_to_block(spec, s, ijk)
    slots = lookup_slots(spec, state.table, blin)
    flat = flat_voxel_index(spec, slots, intra)
    return gather_channel(state.channels[channel], flat)


def make_tsdf_occupancy_fn(cfg, state, active_submap):
    """xyz (..., 3) -> bool, is_occupy for DenseTSDF (dense_tsdf.py:152-155)."""
    spec = cfg.grid

    def occ(xyz):
        ijk = geometry.xyz_to_ijk(xyz, cfg.voxel_scale)
        s = jnp.full(ijk.shape[:-1], active_submap, jnp.int32)
        tsdf = _lookup_channel(spec, state, "TSDF", s, ijk)
        return tsdf.astype(jnp.float32) < cfg.tsdf_surface_thres

    return occ


def make_tsdf_unobserved_fn(cfg, state, active_submap):
    """is_unobserved for DenseTSDF (dense_tsdf.py:148-150)."""
    spec = cfg.grid

    def unobs(xyz):
        ijk = geometry.xyz_to_ijk(xyz, cfg.voxel_scale)
        s = jnp.full(ijk.shape[:-1], active_submap, jnp.int32)
        o = _lookup_channel(spec, state, "TSDF_observed", s, ijk)
        return o == 0

    return unobs


def make_octomap_occupancy_fn(cfg, state, active_submap):
    """is_occupy for Octomap (taichi_octomap.py:86-88)."""
    spec = cfg.grid

    def occ(xyz):
        ijk = geometry.xyz_to_ijk(xyz, cfg.voxel_scale)
        s = jnp.full(ijk.shape[:-1], active_submap, jnp.int32)
        c = _lookup_channel(spec, state, "occupy", s, ijk)
        return c > cfg.min_occupy_thres

    return occ


def raycast(occupancy_fn, pos, dirs, max_dist, voxel_scale, max_steps: int):
    """March ``dirs`` (R, 3) from ``pos`` — (3,) shared or (R, 3) per-ray
    origins — one voxel per step.

    Mirrors BaseMap.raycast (mapping_common.py:165-178): sample points at
    distances 0, v, 2v, …; first occupied sample wins. Returns
    (hit (R,), hit_pos (R, 3), hit_len (R,)).
    """
    steps = jnp.arange(max_steps, dtype=jnp.float32) * voxel_scale
    live = steps < max_dist if jnp.ndim(max_dist) == 0 else \
        steps[None, :] < max_dist[:, None]
    pos_b = pos if jnp.ndim(pos) == 1 else pos[:, None, :]
    x = pos_b + dirs[:, None, :] * steps[None, :, None]    # (R, S, 3)
    occ = occupancy_fn(x) & live                            # (R, S)
    hit = jnp.any(occ, axis=-1)
    first = jnp.argmax(occ, axis=-1)
    hit_len = jnp.where(hit, steps[first], 0.0)
    hit_pos = pos + dirs * hit_len[:, None]
    return hit, hit_pos, hit_len


@partial(jax.jit, static_argnums=(0, 1))
def tsdf_raycast(cfg, max_steps: int, state, active_submap, pos, dirs,
                 max_dist):
    """Jitted fan raycast against a DenseTSDF map (static cfg/max_steps so
    the host loop of the topo graph reuses one executable)."""
    occ = make_tsdf_occupancy_fn(cfg, state, active_submap)
    return raycast(occ, pos, dirs, max_dist, cfg.voxel_scale, max_steps)


@partial(jax.jit, static_argnums=(0, 1))
def octomap_raycast(cfg, max_steps: int, state, active_submap, pos, dirs,
                    max_dist):
    occ = make_octomap_occupancy_fn(cfg, state, active_submap)
    return raycast(occ, pos, dirs, max_dist, cfg.voxel_scale, max_steps)


@partial(jax.jit, static_argnums=(0,))
def tsdf_point_query(cfg, state, active_submap, xyz):
    """Batched (occupied, unobserved) point queries for a DenseTSDF map."""
    occ = make_tsdf_occupancy_fn(cfg, state, active_submap)(xyz)
    unobs = make_tsdf_unobserved_fn(cfg, state, active_submap)(xyz)
    return occ, unobs


@partial(jax.jit, static_argnums=(0,))
def octomap_point_query(cfg, state, active_submap, xyz):
    occ = make_octomap_occupancy_fn(cfg, state, active_submap)(xyz)
    return occ, jnp.zeros_like(occ)


def is_near_pos_occupy(occupancy_fn, xyz, voxel_scale, radius_voxels: int):
    """Cube-neighborhood occupancy test (mapping_common.py:193-204): any
    occupied voxel within [-r, r)³ voxels of xyz."""
    r = radius_voxels
    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(-r, r), jnp.arange(-r, r), jnp.arange(-r, r),
        indexing="ij"), axis=-1).reshape(-1, 3).astype(jnp.float32)
    probes = xyz[..., None, :] + offs * voxel_scale
    return jnp.any(occupancy_fn(probes), axis=-1)
