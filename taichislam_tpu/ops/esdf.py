"""Incremental ESDF via masked Jacobi wavefront sweeps.

The reference's only ESDF implementation (legacy DenseSDF,
/root/reference/taichi_slam/mapping/dense_esdf.py:228-333) runs voxblox's
raise/lower queues as *serialized device while-loops* with atomic cursors —
sequential on GPU, and with a known memory issue (reference README roadmap).
Its semantics: voxels in the fixed band (|TSDF| < γ = voxel_scale) hold
ESDF = TSDF; every other observed voxel relaxes toward
``min over 26-neighbors (ESDF[n] + |dir|·voxel)`` on the positive side and
``max (ESDF[n] - dist)`` on the negative side — a signed chamfer/brushfire
distance, initialized at ±max_ray_length.

The TPU rebuild replaces the queues with **Jacobi relaxation sweeps over the
active blocks** inside a ``lax.while_loop`` that exits at the fixed point.
Each sweep gathers a one-voxel halo per block and applies all 26 relaxations
as shifted-window min/max — fully parallel and deterministic. Unlike the
reference's lower queue (which never re-enqueues improved voxels,
dense_esdf.py:292, so may stop short), the sweeps provably reach the
brushfire fixed point; a property test checks against Bellman-Ford.

Warm starting: pass the previous ESDF as ``prev`` — voxels whose fixed seed
shrank or sign flipped are raised to ±max before sweeping, others keep their
value as the initial guess, so per-frame incremental updates converge in a
few sweeps.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from taichislam_tpu.core.config import TSDFConfig
from taichislam_tpu.core.grid import (
    flat_voxel_index,
    gather_channel,
    lookup_slots,
    voxel_to_block,
)
from taichislam_tpu.core.geometry import sign
from taichislam_tpu.ops.exports import voxel_ijk_all


@functools.lru_cache(maxsize=1)
def _neighbor_table_np():
    dirs = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
            for k in (-1, 0, 1) if (i, j, k) != (0, 0, 0)]
    d = np.asarray(dirs, np.int32)
    dist = np.linalg.norm(d, axis=-1).astype(np.float32)
    return d, dist


def neighbor_table():
    d, dist = _neighbor_table_np()  # numpy cached; jnp conversion per call
    return jnp.asarray(d), jnp.asarray(dist)


def _halo_gather(spec, state, channel, active_submap, base_coords):
    """Gather a (nb, V+2, V+2, V+2) halo lattice of ``channel`` plus a
    participation mask (allocated & same submap), by coordinate lookup."""
    V = spec.V
    r = jnp.arange(-1, V + 1, dtype=jnp.int32)
    off = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), axis=-1)  # (V+2,)³,3
    coords = base_coords[:, None, None, None, :] + off[None]        # (nb,...)
    s = jnp.full(coords.shape[:-1], active_submap, jnp.int32)
    blin, intra, inb = voxel_to_block(spec, s, coords)
    slots = lookup_slots(spec, state.table, blin)
    flat = flat_voxel_index(spec, slots, intra)
    vals = gather_channel(state.channels[channel], flat)
    alive = inb & (slots < spec.max_blocks)
    return vals, alive


def _shift_windows(x, V):
    """All 27 (V, V, V) windows of a (nb, V+2, V+2, V+2) halo array,
    stacked (27, nb, V, V, V) in neighbor_table order + center last."""
    outs = []
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for dk in (-1, 0, 1):
                outs.append(x[:, 1 + di:1 + di + V, 1 + dj:1 + dj + V,
                              1 + dk:1 + dk + V])
    return jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnums=(0, 1))
def esdf_update(cfg: TSDFConfig, max_sweeps: int, state, prev_esdf,
                prev_fixed, active_submap):
    """Compute the ESDF over the active submap's observed voxels.

    Args:
        prev_esdf: (max_blocks+1, V, V, V) previous ESDF (zeros on first call)
        prev_fixed: same-shaped int8 previous fixed flags
    Returns (esdf, fixed, observed_mask, sweeps_run).
    """
    spec = cfg.grid
    V = spec.V
    nb = spec.max_blocks + 1
    gamma = cfg.voxel_scale
    max_ray = cfg.max_ray_length

    tsdf = state.channels["TSDF"].astype(jnp.float32)
    obs = (state.channels["TSDF_observed"] > 0)
    blk = state.block_active & (state.block_coords[:, 0] == active_submap)
    blk = blk.at[-1].set(False)
    participate = obs & blk[:, None, None, None]

    fixed = participate & (jnp.abs(tsdf) < gamma)
    seed = jnp.where(fixed, tsdf, sign(tsdf) * max_ray)

    # warm start: keep previous values unless the voxel's status changed in a
    # way that could make the old value an invalid lower bound (raise cases:
    # was fixed & now isn't, sign flip, or fixed value grew)
    prev_ok = (jnp.sign(prev_esdf) == jnp.sign(seed)) & participate & \
        ~((prev_fixed > 0) & ~fixed)
    esdf0 = jnp.where(fixed, seed,
                      jnp.where(prev_ok,
                                jnp.where(seed >= 0,
                                          jnp.minimum(prev_esdf, seed),
                                          jnp.maximum(prev_esdf, seed)),
                                seed))
    esdf0 = jnp.where(participate, esdf0, 0.0)

    dirs, dist = neighbor_table()
    base = state.block_coords[:, 1:4] * V + \
        jnp.asarray(spec.origin_voxel, jnp.int32)

    # halo participation mask is static across sweeps; values are re-gathered
    _, halo_alive = _halo_gather(spec, state, "TSDF_observed", active_submap,
                                 base)
    tsdf_halo, _ = _halo_gather(spec, state, "TSDF", active_submap, base)
    obs_halo, _ = _halo_gather(spec, state, "TSDF_observed", active_submap,
                               base)
    part_halo = halo_alive & (obs_halo > 0)

    # neighbor linear index within the halo for scatter-back of esdf values:
    # instead we re-gather per sweep using the table of block slots.
    # For efficiency we precompute, for every halo cell, its (slot, intra)
    # flat address into the dense esdf array.
    r = jnp.arange(-1, V + 1, dtype=jnp.int32)
    off = jnp.stack(jnp.meshgrid(r, r, r, indexing="ij"), axis=-1)
    coords = base[:, None, None, None, :] + off[None]
    s_arr = jnp.full(coords.shape[:-1], active_submap, jnp.int32)
    blin, intra, _ = voxel_to_block(spec, s_arr, coords)
    slots = lookup_slots(spec, state.table, blin)
    halo_flat = flat_voxel_index(spec, slots, intra)  # (nb, V+2, V+2, V+2)

    neighbor_order = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                      for k in (-1, 0, 1)]
    n_dist = jnp.asarray(
        [np.linalg.norm(d) for d in neighbor_order], jnp.float32) * \
        cfg.voxel_scale

    # Region labels are static per call: the positive-side brushfire relaxes
    # only through fixed/positive-side sources, the negative side through
    # fixed/negative-side sources. (The reference's queue version lets fresh
    # ±max seeds poison the other side, dense_esdf.py:276-299 — one of the
    # reasons its ESDF never stabilized; this one-sided formulation is the
    # intended voxblox fixed point and provably converges.)
    pos_side = participate & ~fixed & (tsdf >= 0)
    neg_side = participate & ~fixed & (tsdf < 0)
    # source masks per halo cell, static across sweeps
    fixed_halo = part_halo & (jnp.abs(tsdf_halo.astype(jnp.float32)) < gamma)
    pos_src_halo = part_halo & (fixed_halo |
                                (tsdf_halo.astype(jnp.float32) >= gamma))
    neg_src_halo = part_halo & (fixed_halo |
                                (tsdf_halo.astype(jnp.float32) <= -gamma))
    pos_src_wins = _shift_windows(pos_src_halo, V)
    neg_src_wins = _shift_windows(neg_src_halo, V)

    def body(carry):
        esdf, _, it = carry
        flat = esdf.reshape(-1)
        halo = jnp.take(flat, halo_flat.reshape(-1), axis=0).reshape(
            halo_flat.shape)
        wins = _shift_windows(halo, V)                  # (27, nb, V, V, V)

        big = jnp.float32(1e9)
        nd = n_dist[:, None, None, None, None]
        cand_lo = jnp.min(jnp.where(pos_src_wins, wins + nd, big), axis=0)
        cand_hi = jnp.max(jnp.where(neg_src_wins, wins - nd, -big), axis=0)

        new = jnp.where(pos_side, jnp.minimum(esdf, cand_lo), esdf)
        new = jnp.where(neg_side, jnp.maximum(esdf, cand_hi), new)
        changed = jnp.any(jnp.abs(new - esdf) > 1e-6)
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_sweeps)

    esdf, _, sweeps = jax.lax.while_loop(
        cond, body, (esdf0, jnp.bool_(True), jnp.int32(0)))
    return esdf, fixed.astype(jnp.int8), participate, sweeps


@partial(jax.jit, static_argnums=(0, 1))
def esdf_slice_export(cfg: TSDFConfig, capacity: int, state, esdf,
                      participate, base_R, base_T, active_submap, z, dz):
    """cvt_ESDF_to_voxels_slice (dense_esdf.py:498-509): z-slice of the ESDF
    with jet colors over [-1, 1]... the reference colors by ESDF range; we
    use jet over [-max_ray/4, max_ray/4] for contrast."""
    from taichislam_tpu.core.colormap import color_from_colormap
    from taichislam_tpu.core.compaction import compact_mask
    from taichislam_tpu.ops.exports import voxel_xyz_all

    spec = cfg.grid
    kidx = voxel_ijk_all(spec, state)[..., 2].astype(jnp.float32).reshape(
        participate.shape)
    zindex = jnp.trunc(z / cfg.voxel_scale)
    mask = participate & (kidx > zindex - dz) & (kidx < zindex + dz)
    xyz = voxel_xyz_all(spec, state, base_R, base_T, cfg.is_global_map)

    pos, kept, _ = compact_mask(mask.reshape(-1), capacity)
    out_xyz = jnp.full((capacity + 1, 3), -100000.0, jnp.float32).at[pos].set(
        xyz.reshape(-1, 3), mode="drop")
    out_esdf = jnp.zeros((capacity + 1,), jnp.float32).at[pos].set(
        esdf.reshape(-1), mode="drop")
    rng = cfg.max_ray_length / 4.0
    out_col = jnp.full((capacity + 1, 3), 0.5, jnp.float32).at[pos].set(
        color_from_colormap(esdf.reshape(-1), -rng, rng), mode="drop")
    return out_xyz[:capacity], out_esdf[:capacity], out_col[:capacity], kept
