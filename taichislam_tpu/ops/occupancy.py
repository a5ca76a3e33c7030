"""OctoMap-style probabilistic occupancy ops.

Rebuilds /root/reference/taichi_slam/mapping/taichi_octomap.py on the block
grid: hit-count occupancy (``occupy[ijk] += 1`` per endpoint,
taichi_octomap.py:116-124 — the reference does no free-space clearing),
occupied iff count > ``min_occupy_thres`` (taichi_octomap.py:86-88),
multi-resolution export by corner-subsampling at stride ``K**level``
(the analog of iterating coarser SNode levels, taichi_octomap.py:90-102),
and count-splat submap fusion (taichi_octomap.py:171-189).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from taichislam_tpu.core.config import OctomapConfig
from taichislam_tpu.core import geometry
from taichislam_tpu.core.colormap import color_from_colormap
from taichislam_tpu.core.compaction import compact_mask
from taichislam_tpu.core.grid import (
    GridState,
    allocate_blocks,
    flat_voxel_index,
    lookup_slots,
    make_grid_state,
    scatter_add,
    scatter_set,
    voxel_to_block,
)
from taichislam_tpu.ops.exports import _active_voxel_mask


def make_octomap_state(cfg: OctomapConfig) -> GridState:
    defs = {"occupy": (jnp.float32, ())}
    if cfg.texture_enabled:
        defs["color"] = (jnp.float32, (3,))
    return make_grid_state(cfg.grid, defs)


def _scatter_hits(cfg: OctomapConfig, state: GridState, pts_map, colors,
                  valid, active_submap):
    spec = cfg.grid
    ijk = geometry.xyz_to_ijk(pts_map, cfg.voxel_scale)
    s = jnp.broadcast_to(active_submap, ijk.shape[:-1])
    blin, intra, inb = voxel_to_block(spec, s, ijk)
    ok = valid & inb
    state = allocate_blocks(spec, state, blin, ok, active_submap)
    slots = lookup_slots(spec, state.table, blin)
    flat = flat_voxel_index(spec, slots, intra)
    garbage = (spec.max_blocks + 1) * spec.voxels_per_block - 1
    flat = jnp.where(ok, flat, garbage)

    ch = dict(state.channels)
    ch["occupy"] = scatter_add(ch["occupy"], flat,
                               ok.astype(jnp.float32))
    if cfg.texture_enabled and colors is not None:
        # BGR -> RGB swap + /255 (taichi_octomap.py:120-124), componentwise
        from taichislam_tpu.core.grid import comp_flat_index
        colf = ch["color"].reshape(-1)
        for a in range(3):
            idx = comp_flat_index(spec, slots, intra, a)
            idx = jnp.where(ok, idx, colf.shape[0])
            colf = colf.at[idx].set(
                colors[..., 2 - a].astype(jnp.float32) / 255.0, mode="drop")
        ch["color"] = colf.reshape(ch["color"].shape)
    for k in ch:
        ch[k] = ch[k].at[-1].set(jnp.zeros_like(ch[k][-1]))
    return state._replace(channels=ch)


@partial(jax.jit, static_argnums=(0,))
def integrate_pcl(cfg: OctomapConfig, state: GridState, xyz, rgb, R, T,
                  active_submap):
    """recast_pcl_to_map (taichi_octomap.py:126-145): p -> R @ p + T, count
    increment; no range gating (faithful to the reference kernel)."""
    pts = geometry.transform_points(R, T, xyz.astype(jnp.float32))
    valid = jnp.ones(pts.shape[:-1], bool)
    return _scatter_hits(cfg, state, pts, rgb, valid, active_submap)


@partial(jax.jit, static_argnums=(0,))
def integrate_depth(cfg: OctomapConfig, state: GridState, depth_mm, texture,
                    R, T, K_dep, K_color, active_submap):
    """recast_depth_to_map (taichi_octomap.py:130-169): strided unprojection
    with mm gating, then endpoint count increment."""
    h, w = depth_mm.shape
    step = cfg.recast_step
    jj, ii = geometry.pixel_grid(h, w, step)
    jj, ii = jj.reshape(-1), ii.reshape(-1)
    # gather-free decimation (see geometry.strided_depth_f32)
    d_mm = geometry.strided_depth_f32(depth_mm, step)
    valid = (d_mm != 0) & (d_mm <= cfg.max_ray_length * 1000.0) & (
        d_mm >= cfg.min_ray_length * 1000.0)
    dep = d_mm / 1000.0
    pts = geometry.unproject_point_dep(ii, jj, dep, K_dep)
    pts_map = geometry.transform_points(R, T, pts)
    colors = None
    if cfg.texture_enabled:
        if cfg.color_same_proj:
            colors = texture[:(h // step) * step:step,
                             :(w // step) * step:step, :].reshape(
                -1, 3).astype(jnp.float32)
        else:
            th, tw = texture.shape[0], texture.shape[1]
            cj, ci = geometry.color_ind_from_depth_pt(
                ii.astype(jnp.float32), jj.astype(jnp.float32),
                K_dep, K_color, tw, th)
            colors = texture[cj, ci, :].astype(jnp.float32)
    return _scatter_hits(cfg, state, pts_map, colors, valid, active_submap)


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def occupy_export(cfg: OctomapConfig, capacity: int, level: int,
                  block_cap: int, state: GridState, base_R, base_T,
                  active_submap):
    """cvt_occupy_to_voxels(level) (taichi_octomap.py:90-114).

    The reference iterates SNode level ``level`` above the leaves, reading
    the occupancy of each cell's corner voxel; equivalently we subsample the
    voxel lattice at stride ``K**level`` and keep corner voxels whose count
    exceeds the threshold. Two-level: occupied blocks are compacted first
    (``block_cap`` bucketed by the caller), then a sort-based compaction
    over the gathered lanes — component arrays throughout (see
    ops/exports.py for the TPU layout rationale). Survivors land at the
    front, so the appending display variant is a host-side slice copy.
    """
    from taichislam_tpu.core.compaction import compact_sort
    from taichislam_tpu.ops.exports import (
        _compact_blocks, _gathered_ijk_c, _gathered_xyz_c, _intra_offsets_np)

    spec = cfg.grid
    stride = cfg.K ** level
    nb = spec.max_blocks + 1
    occ_full = state.channels["occupy"].reshape(nb, -1)
    pre_mask = _active_voxel_mask(spec, state, active_submap)
    pre_mask &= occ_full > cfg.min_occupy_thres
    if stride > 1:
        from taichislam_tpu.core.grid import block_origin_voxel
        base = block_origin_voxel(spec, state.block_coords)   # (nb, 3)
        off = _intra_offsets_np(spec.V)
        for a in range(3):
            comp = base[:, a:a + 1] + jnp.asarray(off[:, a])[None, :]
            pre_mask &= comp % stride == 0

    slot_of, bvalid, _, _ = _compact_blocks(spec, pre_mask, block_cap)
    coords, ijk_c = _gathered_ijk_c(spec, state, slot_of)
    x, y, z = _gathered_xyz_c(spec, coords, ijk_c, base_R, base_T,
                              cfg.is_global_map)
    mask = jnp.take(pre_mask, slot_of, axis=0) & bvalid[:, None]

    ops = [x.reshape(-1), y.reshape(-1), z.reshape(-1)]
    fills = [-100000.0] * 3
    if cfg.texture_enabled:
        colg = jnp.take(state.channels["color"], slot_of, axis=0)
        ops += [colg[:, a, :].reshape(-1).astype(jnp.float32)
                for a in range(3)]
        fills += [0.5, 0.5, 0.5]
    outs, kept, _ = compact_sort(mask.reshape(-1), capacity, ops, fills)
    if cfg.texture_enabled:
        col = jnp.stack(outs[3:6], axis=-1)
    else:
        col = color_from_colormap(outs[2], cfg.disp_floor, cfg.disp_ceiling)
        col = jnp.where((jnp.arange(capacity) < kept)[:, None], col, 0.5)
    return outs[0], outs[1], outs[2], col, kept


@partial(jax.jit, static_argnums=(0, 1))
def fuse_submaps(sub_cfg: OctomapConfig, glob_cfg: OctomapConfig,
                 global_state: GridState, sub_state: GridState,
                 base_R, base_T, num_submaps, only_submap=None):
    """fuse_submaps_kernel (taichi_octomap.py:171-189): for every submap
    voxel over threshold, add its count at the nearest global voxel; color is
    overwritten (the reference's blend is commented out). The submap
    collection and the global map may have different grid extents.

    ``only_submap`` (traced int32, optional) restricts the sources to ONE
    submap — the incremental local->global splat: hit-count accumulation is
    associative, so splatting each finished submap exactly once equals the
    reset + refuse-all path (SubmapMapping's non-blocking octomap
    finalize)."""
    from taichislam_tpu.core.grid import block_origin_voxel, voxel_to_block_c
    from taichislam_tpu.ops.exports import _intra_offsets_np

    spec = sub_cfg.grid
    gspec = glob_cfg.grid
    nb = spec.max_blocks + 1
    occ = sub_state.channels["occupy"].reshape(nb, -1)
    src_sub = sub_state.block_coords[:, 0]
    src_ok = sub_state.block_active & (src_sub >= 0) & (src_sub < num_submaps)
    if only_submap is not None:
        src_ok = src_ok & (src_sub == only_submap)
    src_ok = src_ok.at[-1].set(False)
    mask = jnp.broadcast_to(src_ok[:, None], occ.shape) & (
        occ > sub_cfg.min_occupy_thres)

    # componentwise submap->world->global-voxel transform: a stacked
    # (nb*V^3, 3) world-xyz array pads its minor dim to 128 lanes on TPU
    # (2 GB at 1024 blocks) — see ops/fusion.py for the same treatment
    base = block_origin_voxel(spec, sub_state.block_coords)    # (nb, 3)
    off = _intra_offsets_np(spec.V)
    s = jnp.clip(src_sub, 0, base_R.shape[0] - 1)
    loc = [(base[:, a:a + 1] + jnp.asarray(off[:, a])[None, :]).astype(
        jnp.float32) * spec.voxel_scale for a in range(3)]
    gc = []
    for a in range(3):
        wa = (jnp.take(base_R[:, a, 0], s)[:, None] * loc[0] +
              jnp.take(base_R[:, a, 1], s)[:, None] * loc[1] +
              jnp.take(base_R[:, a, 2], s)[:, None] * loc[2] +
              jnp.take(base_T[:, a], s)[:, None])
        gc.append(geometry.round_half_away(
            wa / glob_cfg.voxel_scale).astype(jnp.int32))

    blin, intra, inb = voxel_to_block_c(gspec, jnp.int32(0), gc[0], gc[1],
                                        gc[2])
    ok = mask & inb
    global_state = allocate_blocks(gspec, global_state, blin.reshape(-1),
                                   ok.reshape(-1), jnp.int32(0))
    slots = lookup_slots(gspec, global_state.table, blin.reshape(-1))
    flat = flat_voxel_index(gspec, slots, intra.reshape(-1))
    garbage = (gspec.max_blocks + 1) * gspec.voxels_per_block - 1
    flat = jnp.where(ok.reshape(-1), flat, garbage)

    ch = dict(global_state.channels)
    ch["occupy"] = scatter_add(ch["occupy"], flat,
                               jnp.where(ok, occ, 0.0).reshape(-1))
    if sub_cfg.texture_enabled:
        from taichislam_tpu.core.grid import comp_flat_index
        colf = ch["color"].reshape(-1)
        okf = ok.reshape(-1)
        intra_f = intra.reshape(-1)
        for a in range(3):
            src = sub_state.channels["color"][:, a, :].reshape(-1)
            idx = comp_flat_index(gspec, slots, intra_f, a)
            idx = jnp.where(okf, idx, colf.shape[0])
            colf = colf.at[idx].set(src, mode="drop")
        ch["color"] = colf.reshape(ch["color"].shape)
    for k in ch:
        ch[k] = ch[k].at[-1].set(jnp.zeros_like(ch[k][-1]))
    return global_state._replace(channels=ch)
